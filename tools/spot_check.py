"""Targeted oracle-parity check: ``python tools/spot_check.py q1 q2 ...``
runs only the named queries (all of them with no args) through the same
hashing + pandas-path checks as driver_sim.py.  Fast iteration loop for
new/changed queries."""
import datetime
import hashlib
import math
import sys
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]").appName("spot-check").getOrCreate()
)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, Decimal): return str(v.normalize())
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()[:16]

def pandas_issues(sdf, oracle_sql):
    issues = []
    spd = sdf.toPandas()
    dpd = con.execute(oracle_sql).fetch_df()
    for frame, side in ((spd, "spark"), (dpd, "duck")):
        for c in frame.columns:
            if frame[c].dtype == object:
                cell = next((v for v in frame[c] if v is not None), None)
                if isinstance(cell, (list, tuple)) or type(cell).__name__ == "ndarray":
                    issues.append(f"{side}.{c}: unhashable {type(cell).__name__}")
    for c in set(spd.columns) & set(dpd.columns):
        sk, dk = spd[c].dtype.kind, dpd[c].dtype.kind
        if sk != dk and {sk, dk} != {"O"}:
            issues.append(f"{c}: dtype spark={spd[c].dtype} duck={dpd[c].dtype}")
    return issues

qs, oracles = E.queries(), E.oracle_sql()
names = sys.argv[1:] or list(qs)
fails = 0
for name in names:
    try:
        sdf = qs[name](spark, SF)
        srows = sdf.collect()
        if name not in oracles:
            print(f"{name}: rows-only, {len(srows)} rows OK")
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        sh, dh = value_hash(sdf.columns, srows), value_hash(dcols, drows)
        issues = pandas_issues(sdf, oracles[name])
        ok = (sorted(sdf.columns) == sorted(dcols)) and len(srows) == len(drows) and sh == dh and not issues
        print(f"{name}: spark={len(srows)} duck={len(drows)} "
              f"{'MATCH' if ok else 'MISMATCH'}"
              + "".join(f"\n    PANDAS: {i}" for i in issues))
        if not ok:
            fails += 1
            if sorted(sdf.columns) != sorted(dcols):
                print(f"    cols: spark={sorted(sdf.columns)} duck={sorted(dcols)}")
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
        fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
