"""Driver simulation: exercise __spark_entry__ exactly as the harness
would — vanilla SparkSession, entry() smoke at sf0.001, every
queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01 with
order-insensitive value hashing."""
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
    SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
)  # deliberately vanilla: no UTC tz, no tuned confs

# 1. entry() smoke
df = E.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema={df.schema.simpleString()[:120]}")
assert n >= 0

# 2. queries vs oracles
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

def pandas_path_issues(name, sdf, oracle_sql):
    """Replicate the REAL driver's pandas canonicalization hazards.

    Round 1 lesson: the harness converts both result sets to pandas and
    sorts the frame; fetchall()-based hashing (above) misses two failure
    classes the pandas path hits:
      * DuckDB HUGEINT (bare SUM of ints) -> float64 while Spark emits
        int64  => value-hash mismatch (8973 vs 8973.0).
      * array-typed output columns -> numpy.ndarray cells, unhashable in
        pandas sort_values => hard driver ERROR.
    Returns a list of human-readable issue strings (empty == safe).
    """
    issues = []
    spd = sdf.toPandas()
    dpd = con.execute(oracle_sql).fetch_df()
    for frame, side in ((spd, "spark"), (dpd, "duck")):
        for c in frame.columns:
            if frame[c].dtype == object:
                cell = next((v for v in frame[c] if v is not None), None)
                if isinstance(cell, (list, tuple)) or type(cell).__name__ == "ndarray":
                    issues.append(f"{side}.{c}: unhashable {type(cell).__name__} cells")
    for c in set(spd.columns) & set(dpd.columns):
        sk, dk = spd[c].dtype.kind, dpd[c].dtype.kind
        if sk != dk and {sk, dk} != {"O"}:
            issues.append(f"{c}: dtype kind spark={spd[c].dtype} duck={dpd[c].dtype}")
    return issues

qs, oracles = E.queries(), E.oracle_sql()
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows OK")
        continue
    cur = con.execute(oracles[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
    ok = (sorted(scols) == sorted(dcols)) and len(srows) == len(drows) and sh == dh
    pd_issues = pandas_path_issues(name, sdf, oracles[name])
    ok = ok and not pd_issues
    print(f"{name}: spark={len(srows)} duck={len(drows)} hash {'MATCH' if ok else 'MISMATCH ' + sh + ' vs ' + dh}"
          + ("".join(f"\n    PANDAS-PATH: {i}" for i in pd_issues)))
    if not ok: fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
