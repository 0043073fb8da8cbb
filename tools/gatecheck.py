"""Shared canonicalization for the local correctness gates
(driver_sim.py = full registry, spot_check.py = named queries).

ONE implementation of the driver's comparison rules so the two tools
cannot drift: order-insensitive value hashing over collect()/fetchall()
rows (floats via exact repr, timestamps ISO, Decimal normalized), plus
the pandas-dtype-path checks the real harness implies (HUGEINT->float64
kind mismatches, unhashable array cells).  Both paths run on purpose —
the fetchall hash catches value-level divergence, the pandas pass
catches dtype/rendering divergence the hash alone missed in round 1.
"""
from __future__ import annotations

import datetime
import hashlib
import math
from decimal import Decimal

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def connect_oracle(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def pandas_path_issues(con, sdf, oracle_sql):
    """Replicate the REAL driver's pandas canonicalization hazards.

    Round-1 lesson: the harness converts both result sets to pandas and
    sorts the frame; fetchall()-based hashing misses two failure
    classes the pandas path hits:
      * DuckDB HUGEINT (bare SUM of ints) -> float64 while Spark emits
        int64  => value-hash mismatch (8973 vs 8973.0).
      * array-typed output columns -> numpy.ndarray cells, unhashable
        in pandas sort_values => hard driver ERROR.
    Returns a list of human-readable issue strings (empty == safe).
    """
    issues = []
    spd = sdf.toPandas()
    dpd = con.execute(oracle_sql).fetch_df()
    for frame, side in ((spd, "spark"), (dpd, "duck")):
        for c in frame.columns:
            if frame[c].dtype == object:
                cell = next((v for v in frame[c] if v is not None), None)
                if isinstance(cell, (list, tuple)) or (
                    type(cell).__name__ == "ndarray"
                ):
                    issues.append(
                        f"{side}.{c}: unhashable {type(cell).__name__} cells"
                    )
    for c in set(spd.columns) & set(dpd.columns):
        sk, dk = spd[c].dtype.kind, dpd[c].dtype.kind
        if sk != dk and {sk, dk} != {"O"}:
            issues.append(
                f"{c}: dtype kind spark={spd[c].dtype} duck={dpd[c].dtype}"
            )
    return issues


def check_query(con, name, fn, oracle, spark, sf_dir):
    """Run one query both ways; returns (ok, message_lines)."""
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    if oracle is None:
        return True, [f"{name}: rows-only, {len(srows)} rows OK"]
    cur = con.execute(oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    sh, dh = value_hash(sdf.columns, srows), value_hash(dcols, drows)
    issues = pandas_path_issues(con, sdf, oracle)
    ok = (
        sorted(sdf.columns) == sorted(dcols)
        and len(srows) == len(drows)
        and sh == dh
        and not issues
    )
    lines = [
        f"{name}: spark={len(srows)} duck={len(drows)} "
        + ("MATCH" if ok else f"MISMATCH {sh} vs {dh}")
    ]
    lines += [f"    PANDAS-PATH: {i}" for i in issues]
    if sorted(sdf.columns) != sorted(dcols):
        lines.append(
            f"    cols: spark={sorted(sdf.columns)} duck={sorted(dcols)}"
        )
    return ok, lines


def gate_line(
    pytest_result: str, front_result: str, entry_rows: int | None = None
) -> str:
    """The COVERAGE.md closing-gates paragraph, derived from the
    SHIPPED registry by construction (VERDICT r8 item 8: the
    hand-written line drifted from the registry twice) — query/oracle/
    FRONT counts are read from the code; the run outcomes (pytest,
    front_check, entry smoke) are passed in from the actual runs.

        python tools/gatecheck.py "<pytest summary>" "<front result>" \\
            [entry_rows]
    """
    import datetime

    from eventstream_fanout_spark.plans.registry import (
        FRONT,
        ordered_queries,
    )

    qs = ordered_queries()
    n_oracle = sum(1 for s in qs.values() if s.oracle is not None)
    entry = (
        f"`__spark_entry__` smoke green (entry {entry_rows} rows; "
        if entry_rows is not None
        else "`__spark_entry__` smoke green ("
    )
    today = datetime.date.today().isoformat()
    return (
        f"Closing gates (generated by tools/gatecheck.gate_line from "
        f"the shipped registry, {today}): full pytest "
        f"**{pytest_result}**, `tools/front_check.py` (no args = the "
        f"{len(FRONT)}-slot FRONT) **{front_result}** at sf0.01, "
        f"{entry}{len(qs)} queries / {n_oracle} oracles), COVERAGE "
        f"rotation bullet generated by tools/rotation_bullet.py (not "
        f"hand-written)."
    )


if __name__ == "__main__":
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0,
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    )
    print(
        gate_line(
            _sys.argv[1] if len(_sys.argv) > 1 else "<pytest result>",
            _sys.argv[2] if len(_sys.argv) > 2 else "<front result>",
            int(_sys.argv[3]) if len(_sys.argv) > 3 else None,
        )
    )
