#!/usr/bin/env python3
"""Run named registered queries once each in a fresh SparkSession and
print one JSON line of per-query seconds — the unit step of an
alternating A/B comparison between two checkouts (r15; PERF.md's
same-session A/B discipline extended to code that cannot coexist in
one interpreter: the driver shell interleaves A-process / B-process
runs so machine drift lands on both arms).

Usage:
    python tools/ab_runner.py <repo_root> <q1,q2,...> [label]

The repo at <repo_root> is prepended to sys.path, so a git worktree of
any commit serves as an arm.  A fixed calibration probe (pure compute,
no table IO) runs first and is reported alongside, so each sample is
drift-stamped.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    label = sys.argv[3] if len(sys.argv) > 3 else root
    sys.path.insert(0, root)

    from pyspark.sql import functions as F

    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab-{label}")
    try:
        QUERIES["count_star"].fn(spark, sf_dir).collect()  # warm
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(F.sum((F.col("id") * 2654435761) % 1000000007))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        cal = round(time.perf_counter() - t0, 3)
        out = {}
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {"label": label, "cal": cal, "queries": out},
                separators=(",", ":"),
            ),
            flush=True,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
