"""Check only the FRONT-50 (the driver's evidence window) vs oracles
at sf0.01 — same rules as driver_sim.py, bounded to the slots the
harness will actually evaluate this round."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from eventstream_fanout_spark.plans.registry import FRONT
from tools import gatecheck

SF = os.environ.get("FRONT_CHECK_SF", "/root/testdata/sf0.01")

names = sys.argv[1:] or FRONT

spark = (
    SparkSession.builder.master("local[8]")
    .appName("front-check")
    .getOrCreate()
)

con = gatecheck.connect_oracle(SF)
qs, oracles = E.queries(), E.oracle_sql()
fails = 0
for name in names:
    if name not in qs:
        print(f"{name}: NOT IN queries() — FAIL")
        fails += 1
        continue
    try:
        ok, lines = gatecheck.check_query(
            con, name, qs[name], oracles.get(name), spark, SF
        )
    except Exception as exc:  # noqa: BLE001 — report, keep checking
        ok, lines = False, [f"{name}: ERROR {type(exc).__name__}: {exc}"]
    print("\n".join(lines), flush=True)
    if not ok:
        fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
