"""Targeted oracle-parity check: ``python tools/spot_check.py q1 q2 ...``
runs only the named queries (all of them with no args) through the SAME
hashing + pandas-path rules as driver_sim.py (shared in
tools/gatecheck.py — the two gates cannot drift).  Fast iteration loop
for new/changed queries."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from tools import gatecheck

SF = "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]").appName("spot-check").getOrCreate()
)

con = gatecheck.connect_oracle(SF)
qs, oracles = E.queries(), E.oracle_sql()
names = sys.argv[1:] or list(qs)
fails = 0
for name in names:
    try:
        ok, lines = gatecheck.check_query(
            con, name, qs[name], oracles.get(name), spark, SF
        )
        print("\n".join(lines))
        if not ok:
            fails += 1
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
        fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
