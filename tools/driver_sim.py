"""Driver simulation: exercise __spark_entry__ exactly as the harness
would — vanilla SparkSession, entry() smoke at sf0.001, every
queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01 with
order-insensitive value hashing + pandas-dtype-path checks
(tools/gatecheck.py holds the single shared implementation)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from tools import gatecheck

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
con = gatecheck.connect_oracle(SF)
qs, oracles = E.queries(), E.oracle_sql()
fails = 0
for name, fn in qs.items():
    ok, lines = gatecheck.check_query(
        con, name, fn, oracles.get(name), spark, SF
    )
    print("\n".join(lines))
    if not ok:
        fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
