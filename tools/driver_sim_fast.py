"""Fast variant of driver_sim for in-round iteration: same gatecheck
parity (entry smoke + every queries()[name] vs oracle_sql()[name] via
DuckDB), but on a session with small shuffle parallelism + AQE so the
tiny-sf check doesn't pay 200-task stages.  Results are hash-compared
order-insensitively, so partitioning cannot change verdicts; the
FINAL round gate still runs tools/driver_sim.py (vanilla session).

Optional argv[1]: comma-separated query-name filter (substring match)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from tools import gatecheck

SF = os.environ.get("SIM_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SIM_CPUS', '16')}]"
    )
    .appName("driver-sim-fast")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

df = E.entry(spark)
n = df.count()
print(f"entry(): {n} rows")
assert n >= 0

flt = sys.argv[1].split(",") if len(sys.argv) > 1 else None
con = gatecheck.connect_oracle(SF)
qs, oracles = E.queries(), E.oracle_sql()
fails = 0
checked = 0
import time
for name, fn in qs.items():
    if flt and not any(f in name for f in flt):
        continue
    t0 = time.perf_counter()
    ok, lines = gatecheck.check_query(con, name, fn, oracles.get(name), spark, SF)
    print("\n".join(lines), f"[{time.perf_counter()-t0:.1f}s]", flush=True)
    checked += 1
    if not ok:
        fails += 1
print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} FAILURES", f"({checked} checked)")
sys.exit(1 if fails else 0)
