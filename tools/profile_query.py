"""Per-query profiler for the optimization rounds: run one registered
query on the bench session (tuned conf, local[$SPARK_GRAFT_CPUS]) at
$SPARK_GRAFT_SF_DIR, with the noop sink, N times; print per-run wall
seconds and optionally dump .explain("formatted").

Usage: python tools/profile_query.py <name> [runs] [--explain out.txt]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 2
    explain_out = None
    if "--explain" in sys.argv:
        explain_out = sys.argv[sys.argv.index("--explain") + 1]

    from eventstream_fanout_spark.plans.registry import QUERIES
    from eventstream_fanout_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{name}")
    spec = QUERIES[name]
    # warm scan path
    QUERIES["count_star"].fn(spark, SF_DIR).collect()
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"RUN {i}: {dt:.3f}s", flush=True)
    if explain_out:
        df = spec.fn(spark, SF_DIR)
        with open(explain_out, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"explain -> {explain_out}")


if __name__ == "__main__":
    main()
