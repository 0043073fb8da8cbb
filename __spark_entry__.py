"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`eventstream_fanout_spark.plans.registry`, the
single source of truth pairing each PySpark query with its DuckDB
oracle SQL.  See SURVEY.md §2 for the operator inventory each query
covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)
# Spawned executor Python workers inherit the environment, not the
# driver's sys.path — make the package importable there too.
if _REPO_ROOT not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        f"{_REPO_ROOT}:{os.environ['PYTHONPATH']}"
        if os.environ.get("PYTHONPATH")
        else _REPO_ROOT
    )

from eventstream_fanout_spark.plans.registry import (  # noqa: E402
    QUERIES,
    ordered_queries,
)
from eventstream_fanout_spark.session import apply_engine_conf  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_engine_conf(spark)
    return QUERIES["flagship_enrich"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_engine_conf(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.description
        return run

    return {name: wrap(spec) for name, spec in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries get the
    driver's weaker rows-only check."""
    return {
        name: spec.oracle
        for name, spec in ordered_queries().items()
        if spec.oracle is not None
    }
