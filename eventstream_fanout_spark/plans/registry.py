"""Query registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each :class:`QuerySpec` pairs a PySpark implementation with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables (the
driver's correctness gate; see SURVEY.md §5).  Specs without an oracle
(genuinely non-SQL-expressible ops) get a weaker rows-only check.

Column-name contract: every computed column is aliased identically in
the DataFrame code and the SQL, because the driver sorts columns by
name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every plan module so registration side-effects run.

    Missing modules (not built yet in this round) are skipped; broken
    modules raise so tests catch them.
    """
    import importlib.util

    pkg = __name__.rsplit(".", 1)[0]
    for modname in (
        "reference_queries",
        "relational_queries",
        "scalar_queries",
        "analytic_queries",
        "asof_queries",
        "upsert_queries",
        "window_queries",
        "dedup_queries",
        "similarity_queries",
        "text_queries",
        "pipeline_queries",
        "streaming_queries",
    ):
        fq = f"{pkg}.{modname}"
        if importlib.util.find_spec(fq) is not None:
            __import__(fq)


_load_all()
