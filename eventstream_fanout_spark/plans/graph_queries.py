"""Source-graph PageRank query with a DuckDB oracle.

The oracle unrolls the same N fixed iterations of the integer PageRank
(operators/graph.py) as chained CTEs — every floor/divide is written
with the identical operand order as the Spark expressions, so the
micro-unit ranks hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import sql_shingles, sql_tokens
from ..operators.graph import (
    DF_MAX,
    DF_MIN,
    N_ITER,
    RANK_SCALE,
    SHINGLE_N,
    cocitation_edges,
    pagerank_integer,
)
from ..sources.tables import load_table
from .registry import register


def _pagerank_oracle(n_iter: int = N_ITER) -> str:
    head = f"""
    WITH toks AS (
      SELECT doc_id, source, {sql_tokens('text')} AS t FROM documents
    ),
    sh0 AS (
      SELECT DISTINCT doc_id, source,
             unnest({sql_shingles('t', SHINGLE_N)}) AS g
      FROM toks
    ),
    rare AS (
      SELECT g FROM sh0 GROUP BY g
      HAVING COUNT(*) BETWEEN {DF_MIN} AND {DF_MAX}
    ),
    bounded AS (SELECT s.* FROM sh0 s JOIN rare r ON r.g = s.g),
    edges AS (
      SELECT DISTINCT a.source AS src, b.source AS dst
      FROM bounded a JOIN bounded b ON a.g = b.g
      WHERE a.source <> b.source
    ),
    nodes AS (SELECT DISTINCT source FROM documents),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
    outdeg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
      FROM edges GROUP BY src
    ),
    indeg AS (
      SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_deg
      FROM edges GROUP BY dst
    ),
    degreed AS (
      SELECT e.src, e.dst, o.out_deg
      FROM edges e JOIN outdeg o ON o.src = e.src
    ),
    rank0 AS (
      SELECT source, CAST(FLOOR({RANK_SCALE!r} / n_nodes) AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
    )"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
    contrib{k} AS (
      SELECT e.dst AS source,
             CAST(SUM(CAST(FLOOR(0.85 * r.r / e.out_deg) AS BIGINT))
                  AS BIGINT) AS contrib
      FROM rank{k - 1} r JOIN degreed e ON e.src = r.source
      GROUP BY e.dst
    ),
    rank{k} AS (
      SELECT n.source,
             CAST(CAST(FLOOR(0.15 * {RANK_SCALE!r} / nn.n_nodes) AS BIGINT)
                  + COALESCE(c.contrib, 0) AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN contrib{k} c ON c.source = n.source
    )""")
    tail = f"""
    SELECT r.source, CAST(r.r AS BIGINT) AS rank_micro,
           CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
           CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
    FROM rank{n_iter} r
    LEFT JOIN outdeg o ON o.src = r.source
    LEFT JOIN indeg i ON i.dst = r.source
    """
    return head + "," + ",".join(steps) + tail


@register(
    "domain_pagerank",
    _pagerank_oracle(),
    description="per-source authority rank for crawl curation: "
    "df-bounded rare-shingle co-citation edges between sources, then "
    f"{N_ITER} fixed iterations of integer micro-unit PageRank "
    "(d=0.85, dangling mass dropped) — exact BIGINT arithmetic at "
    "every step so the oracle matches bit-for-bit",
    tags=("graph", "curation", "extension"),
)
def domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = cocitation_edges(docs)
    nodes = docs.select("source").distinct()
    return pagerank_integer(nodes, edges)
