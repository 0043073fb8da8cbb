"""Deterministic vector (embedding) math over ``array<float>`` columns.

Strategy: all dot products / norms quantize each elementwise product to
integer nano-units (``floor(x*y*1e9 + 0.5)``) and sum those integers —
exact, order-independent, and reproducible bit-for-bit by a SQL oracle
that flattens the arrays with UNNEST and sums BIGINTs.  The final
combine (divide, sqrt) is a fixed chain of IEEE ops written identically
on both sides.

Everything is built-in Column ops (zip_with / aggregate / transform) —
JVM-side, no Python UDFs in the hot path.  At 100 TB the brute-force
pairwise ops below are replaced by the LSH-bucketed path in
operators/similarity.py; the *scoring* math is shared.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QV = 1_000_000_000.0  # nano-unit quantization for elementwise products


def quantized_product_sum(a: Column, b: Column) -> Column:
    """Integer sum of quantized elementwise products (BIGINT-exact)."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(QV) + F.lit(0.5)
        ).cast("long"),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def dot(a: Column, b: Column) -> Column:
    return quantized_product_sum(a, b).cast("double") / F.lit(QV)


def norm2(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) — denominators via the same quantized sums."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


# --- SQL oracle emitters (DuckDB) --------------------------------------

def sql_flat_cte(table: str = "embeddings", id_col: str = "vec_id") -> str:
    """CTE flattening (id, i, x) with 1-based ordinality and the same
    quantization as the Spark side (xq = nano-unit int of x)."""
    return f"""
    flat AS (
      SELECT {id_col}, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM {table}
    )"""


def sql_pair_sums(left: str, right: str, join_cond: str) -> str:
    """Pairwise quantized dot+norm sums from two flat relations."""
    return f"""
      SELECT {left}.vec_id AS vid_a, {right}.vec_id AS vid_b,
             CAST(SUM(CAST(FLOOR({left}.x * {right}.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM {left} JOIN {right}
        ON {left}.i = {right}.i AND ({join_cond})
      GROUP BY 1, 2"""


def sql_norm2_cte() -> str:
    return f"""
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flat GROUP BY vec_id
    )"""
