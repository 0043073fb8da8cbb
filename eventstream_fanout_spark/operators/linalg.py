"""Deterministic distributed linear algebra over embedding columns:
full integer covariance matrix + power iteration for the dominant
principal component (the PCA/whitening/OPQ-rotation prep step of an
embedding pipeline).

Exactness strategy: the covariance numerators are EXACT BIGINTs
(``n * S_ij - S_i * S_j`` over micro-quantized components — the same
relation contract as plans/classify_queries.embedding_covariance_top,
which reports only the top pairs; here the FULL symmetric matrix is
built because the iteration needs it).  The iteration then normalizes
through a fixed chain of IEEE double ops on integer-valued inputs —
every intermediate (|u_i| <= dims * 1e12 < 2^53) converts to double
exactly, and multiply/divide/floor are correctly-rounded IEEE ops, so
both engines compute bit-identical integers even where the math is
inexact.  Signs are deterministic from the fixed all-ones start.

Scale notes: the matrix build is one exploded self-join per vector
(d^2/2 products, map-side combined) — d x d output rows regardless of
corpus size; each power step is a d^2-row join against a d-row vector
(driver-trivial, broadcast).  The BIGINT numerator bound
``n * S_ij <~ n^2 * QC_COV^2`` caps exact-integer mode at
``n <= 2^31 / QC_COV`` rows per 64-dim matrix; past that, production
scales the quantization down further or moves the sums to a
mapInArrow outer-product kernel — the relation contract
(i, j, cov_num, n) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Covariance-path quantization.  DELIBERATELY coarser than
# classify.QC (1e6): the covariance numerators square the scale, so
# QC drives the exact-int64 row ceiling linearly (n <= 2^31 / QC).
# 1e5 trades one decimal digit of per-component precision for 10x
# row headroom — the round-12 advice found the old 1e6 ceiling
# (2146 rows) only ~7% above the sf0.1 embeddings corpus (2000).
QC_COV = 100_000.0

VSCALE = 1_000_000.0  # rescale target: |v_i| <= 1e6 after every step
N_POWER_ITER = 4

# Exact-integer ceiling for the covariance numerators: with |x| <= 1
# so |qx| <= QC_COV, |n*S_ij| and |S_i*S_j| are each <= n^2*QC_COV^2,
# and the difference must stay inside int64: 2 * n^2 * QC_COV^2 <
# 2^63 requires n <= 2^31 / QC_COV (= 21,474 at 1e5, ~10x the sf0.1
# corpus).  Past it Spark's long arithmetic would WRAP silently while
# the DuckDB oracle (HUGEINT) errors on the BIGINT cast — an
# asymmetric failure the in-plan guard below turns into a loud,
# symmetric one.  DERIVED from QC_COV so retuning the scale moves the
# guard with it.
N_EXACT_MAX = int(2**31 // int(QC_COV))


def _qcomp(x) -> F.Column:
    """Micro-quantize one embedding component at the covariance
    scale: floor(x * QC_COV + 0.5) as BIGINT (linalg-local twin of
    classify._qcomp — same formula, coarser scale)."""
    return (
        F.floor(x.cast("double") * F.lit(QC_COV) + F.lit(0.5))
        .cast("long")
    )


def covariance_matrix(emb: DataFrame) -> DataFrame:
    """Full symmetric integer covariance relation: (fi, fj, cov_num)
    for ALL ordered pairs including the diagonal, 0-based dims,
    cov_num = n * S_ij - S_i * S_j (cov = cov_num / (n^2 * QC^2))."""
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", _qcomp(F.col("x")).alias("qx"))
    n_vecs = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s1 = flat.groupBy("i").agg(F.sum("qx").cast("long").alias("s"))
    a, b = flat.alias("a"), flat.alias("b")
    s2 = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id"))
        .groupBy(F.col("a.i").alias("fi"), F.col("b.i").alias("fj"))
        .agg(
            F.sum(F.col("a.qx") * F.col("b.qx")).cast("long").alias("sij")
        )
    )
    return (
        s2.join(
            s1.select(F.col("i").alias("fi"), F.col("s").alias("sa")),
            "fi",
        )
        .join(
            s1.select(F.col("i").alias("fj"), F.col("s").alias("sb")),
            "fj",
        )
        .crossJoin(F.broadcast(n_vecs))
        .select(
            "fi",
            "fj",
            # the guard rides the output expression itself (an unused
            # side column would be pruned away with the assertion)
            F.when(
                F.col("n") <= F.lit(N_EXACT_MAX),
                (
                    F.col("n") * F.col("sij")
                    - F.col("sa") * F.col("sb")
                ).cast("long"),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "covariance_matrix: corpus exceeds the "
                        f"exact-int64 ceiling (n > {N_EXACT_MAX}) — "
                        "scale QC_COV down or use the mapInArrow "
                        "kernel path"
                    )
                ).cast("long")
            )
            .alias("cov_num"),
        )
    )


def scaled_matrix(cov: DataFrame) -> DataFrame:
    """Rescale the covariance numerators into [-1e6, 1e6]:
    m = floor(cov_num * 1e6 / max|cov_num|) — a fixed IEEE chain on
    exact-integer-valued doubles, bit-identical across engines."""
    maxabs = cov.agg(
        F.max(F.abs(F.col("cov_num"))).cast("long").alias("ma")
    )
    return cov.crossJoin(F.broadcast(maxabs)).select(
        "fi",
        "fj",
        F.floor(
            F.col("cov_num").cast("double")
            * F.lit(VSCALE)
            / F.col("ma").cast("double")
        )
        .cast("long")
        .alias("m"),
    )


def power_iteration(
    m: DataFrame, n_iter: int = N_POWER_ITER
) -> DataFrame:
    """Dominant-eigenvector power iteration over the scaled matrix:
    v0 = 1e6 (all dims), then n_iter x (u = M v; v = floor(u * 1e6 /
    max|u|)).  Returns (fi, loading) — the integer loadings of the
    first principal direction, |loading| <= 1e6, sign fixed by the
    deterministic start."""
    m = m.localCheckpoint(eager=True)
    v = m.select(F.col("fi").alias("j")).distinct().select(
        "j", F.lit(int(VSCALE)).cast("long").alias("v")
    )
    for _ in range(n_iter):
        u = (
            m.join(v, m["fj"] == v["j"])
            .groupBy("fi")
            .agg(F.sum(F.col("m") * F.col("v")).cast("long").alias("u"))
        )
        umax = u.agg(F.max(F.abs(F.col("u"))).cast("long").alias("um"))
        v = (
            u.crossJoin(F.broadcast(umax))
            .select(
                F.col("fi").alias("j"),
                F.floor(
                    F.col("u").cast("double")
                    * F.lit(VSCALE)
                    / F.col("um").cast("double")
                )
                .cast("long")
                .alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select(F.col("j").alias("fi"), F.col("v").alias("loading"))
