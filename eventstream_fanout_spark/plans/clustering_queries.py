"""Unsupervised clustering queries (Lloyd's k-means, integer-exact)
with DuckDB oracles that unroll the identical fixed iterations as
chained MATERIALIZED CTEs (the multiply-referenced per-round relations
would otherwise inline exponentially — same lesson as the BPE trainer
oracle in text_queries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.clustering import K_CLUSTERS, N_ITER, kmeans_fit, kmeans_report
from ..sources.tables import load_table
from .registry import register


def _kmeans_ctes(k: int = K_CLUSTERS, n_iter: int = N_ITER) -> str:
    """Quantize -> seed -> n_iter x (assign, update) -> final assign.
    Ends at cent{n_iter} and asgF (assignment against the last
    centroids).  No WITH, no tail select."""

    def _asg(name: str, cent: str) -> str:
        return f"""
    {name} AS MATERIALIZED (
      SELECT vec_id, q, cluster_id, dist FROM (
        SELECT vec_id, q, cluster_id, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dist ASC, cluster_id ASC) AS rn
        FROM (
          SELECT v.vec_id, v.q, c.cluster_id,
                 CAST(list_sum(list_transform(
                   generate_series(1, len(v.q)),
                   j -> (v.q[j] - c.c[j]) * (v.q[j] - c.c[j])))
                   AS BIGINT) AS dist
          FROM qv v CROSS JOIN {cent} c))
      WHERE rn = 1
    )"""

    blocks = [
        f"""
    qv AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                         AS BIGINT)) AS q
      FROM embeddings
    ),
    cent0 AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
               - 1 AS BIGINT) AS cluster_id,
             q AS c
      FROM qv
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
      LIMIT {k}
    )"""
    ]
    for t in range(1, n_iter + 1):
        blocks.append(_asg(f"asg{t}", f"cent{t - 1}"))
        blocks.append(f"""
    cent{t} AS MATERIALIZED (
      SELECT cluster_id, list(cx ORDER BY i) AS c FROM (
        SELECT cluster_id, i,
               CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*))
                    AS BIGINT) AS cx
        FROM (SELECT cluster_id,
                     unnest(generate_series(1, len(q))) AS i,
                     unnest(q) AS x
              FROM asg{t})
        GROUP BY cluster_id, i)
      GROUP BY cluster_id
    )""")
    blocks.append(_asg("asgF", f"cent{n_iter}"))
    return ",".join(blocks)


_KMEANS_REPORT_ORACLE = f"""
    WITH {_kmeans_ctes()},
    ck AS (
      SELECT cluster_id,
             CAST(list_sum(list_transform(generate_series(1, len(c)),
               j -> CAST(j AS BIGINT) * c[j])) AS BIGINT)
               AS centroid_checksum
      FROM cent{N_ITER}
    )
    SELECT a.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(a.dist) AS BIGINT) AS inertia,
           ck.centroid_checksum
    FROM asgF a JOIN ck USING (cluster_id)
    GROUP BY a.cluster_id, ck.centroid_checksum
    ORDER BY cluster_id ASC
    """


@register(
    "kmeans_lloyd_report",
    _KMEANS_REPORT_ORACLE,
    description="unsupervised Lloyd's k-means over the embedding "
    f"corpus ({K_CLUSTERS} clusters, {N_ITER} fixed rounds) in EXACT "
    "scaled-integer arithmetic: micro-unit coordinates, BIGINT "
    "squared distances, floor-mean centroid updates, md5-ranked "
    "deterministic seeds — per-cluster size, exact inertia, and a "
    "position-weighted centroid checksum that pins every centroid "
    "component into the hash.  Assignment broadcasts the k centroid "
    "rows against one corpus scan (no big-side shuffle); updates "
    "shuffle only k x dims partial sums — the textbook distributed "
    "k-means cost per round.  The semantic-dedup / corpus-mix "
    "discovery primitive when no labels exist",
    tags=("clustering", "embedding", "iterative", "extension"),
)
def kmeans_lloyd_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return kmeans_report(emb)


_KMEANS_PURITY_ORACLE = f"""
    WITH {_kmeans_ctes()},
    bylab AS (
      SELECT a.cluster_id, l.label, CAST(COUNT(*) AS BIGINT) AS n
      FROM asgF a JOIN embeddings l USING (vec_id)
      GROUP BY a.cluster_id, l.label
    ),
    tot AS (
      SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS n_vecs
      FROM bylab GROUP BY cluster_id
    ),
    maj AS (
      SELECT cluster_id, label AS top_label, n AS top_n FROM (
        SELECT cluster_id, label, n,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                 ORDER BY n DESC, label ASC) AS rn
        FROM bylab)
      WHERE rn = 1
    )
    SELECT t.cluster_id, t.n_vecs, m.top_label, m.top_n,
           CAST(FLOOR(m.top_n * 1000000.0 / t.n_vecs) AS BIGINT)
             AS purity_ppm
    FROM tot t JOIN maj m USING (cluster_id)
    ORDER BY t.cluster_id ASC
    """


@register(
    "kmeans_label_purity",
    _KMEANS_PURITY_ORACLE,
    description="external validation of the unsupervised fit: per "
    "k-means cluster, the majority TRUE label and its ppm share "
    "(ties to the smaller label) — the label-agreement diagnostic "
    "that decides whether an unlabeled-corpus clustering is good "
    "enough to drive cluster-quota curation.  Reuses the full "
    f"{N_ITER}-round integer Lloyd chain; one extra label join + two "
    "cluster-sized aggregates on top",
    tags=("clustering", "embedding", "evaluation", "extension"),
)
def kmeans_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(emb.select("vec_id", "embedding"))
    bylab = (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = bylab.groupBy("cluster_id").agg(
        F.sum("n").cast("bigint").alias("n_vecs")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n"), F.asc("label")
    )
    maj = (
        bylab.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("top_label"),
            F.col("n").alias("top_n"),
        )
    )
    return (
        tot.join(maj, "cluster_id")
        .select(
            "cluster_id",
            "n_vecs",
            "top_label",
            "top_n",
            F.floor(
                F.col("top_n") * F.lit(1_000_000.0) / F.col("n_vecs")
            )
            .cast("long")
            .alias("purity_ppm"),
        )
        .orderBy("cluster_id")
    )
