"""Unsupervised clustering queries (Lloyd's k-means, integer-exact)
with DuckDB oracles that unroll the identical fixed iterations as
chained MATERIALIZED CTEs (the multiply-referenced per-round relations
would otherwise inline exponentially — same lesson as the BPE trainer
oracle in text_queries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.clustering import K_CLUSTERS, N_ITER, kmeans_fit, kmeans_report
from ..sources.tables import dataset_cache_key, load_table
from ..streaming import await_or_raise
from .registry import register


def _sql_asg(name: str, cent: str, src: str = "qv") -> str:
    """One nearest-centroid assignment CTE: ``src`` (vec_id, q) x the
    ``cent`` centroid set, exact BIGINT distance, ties to the smaller
    cluster_id."""
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
          FROM {src} v CROSS JOIN {cent} c))
      WHERE rn = 1
    )"""


def _kmeans_ctes(
    k: int = K_CLUSTERS,
    n_iter: int = N_ITER,
    base_filter: str = "1 = 1",
) -> str:
    """Quantize -> seed -> n_iter x (assign, update) -> final assign.
    Ends at cent{n_iter} and asgF (assignment against the last
    centroids).  ``base_filter`` restricts the FIT corpus (``qv``);
    ``qv_all`` stays unfiltered for downstream eval/batch stages.
    No WITH, no tail select."""

    def _asg(name: str, cent: str) -> str:
        return _sql_asg(name, cent, "qv")

    blocks = [
        f"""
    qv_all AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                         AS BIGINT)) AS q
      FROM embeddings
    ),
    qv AS MATERIALIZED (
      SELECT vec_id, q FROM qv_all WHERE {base_filter}
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
    blocks.extend(_lloyd_blocks("", "cent0", n_iter))
    return ",".join(blocks)


def _lloyd_blocks(
    prefix: str, cent0: str, n_iter: int = N_ITER, src: str = "qv"
) -> list[str]:
    """n_iter Lloyd rounds from the ``cent0`` centroid relation over
    ``src``: {prefix}asg{t}/{prefix}cent{t} .. {prefix}asgF.  The
    empty prefix keeps the historical CTE names stable."""
    blocks: list[str] = []
    prev = cent0
    for t in range(1, n_iter + 1):
        blocks.append(_sql_asg(f"{prefix}asg{t}", prev, src))
        blocks.append(f"""
    {prefix}cent{t} AS MATERIALIZED (
      SELECT cluster_id, list(cx ORDER BY i) AS c FROM (
        SELECT cluster_id, i,
               CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*))
                    AS BIGINT) AS cx
        FROM (SELECT cluster_id,
                     unnest(generate_series(1, len(q))) AS i,
                     unnest(q) AS x
              FROM {prefix}asg{t})
        GROUP BY cluster_id, i)
      GROUP BY cluster_id
    )""")
        prev = f"{prefix}cent{t}"
    blocks.append(_sql_asg(f"{prefix}asgF", prev, src))
    return blocks


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



# Assignment store, built ONCE per (process, sf_dir) — the production
# shape: a corpus clustering is a scheduled artifact its consumers
# (purity/outlier/curation readouts) READ, not something each re-fits
# (same amortization pattern as graph_queries._ensure_rank_store and
# text_queries._ensure_bpe_store).  kmeans_lloyd_report itself stays a
# full derivation so the Lloyd math keeps direct driver-gate evidence;
# the mini-batch/erasure/refresh sims fit on their own base subsets by
# design.
_KMEANS_STORE_CACHE: dict[str, str] = {}


def _ensure_kmeans_store(spark: SparkSession, sf_dir: str) -> str:
    key = dataset_cache_key(sf_dir)
    path = _KMEANS_STORE_CACHE.get(key)
    if path is None:
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        assigned, _ = kmeans_fit(emb)
        path = tempfile.mkdtemp(prefix="kmeans_store_") + "/assigned"
        assigned.select(
            "vec_id", "cluster_id", "dist"
        ).write.mode("overwrite").parquet(path)
        _KMEANS_STORE_CACHE[key] = path
    return path


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
    assigned = spark.read.parquet(_ensure_kmeans_store(spark, sf_dir))
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


def _sql_delta(name: str, asg: str, batch_id: int) -> str:
    """Per-(cluster, dim) exact partial state of one assignment
    relation, keyed by batch_id (1-based dims, DuckDB side)."""
    return f"""
    {name} AS MATERIALIZED (
      SELECT CAST({batch_id} AS INTEGER) AS batch_id, cluster_id, i,
             CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT cluster_id,
                   unnest(generate_series(1, len(q))) AS i,
                   unnest(q) AS x
            FROM {asg})
      GROUP BY cluster_id, i
    )"""


def _sql_serve(name: str, partials_sql: str) -> str:
    """Serve centroid arrays from merged partial state:
    c_i = floor(sum(s)/sum(n)).  ``HAVING SUM(n) > 0`` mirrors
    serve_centroids' guard — a fully-erased cluster drops on both
    engines instead of forking on 0-division semantics."""
    return f"""
    {name} AS MATERIALIZED (
      SELECT cluster_id, list(cx ORDER BY i) AS c FROM (
        SELECT cluster_id, i,
               CAST(FLOOR(CAST(SUM(s) AS DOUBLE) / SUM(n)) AS BIGINT)
                 AS cx
        FROM ({partials_sql}) GROUP BY cluster_id, i
        HAVING SUM(n) > 0)
      GROUP BY cluster_id
    )"""


_MINIBATCH_ORACLE = f"""
    WITH {_kmeans_ctes(base_filter="vec_id % 2 = 0")},
    {_sql_delta("state0", "asgF", 0)},
    {_sql_serve("serve0", "SELECT * FROM state0")},
    bq1 AS MATERIALIZED (
      SELECT vec_id, q FROM qv_all WHERE vec_id % 4 = 1
    ),
    {_sql_asg("basg1", "serve0", "bq1")},
    {_sql_delta("d1", "basg1", 1)},
    {_sql_serve("serve1",
                "SELECT * FROM state0 UNION ALL SELECT * FROM d1")},
    bq2 AS MATERIALIZED (
      SELECT vec_id, q FROM qv_all WHERE vec_id % 4 = 3
    ),
    {_sql_asg("basg2", "serve1", "bq2")},
    {_sql_delta("d2", "basg2", 2)},
    partials AS (
      SELECT * FROM state0 UNION ALL SELECT * FROM d1
      UNION ALL SELECT * FROM d2
      UNION ALL SELECT * FROM d1
    ),
    applied AS (SELECT DISTINCT * FROM partials),
    tot AS MATERIALIZED (
      SELECT cluster_id, i, CAST(SUM(s) AS BIGINT) AS s,
             CAST(SUM(n) AS BIGINT) AS n
      FROM applied GROUP BY cluster_id, i
    ),
    {_sql_serve("served", "SELECT * FROM tot")},
    {_sql_asg("easg", "served", "qv_all")},
    ck AS (
      SELECT cluster_id,
             CAST(list_sum(list_transform(generate_series(1, len(c)),
               j -> CAST(j AS BIGINT) * c[j])) AS BIGINT)
               AS centroid_checksum
      FROM served
    ),
    members AS (
      SELECT cluster_id, CAST(MIN(n) AS BIGINT) AS n_members
      FROM tot GROUP BY cluster_id
    ),
    evaln AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS eval_n
      FROM easg GROUP BY cluster_id
    )
    SELECT m.cluster_id, m.n_members, ck.centroid_checksum,
           COALESCE(e.eval_n, CAST(0 AS BIGINT)) AS eval_n
    FROM members m
    JOIN ck USING (cluster_id)
    LEFT JOIN evaln e USING (cluster_id)
    ORDER BY m.cluster_id ASC
    """


@register(
    "kmeans_minibatch_sim",
    _MINIBATCH_ORACLE,
    description="MINI-BATCH k-means maintenance with replay (the "
    "streaming shape of keeping a clustering current as a corpus "
    "grows, without refitting): the model fits on the even half "
    f"({N_ITER} integer Lloyd rounds), then persists per-(cluster, "
    "dim) SUMS+COUNTS — the mergeable representation — as a batch-id-"
    "keyed generation-0 state; two ingest 'triggers' assign their "
    "vectors against the state AS IT STOOD when they ran (batch 1 vs "
    "the fit state, batch 2 vs fit+batch-1 — order matters, the "
    "as-of-generation pin every sink in this repo documents) and "
    "append their deltas; trigger 1 is replayed (crash/retry) and "
    "collapses against its original via the batch-id-keyed DISTINCT.  "
    "Serving floor-means the merged BIGINT sums — exact at any number "
    "of merged deltas — and the eval stage assigns the FULL corpus "
    "against the maintained centroids.  Maintenance cost per trigger "
    "is batch-sized + k x dims, never corpus-sized",
    tags=("clustering", "streaming", "incremental", "iterative",
          "extension"),
)
def kmeans_minibatch_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import (
        assign_clusters,
        centroid_sums,
        kmeans_fit_q,
        quantize_vectors,
        serve_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qv_all = quantize_vectors(emb).localCheckpoint(eager=True)
    base = qv_all.where(F.col("vec_id") % 2 == 0)
    assigned, _ = kmeans_fit_q(base)

    def delta(asg: DataFrame, bid: int) -> DataFrame:
        return centroid_sums(asg).select(
            F.lit(bid).cast("int").alias("batch_id"),
            "cluster_id",
            "i",
            "s",
            "n",
        )

    state0 = delta(assigned, 0).localCheckpoint(eager=True)
    serve0 = serve_centroids(
        state0.select("cluster_id", "i", "s", "n")
    ).localCheckpoint(eager=True)

    def make_d1() -> DataFrame:
        b1 = qv_all.where(F.col("vec_id") % 4 == 1)
        return delta(assign_clusters(b1, serve0), 1)

    d1 = make_d1().localCheckpoint(eager=True)
    serve1 = serve_centroids(
        state0.unionByName(d1).select("cluster_id", "i", "s", "n")
    ).localCheckpoint(eager=True)
    b2 = qv_all.where(F.col("vec_id") % 4 == 3)
    d2 = delta(assign_clusters(b2, serve1), 2).localCheckpoint(
        eager=True
    )

    partials = (
        state0.unionByName(d1)
        .unionByName(d2)
        .unionByName(make_d1())  # replayed trigger 1
    )
    applied = partials.distinct()
    tot = applied.groupBy("cluster_id", "i").agg(
        F.sum("s").cast("long").alias("s"),
        F.sum("n").cast("long").alias("n"),
    )
    served = serve_centroids(tot).localCheckpoint(eager=True)
    evaln = (
        assign_clusters(qv_all, served)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("eval_n"))
    )
    from ..operators.clustering import centroid_checksum_col

    ck = served.select(
        "cluster_id",
        centroid_checksum_col(F.col("c")).alias("centroid_checksum"),
    )
    members = tot.groupBy("cluster_id").agg(
        F.min("n").cast("bigint").alias("n_members")
    )
    return (
        members.join(ck, "cluster_id")
        .join(evaln, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            "centroid_checksum",
            F.coalesce(F.col("eval_n"), F.lit(0).cast("bigint")).alias(
                "eval_n"
            ),
        )
        .orderBy("cluster_id")
    )


_ERASE_PRED = "vec_id % 17 = 5"

_KMEANS_ERASURE_ORACLE = f"""
    WITH {_kmeans_ctes(base_filter="vec_id % 2 = 0")},
    {_sql_delta("state0", "asgF", 0)},
    {_sql_serve("serve0", "SELECT * FROM state0")},
    bq1 AS MATERIALIZED (
      SELECT vec_id, q FROM qv_all WHERE vec_id % 4 = 1
    ),
    {_sql_asg("basg1", "serve0", "bq1")},
    {_sql_delta("d1", "basg1", 1)},
    doomed AS MATERIALIZED (
      SELECT vec_id, q, cluster_id FROM asgF WHERE {_ERASE_PRED}
      UNION ALL
      SELECT vec_id, q, cluster_id FROM basg1 WHERE {_ERASE_PRED}
    ),
    corr AS MATERIALIZED (
      SELECT CAST(2 AS INTEGER) AS batch_id, cluster_id, i,
             CAST(-SUM(x) AS BIGINT) AS s,
             CAST(-COUNT(*) AS BIGINT) AS n
      FROM (SELECT cluster_id,
                   unnest(generate_series(1, len(q))) AS i,
                   unnest(q) AS x
            FROM doomed)
      GROUP BY cluster_id, i
    ),
    partials AS (
      SELECT * FROM state0 UNION ALL SELECT * FROM d1
      UNION ALL SELECT * FROM corr
      UNION ALL SELECT * FROM corr
    ),
    applied AS (SELECT DISTINCT * FROM partials),
    tot AS MATERIALIZED (
      SELECT cluster_id, i, CAST(SUM(s) AS BIGINT) AS s,
             CAST(SUM(n) AS BIGINT) AS n
      FROM applied GROUP BY cluster_id, i
    ),
    direct AS MATERIALIZED (
      SELECT cluster_id, i, CAST(SUM(x) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT cluster_id,
                   unnest(generate_series(1, len(q))) AS i,
                   unnest(q) AS x
            FROM (SELECT vec_id, q, cluster_id FROM asgF
                  UNION ALL
                  SELECT vec_id, q, cluster_id FROM basg1)
            WHERE NOT ({_ERASE_PRED}))
      GROUP BY cluster_id, i
    )
    SELECT t.cluster_id,
           CAST(MIN(t.n) AS BIGINT) AS n_members,
           CAST(SUM(t.s * t.i) AS BIGINT) AS state_checksum,
           BOOL_AND(t.s = d.s AND t.n = d.n) AS matches_full
    FROM tot t JOIN direct d ON d.cluster_id = t.cluster_id
                            AND d.i = t.i
    GROUP BY t.cluster_id
    ORDER BY t.cluster_id ASC
    """


@register(
    "kmeans_erasure_sim",
    _KMEANS_ERASURE_ORACLE,
    description="RIGHT-TO-ERASURE on the maintained clustering state "
    "— the reason the store holds per-(cluster, dim) SUMS, not means: "
    "erasing a training vector is one NEGATIVE delta (its quantized "
    "coords subtracted under the assignment it got when it arrived — "
    "base fit or trigger as-of), delta-shaped like every erasure in "
    "this repo, never a refit.  The correction trigger is replayed "
    "(crash/retry) and collapses via the batch-id-keyed DISTINCT; the "
    "sandwich column proves the corrected state equals a from-scratch "
    "recompute that never saw the erased vectors (exact BIGINT "
    "equality per cluster x dim).  Erasure cost is |erased| x dims + "
    "k x dims, independent of corpus size",
    tags=("clustering", "streaming", "erasure", "incremental",
          "extension"),
)
def kmeans_erasure_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import (
        assign_clusters,
        centroid_sums,
        kmeans_fit_q,
        quantize_vectors,
        serve_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qv_all = quantize_vectors(emb).localCheckpoint(eager=True)
    base = qv_all.where(F.col("vec_id") % 2 == 0)
    assigned, _ = kmeans_fit_q(base)
    assigned = assigned.localCheckpoint(eager=True)

    def delta(rows: DataFrame, bid: int, negate: bool) -> DataFrame:
        sums = centroid_sums(rows)
        sign = -1 if negate else 1
        return sums.select(
            F.lit(bid).cast("int").alias("batch_id"),
            "cluster_id",
            "i",
            (F.col("s") * sign).cast("long").alias("s"),
            (F.col("n") * sign).cast("long").alias("n"),
        )

    state0 = delta(assigned, 0, False).localCheckpoint(eager=True)
    serve0 = serve_centroids(
        state0.select("cluster_id", "i", "s", "n")
    ).localCheckpoint(eager=True)
    b1 = qv_all.where(F.col("vec_id") % 4 == 1)
    basg1 = assign_clusters(b1, serve0).localCheckpoint(eager=True)
    d1 = delta(basg1, 1, False).localCheckpoint(eager=True)

    erased = F.col("vec_id") % 17 == 5
    doomed = assigned.where(erased).unionByName(basg1.where(erased))

    def make_corr() -> DataFrame:
        return delta(doomed, 2, True)

    partials = (
        state0.unionByName(d1)
        .unionByName(make_corr())
        .unionByName(make_corr())  # replayed correction trigger
    )
    applied = partials.distinct()
    tot = applied.groupBy("cluster_id", "i").agg(
        F.sum("s").cast("long").alias("s"),
        F.sum("n").cast("long").alias("n"),
    )
    direct = centroid_sums(
        assigned.unionByName(basg1).where(~erased)
    ).select("cluster_id", "i", "s", "n")
    return (
        tot.alias("t")
        .join(
            direct.alias("d"),
            (F.col("t.cluster_id") == F.col("d.cluster_id"))
            & (F.col("t.i") == F.col("d.i")),
        )
        .groupBy(F.col("t.cluster_id").alias("cluster_id"))
        .agg(
            F.min(F.col("t.n")).cast("bigint").alias("n_members"),
            # weight by (i+1): Spark dims are 0-based, the oracle's
            # generate_series dims are 1-based — (pos+1) == i
            F.sum(F.col("t.s") * (F.col("t.i") + 1))
            .cast("bigint")
            .alias("state_checksum"),
            F.min(
                (F.col("t.s") == F.col("d.s"))
                & (F.col("t.n") == F.col("d.n"))
            ).alias("matches_full"),
        )
        .orderBy("cluster_id")
    )


@register(
    "kmeans_outlier_report",
    f"""
    WITH {_kmeans_ctes()}
    SELECT vec_id, cluster_id, dist
    FROM asgF
    ORDER BY dist DESC, vec_id ASC
    LIMIT 20
    """,
    description="embedding-space outlier filter: the 20 vectors "
    "farthest (exact BIGINT distance) from their own k-means centroid "
    "— the far-from-every-mode junk a curation pipeline drops or "
    "routes to review before training.  One TakeOrdered head over the "
    "final assignment; reuses the full integer Lloyd chain",
    tags=("clustering", "embedding", "quality", "extension"),
)
def kmeans_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = spark.read.parquet(_ensure_kmeans_store(spark, sf_dir))
    return (
        assigned.select("vec_id", "cluster_id", "dist")
        .orderBy(F.desc("dist"), F.asc("vec_id"))
        .limit(20)
    )


_STREAM_REFRESH_ORACLE = f"""
    WITH {_kmeans_ctes(base_filter="vec_id % 2 = 0")},
    {_sql_asg("asgAll", f"cent{N_ITER}", "qv_all")},
    stot AS MATERIALIZED (
      SELECT cluster_id, i, CAST(SUM(x) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT cluster_id,
                   unnest(generate_series(1, len(q))) AS i,
                   unnest(q) AS x
            FROM asgAll)
      GROUP BY cluster_id, i
    ),
    refr AS MATERIALIZED (
      SELECT cluster_id, CAST(MIN(n) AS BIGINT) AS n_members,
             list(cx ORDER BY i) AS rc
      FROM (SELECT cluster_id, i, n,
                   CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT) AS cx
            FROM stot)
      GROUP BY cluster_id
    )
    SELECT r.cluster_id, r.n_members,
           CAST(list_sum(list_transform(generate_series(1, len(r.rc)),
             j -> CAST(j AS BIGINT) * r.rc[j])) AS BIGINT)
             AS refreshed_checksum,
           CAST(list_sum(list_transform(generate_series(1, len(r.rc)),
             j -> ABS(r.rc[j] - f.c[j]))) AS BIGINT) AS drift_l1
    FROM refr r JOIN cent{N_ITER} f USING (cluster_id)
    ORDER BY r.cluster_id ASC
    """


@register(
    "stream_kmeans_refresh",
    _STREAM_REFRESH_ORACLE,
    description="REAL Structured Streaming centroid refresh "
    "(streaming/cluster_ingest.py): a scheduled fit FREEZES a "
    "centroid generation (fit on the even half), then the FULL corpus "
    "streams through 4 deterministic files (maxFilesPerTrigger=1, "
    "availableNow) into a foreachBatch sink that assigns each "
    "micro-batch against the frozen generation and lands mergeable "
    "per-(cluster, dim) SUM+COUNT deltas under its batch_id partition "
    "(dynamic overwrite); the WHOLE stream then re-processes from a "
    "fresh checkpoint — convergence is trigger-order-independent "
    "BECAUSE the generation is frozen (the reason production splits "
    "the fit and refresh time scales).  Serving floor-means the "
    "merged sums into the refreshed centroids and reports each "
    "cluster's L1 drift — the refit-trigger signal.  The oracle is "
    "one batch assignment of the whole corpus against the same "
    "deterministic fit",
    tags=("clustering", "streaming", "incremental", "extension"),
)
def stream_kmeans_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.cluster_ingest import (
        build_cluster_fit_store,
        cluster_sums_sink,
        read_refreshed_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="stream_kmeans_")
    src = f"{tmp}/src"
    (
        emb.withColumn("grp", F.col("vec_id") % 4)
        .coalesce(1)
        .write.partitionBy("grp")
        .mode("overwrite")
        .parquet(src)
    )
    store = f"{tmp}/store"
    build_cluster_fit_store(
        spark, emb.where(F.col("vec_id") % 2 == 0), store
    )
    sink = cluster_sums_sink(store)
    for run in (1, 2):  # run 2 = full reprocess from a fresh checkpoint
        q = (
            spark.readStream.schema(
                "vec_id long, embedding array<float>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{tmp}/ckpt{run}")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 300)
    return read_refreshed_centroids(spark, store)


_CURATION_N = 100
_OUTLIER_K = 20

_CLUSTER_CURATION_ORACLE = f"""
    WITH {_kmeans_ctes()},
    outl AS MATERIALIZED (
      SELECT vec_id FROM asgF
      ORDER BY dist DESC, vec_id ASC LIMIT {_OUTLIER_K}
    ),
    kept AS MATERIALIZED (
      SELECT a.vec_id, a.cluster_id FROM asgF a
      WHERE NOT EXISTS (SELECT 1 FROM outl o WHERE o.vec_id = a.vec_id)
    ),
    csz AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM kept GROUP BY cluster_id
    ),
    ctot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM csz),
    quotas AS (
      SELECT c.cluster_id, c.n,
             CAST(FLOOR(c.n * {_CURATION_N}.0 / t.tot) AS BIGINT)
               AS quota
      FROM csz c CROSS JOIN ctot t
    ),
    picked AS (
      SELECT d.doc_id, k.cluster_id, q.quota, d.source, d.lang,
             ROW_NUMBER() OVER (PARTITION BY k.cluster_id
               ORDER BY d.doc_id ASC) AS rn
      FROM kept k
      JOIN documents d ON d.doc_id = k.vec_id
      JOIN quotas q ON q.cluster_id = k.cluster_id
    )
    SELECT doc_id, cluster_id, quota, source, lang
    FROM picked WHERE rn <= quota
    ORDER BY cluster_id ASC, doc_id ASC
    """


@register(
    "cluster_quota_curation",
    _CLUSTER_CURATION_ORACLE,
    description="unsupervised-curation composition (the no-labels "
    "twin of curation_v2_pipeline's authority quotas): k-means "
    f"clusters the embedding space, the {_OUTLIER_K} "
    "farthest-from-centroid vectors are excluded (the junk gate), and "
    f"each cluster contributes floor(size * {_CURATION_N} / total) "
    "docs to the sample — mode-proportional coverage of the corpus — "
    "filled deterministically with the cluster's lowest doc_ids and "
    "joined back to documents for the source/lang mix readout.  "
    "Everything rides the integer Lloyd chain: one extra anti-join "
    "(outliers), two cluster-sized aggregates, one broadcast quota "
    "join",
    tags=("clustering", "curation", "sampling", "extension"),
)
def cluster_quota_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    assigned = spark.read.parquet(_ensure_kmeans_store(spark, sf_dir))
    outl = (
        assigned.orderBy(F.desc("dist"), F.asc("vec_id"))
        .limit(_OUTLIER_K)
        .select("vec_id")
    )
    kept = assigned.select("vec_id", "cluster_id").join(
        outl, "vec_id", "left_anti"
    )
    csz = kept.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ctot = csz.agg(F.sum("n").cast("bigint").alias("tot"))
    quotas = csz.crossJoin(F.broadcast(ctot)).select(
        "cluster_id",
        F.floor(
            F.col("n") * F.lit(float(_CURATION_N)) / F.col("tot")
        )
        .cast("long")
        .alias("quota"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
    return (
        kept.join(
            docs, kept["vec_id"] == docs["doc_id"]
        )
        .join(quotas, "cluster_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "cluster_id", "quota", "source", "lang")
        .orderBy("cluster_id", "doc_id")
    )


def _ff_seed_ctes(k: int = K_CLUSTERS) -> str:
    """Farthest-first seeding chain over ``qv`` (deterministic
    k-means++ analogue): seed 1 = md5-minimal vector, each next seed
    = argmax of min-distance-to-chosen (ties to smaller vec_id).
    Ends at ffseeds{k-1}."""
    blocks = ["""
    ffseeds0 AS MATERIALIZED (
      SELECT CAST(0 AS BIGINT) AS cluster_id, q AS c
      FROM (SELECT vec_id, q FROM qv
            ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
            LIMIT 1)
    )"""]
    for t in range(1, k):
        blocks.append(f"""
    ffmind{t} AS MATERIALIZED (
      SELECT v.vec_id, v.q,
             MIN(CAST(list_sum(list_transform(
               generate_series(1, len(v.q)),
               j -> (v.q[j] - s.c[j]) * (v.q[j] - s.c[j])))
               AS BIGINT)) AS mind
      FROM qv v CROSS JOIN ffseeds{t - 1} s
      GROUP BY v.vec_id, v.q
    ),
    ffseeds{t} AS MATERIALIZED (
      SELECT * FROM ffseeds{t - 1}
      UNION ALL
      SELECT CAST({t} AS BIGINT) AS cluster_id, q AS c FROM (
        SELECT q FROM ffmind{t}
        ORDER BY mind DESC, vec_id ASC LIMIT 1)
    )""")
    return ",".join(blocks)


_SEED_QUALITY_ORACLE = f"""
    WITH {_kmeans_ctes()},
    {_ff_seed_ctes()},
    {",".join(_lloyd_blocks("ff", f"ffseeds{K_CLUSTERS - 1}"))},
    md5i AS (
      SELECT CAST(SUM(dist) AS BIGINT) AS inertia,
             CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM asgF
    ),
    ffi AS (
      SELECT CAST(SUM(dist) AS BIGINT) AS inertia,
             CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM ffasgF
    )
    SELECT 'farthest_first' AS strategy, inertia, n_clusters FROM ffi
    UNION ALL
    SELECT 'md5_hash' AS strategy, inertia, n_clusters FROM md5i
    ORDER BY strategy ASC
    """


@register(
    "kmeans_seed_quality_report",
    _SEED_QUALITY_ORACLE,
    description="MEASURED seeding quality: the same integer Lloyd "
    "rounds run from two deterministic initializations — md5-hash "
    "seeds (cheap, one pass) vs FARTHEST-FIRST traversal (the "
    "deterministic k-means++ analogue: each next seed is the corpus "
    "vector farthest from its nearest chosen seed — the 2x-OPT "
    "coverage construction, k broadcast passes, no RNG) — and the "
    "final exact inertia + surviving-cluster count decide which "
    "clustering the curation queries should consume.  The report that "
    "justifies (or retires) a seeding strategy with numbers instead "
    "of folklore",
    tags=("clustering", "embedding", "evaluation", "iterative",
          "extension"),
)
def kmeans_seed_quality_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.clustering import (
        farthest_first_seeds,
        kmeans_fit_q,
        quantize_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qv = quantize_vectors(emb).localCheckpoint(eager=True)

    def fit_stats(init, strategy: str) -> DataFrame:
        assigned, _ = kmeans_fit_q(qv, init=init)
        return assigned.agg(
            F.sum("dist").cast("bigint").alias("inertia"),
            F.countDistinct("cluster_id").cast("bigint").alias(
                "n_clusters"
            ),
        ).select(F.lit(strategy).alias("strategy"), "inertia", "n_clusters")

    ff = fit_stats(farthest_first_seeds(qv), "farthest_first")
    md5 = fit_stats(None, "md5_hash")
    return ff.unionByName(md5).orderBy("strategy")


_REFIT_ROUNDS = 2

_KMEANS_REFIT_ORACLE = f"""
    WITH {_kmeans_ctes(base_filter="vec_id % 2 = 0")},
    {_sql_asg("asgAll", f"cent{N_ITER}", "qv_all")},
    refreshedc AS MATERIALIZED (
      SELECT cluster_id, list(cx ORDER BY i) AS c FROM (
        SELECT cluster_id, i,
               CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*))
                    AS BIGINT) AS cx
        FROM (SELECT cluster_id,
                     unnest(generate_series(1, len(q))) AS i,
                     unnest(q) AS x
              FROM asgAll)
        GROUP BY cluster_id, i)
      GROUP BY cluster_id
    ),
    {",".join(_lloyd_blocks("rf", "refreshedc", _REFIT_ROUNDS,
                            src="qv_all"))},
    stale AS (
      SELECT CAST(SUM(dist) AS BIGINT) AS inertia,
             CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM asgAll
    ),
    fresh AS (
      SELECT CAST(SUM(dist) AS BIGINT) AS inertia,
             CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM rfasgF
    )
    SELECT 'frozen_serving' AS stage, inertia, n_clusters FROM stale
    UNION ALL
    SELECT 'post_refit' AS stage, inertia, n_clusters FROM fresh
    ORDER BY stage ASC
    """


@register(
    "kmeans_refit_sim",
    _KMEANS_REFIT_ORACLE,
    description="the clustering family's DRIFT -> REFIT loop closed "
    "(mirroring refit_index for the ANN quantizer): the model fits on "
    "the even half (the frozen generation a stream serves), the full "
    "corpus assigns against it (the stale serving state whose L1 "
    "drift stream_kmeans_refresh reports), and the scheduled refit "
    f"warm-starts {_REFIT_ROUNDS} Lloyd rounds FROM the refreshed "
    "floor-mean centroids instead of re-seeding — the exact inertia "
    "before/after quantifies what the refit bought.  Warm-starting "
    "from maintained state is the production answer to 'refit without "
    "k fresh seeding passes'",
    tags=("clustering", "incremental", "iterative", "evaluation",
          "extension"),
)
def kmeans_refit_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import (
        assign_clusters,
        centroid_sums,
        kmeans_fit_q,
        quantize_vectors,
        serve_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qv_all = quantize_vectors(emb).localCheckpoint(eager=True)
    _, frozen = kmeans_fit_q(qv_all.where(F.col("vec_id") % 2 == 0))
    stale_asg = assign_clusters(qv_all, frozen).localCheckpoint(
        eager=True
    )
    refreshed = serve_centroids(
        centroid_sums(stale_asg)
    ).localCheckpoint(eager=True)
    refit_asg, _ = kmeans_fit_q(
        qv_all, n_iter=_REFIT_ROUNDS, init=refreshed
    )

    def stats(asg: DataFrame, stage: str) -> DataFrame:
        return asg.agg(
            F.sum("dist").cast("bigint").alias("inertia"),
            F.countDistinct("cluster_id").cast("bigint").alias(
                "n_clusters"
            ),
        ).select(F.lit(stage).alias("stage"), "inertia", "n_clusters")

    return (
        stats(stale_asg, "frozen_serving")
        .unionByName(stats(refit_asg, "post_refit"))
        .orderBy("stage")
    )
