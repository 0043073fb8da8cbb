"""Composed training-data pipeline queries — the end-to-end use case
the extension operators exist for: clean a raw corpus (quality gate →
language gate → exact dedup → MinHash-LSH near-dup removal) and cluster
duplicates.

``dup_clusters`` pairs Spark's iterative min-label propagation with a
DuckDB *recursive CTE* oracle — the iterative-algorithm class done both
ways and hash-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_tokens
from ..operators.dedup import lsh_candidate_pairs, minhash_signatures
from ..operators.text_analysis import quality_profile
from ..sources.tables import load_table
from .dedup_queries import _BANDS_SQL, _SIG_CTES
from .registry import register

MIN_TOKENS = 20
MIN_QUALITY = 0.45
KEEP_LANGS = ("en", "es", "fr")


@register(
    "corpus_clean_pipeline",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    near_dup_losers AS (
      SELECT DISTINCT b.doc_id AS doc_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    quality AS (
      SELECT doc_id, lang,
             len({sql_tokens('text')}) AS n_tokens,
             md5(text) AS content_md5
      FROM documents
      WHERE len({sql_tokens('text')}) >= {MIN_TOKENS}
        AND lang IN {KEEP_LANGS!r}
    ),
    exact_canonical AS (
      SELECT content_md5, MIN(doc_id) AS doc_id
      FROM quality GROUP BY content_md5
    )
    SELECT q.doc_id, q.lang, q.n_tokens
    FROM quality q
    JOIN exact_canonical ec ON ec.doc_id = q.doc_id
    WHERE q.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
    """,
    description="end-to-end corpus cleaning: token-count + language gate "
    "-> exact-dedup canonicals -> MinHash-LSH near-dup removal (keep "
    "smaller id). The composition every training-data pipeline runs.",
    tags=("pipeline", "dedup", "text", "extension"),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prof = quality_profile(docs).select("doc_id", "n_tokens")
    quality = (
        docs.join(prof, "doc_id")
        .where(
            (F.col("n_tokens") >= MIN_TOKENS)
            & F.col("lang").isin(*KEEP_LANGS)
        )
        .select(
            "doc_id", "lang", "n_tokens", F.md5("text").alias("content_md5")
        )
    )
    canonical = quality.groupBy("content_md5").agg(
        F.min("doc_id").alias("doc_id")
    )
    losers = (
        lsh_candidate_pairs(minhash_signatures(docs.select("doc_id", "text")))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.join(canonical.select("doc_id"), "doc_id", "left_semi")
        .join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens")
    )


# Shared SQL: LSH edge graph -> recursive transitive closure ->
# min-reachable-id cluster labels (docs with no near-dup edge are
# absent; callers COALESCE to the doc's own id).
_CLUSTER_CTES = f"""{_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    bidir AS (
      SELECT src, dst FROM edges
      UNION SELECT dst AS src, src AS dst FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM bidir),
    reach AS (
      SELECT doc_id, doc_id AS r FROM nodes
      UNION
      SELECT b.dst AS doc_id, reach.r
      FROM reach JOIN bidir b ON b.src = reach.doc_id
    ),
    clusters AS (
      SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
    )"""


@register(
    "dup_clusters",
    f"""
    WITH RECURSIVE {_CLUSTER_CTES}
    SELECT doc_id, cluster_id FROM clusters
    """,
    description="near-duplicate clusters: connected components over the "
    "LSH candidate graph — Spark iterative min-label propagation vs a "
    "DuckDB recursive-CTE transitive closure, hash-compared",
    tags=("pipeline", "dedup", "iterative", "extension"),
)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edges = lsh_candidate_pairs(minhash_signatures(docs))
    bidir = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # The edge relation is |near-dup pairs|-bounded (tiny next to the
    # corpus) but its LINEAGE is the whole minhash/LSH derivation —
    # without this checkpoint every propagation round re-tokenized,
    # re-minhashed and re-banded the full corpus once per consuming
    # branch (neighbor_min + the changed-probe + the round's own
    # checkpoint: ~3 full LSH passes per round, measured 12.8 s at
    # sf0.1).  Deriving the edges exactly once is the 100 TB posture
    # too: each avoided recompute is a corpus-sized scan (guide §1.2
    # step 1 / §5 caching-when-reused).
    bidir = bidir.localCheckpoint(eager=True)
    labels = (
        bidir.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    # min-label propagation to fixpoint with POINTER JUMPING: each
    # round first takes the min over direct neighbors, then replaces
    # every label by the label OF its current label (path halving) —
    # convergence in O(log diameter) rounds instead of O(diameter), so
    # a chain-shaped cluster of any realistic size converges well
    # inside the bound.  Non-convergence RAISES: callers
    # (leakage_safe_splits) build a no-straddle guarantee on these
    # labels, and a silently-unconverged result would leak near-dups
    # across the train/test boundary.
    max_rounds = 25  # 2^25 ≈ 3e7-hop diameter, beyond any real corpus
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            bidir.join(
                labels.withColumnRenamed("doc_id", "src"), "src"
            )
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        stepped = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
        )
        # path halving: label <- label(label)
        parent = stepped.select(
            F.col("doc_id").alias("p_id"),
            F.col("cluster_id").alias("p_label"),
        )
        updated = (
            stepped.join(
                parent, stepped["cluster_id"] == parent["p_id"], "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("p_label", "cluster_id"),
                ).alias("cluster_id"),
            )
        )
        # checkpoint FIRST, probe the checkpointed result: the old
        # order ran the round's whole join tree twice (once for the
        # changed-probe, once to materialize the checkpoint)
        new_labels = updated.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("u")
            .join(labels.alias("l"), "doc_id")
            .where(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dup_clusters: min-label propagation did not converge in "
            f"{max_rounds} pointer-jumping rounds — refusing to return "
            f"possibly-split clusters (downstream leakage_safe_splits "
            f"depends on complete components)"
        )
    return labels.select("doc_id", "cluster_id")


@register(
    "leakage_safe_splits",
    f"""
    WITH RECURSIVE {_CLUSTER_CTES}
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id)
                                     AS VARCHAR)), 1, 2) < '20'
                THEN 'test'
                WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id)
                                     AS VARCHAR)), 1, 2) < '40'
                THEN 'val'
                ELSE 'train' END AS split
    FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    """,
    description="leakage-safe train/val/test split: documents are "
    "assigned by md5 gate on their NEAR-DUP CLUSTER id (singleton docs "
    "use their own id), so near-duplicates can never straddle the "
    "train/test boundary — the contamination guard every training "
    "corpus needs; ~12.5% test / ~12.5% val / ~75% train, "
    "deterministic across engines/runs/partitionings",
    tags=("pipeline", "dedup", "sampling", "extension"),
)
def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = dup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    gate = F.substring(F.md5(cluster.cast("string")), 1, 2)
    split = (
        F.when(gate < "20", "test").when(gate < "40", "val").otherwise("train")
    )
    return (
        docs.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            split.alias("split"),
        )
    )


@register(
    "neardup_graph_triangles",
    f"""
    WITH RECURSIVE {_CLUSTER_CTES}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
    description="triangle count on the near-dup candidate graph "
    "(graph-analytics shape): edges stored once with src < dst, so "
    "each triangle is counted exactly once by the ordered 3-way "
    "equi-join — partial-agg count, shuffles keyed on node ids; a "
    "high triangle density signals dup CLUSTERS rather than chains, "
    "which changes the dedup keep-policy",
    tags=("pipeline", "graph", "extension"),
)
def neardup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # materialize the candidate edges once: the shingle/minhash/band
    # lineage is the costliest subtree here, and the 3-way self-join
    # would otherwise re-execute it per alias (ReuseExchange is only
    # opportunistic) — same localCheckpoint pattern as dup_clusters
    edges = (
        lsh_candidate_pairs(minhash_signatures(docs))
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    return (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


@register(
    "cluster_canonical_best_quality",
    f"""
    WITH RECURSIVE {_CLUSTER_CTES},
    membership AS (
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             len({sql_tokens('d.text')}) AS n_tokens
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT cluster_id, doc_id AS canonical_doc_id, n_tokens FROM (
      SELECT cluster_id, doc_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_tokens DESC, doc_id ASC) AS rn
      FROM membership
    ) WHERE rn = 1
    """,
    description="policy-driven dedup: per near-dup cluster keep the "
    "HIGHEST-QUALITY member (longest token count, id tiebreak) instead "
    "of the naive smallest-id — the keep-policy real corpora want "
    "(composition: recursive cluster closure + per-cluster argmax "
    "window)",
    tags=("pipeline", "dedup", "quality", "extension"),
)
def cluster_canonical_best_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import tokens as _tokens

    labels = dup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_tokens(F.col("text"))).cast("bigint").alias(
            "n_tokens"
        )
    )
    membership = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "n_tokens",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return (
        membership.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            "n_tokens",
        )
    )


_EXPORT_PACK_BUDGET = 512.0


@register(
    "training_export_pipeline",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    near_dup_losers AS (
      SELECT DISTINCT b.doc_id AS doc_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    quality AS (
      SELECT doc_id, lang,
             CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens,
             md5(text) AS content_md5
      FROM documents
      WHERE len({sql_tokens('text')}) >= {MIN_TOKENS}
        AND lang IN {KEEP_LANGS!r}
    ),
    exact_canonical AS (
      SELECT content_md5, MIN(doc_id) AS doc_id
      FROM quality GROUP BY content_md5
    ),
    clean AS (
      SELECT q.doc_id, q.lang, q.n_tokens
      FROM quality q
      JOIN exact_canonical ec ON ec.doc_id = q.doc_id
      WHERE q.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
    ),
    ex_toked AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    ex_shingled AS (
      SELECT DISTINCT doc_id, unnest(
        list_transform(
          generate_series(1, len(toks) - 2),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ) AS shingle
      FROM ex_toked
    ),
    ex_bench AS (SELECT DISTINCT shingle FROM ex_shingled WHERE doc_id < 10),
    contaminated AS (
      SELECT c.doc_id
      FROM (SELECT doc_id, shingle FROM ex_shingled WHERE doc_id >= 10) c
      LEFT JOIN ex_bench b ON b.shingle = c.shingle
      GROUP BY c.doc_id
      HAVING (CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) >= 0.5
    ),
    mixed AS (
      SELECT cl.doc_id, cl.lang, cl.n_tokens FROM clean cl
      WHERE cl.doc_id >= 10
        AND cl.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND substr(md5(CAST(cl.doc_id AS VARCHAR)), 1, 2) <
            (CASE cl.lang WHEN 'en' THEN '40'
                          WHEN 'zh' THEN 'g'
                          ELSE 'cc' END)
    ),
    ordered AS (
      SELECT doc_id, lang, n_tokens,
             md5('shuf:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM mixed
    )
    SELECT doc_id, lang, n_tokens,
           CAST(ROW_NUMBER() OVER
             (ORDER BY shuffle_key ASC, doc_id ASC) AS BIGINT)
             AS global_pos,
           CAST(SUM(n_tokens) OVER
             (ORDER BY shuffle_key ASC, doc_id ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           CAST(FLOOR(CAST(SUM(n_tokens) OVER
             (ORDER BY shuffle_key ASC, doc_id ASC
              ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE)
             / {_EXPORT_PACK_BUDGET!r}) AS BIGINT) AS pack_id
    FROM ordered
    """,
    description="the full training-data export, end to end: quality + "
    "language gates -> exact-dedup canonicals -> MinHash-LSH near-dup "
    "removal -> benchmark decontamination (docs 0-9 as the held-out "
    "eval set, 3-gram overlap >= 0.5 dropped) -> deterministic "
    "domain-mix re-weighting -> reproducible global shuffle order -> "
    "512-token sequence packing with global cumulative token counts. "
    "Every stage is the registered operator it reuses; the global "
    "order/cumsum use the bucket-prefix two-level trick (parallel "
    "per-bucket windows + a 256-row offset fold), never a "
    "single-partition window — the whole pipeline is the scale shape "
    "a 100 TB exporter runs nightly, hash-checked end-to-end",
    tags=("pipeline", "curation", "export", "extension"),
)
def training_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality + language gates, exact canonicals, LSH losers
    prof = quality_profile(docs).select("doc_id", "n_tokens")
    quality = (
        docs.join(prof, "doc_id")
        .where(
            (F.col("n_tokens") >= MIN_TOKENS)
            & F.col("lang").isin(*KEEP_LANGS)
        )
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.md5("text").alias("content_md5"),
        )
    )
    canonical = quality.groupBy("content_md5").agg(
        F.min("doc_id").alias("doc_id")
    )
    losers = (
        lsh_candidate_pairs(
            minhash_signatures(docs.select("doc_id", "text"))
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    clean = quality.join(
        canonical.select("doc_id"), "doc_id", "left_semi"
    ).join(losers, "doc_id", "left_anti")

    # 2. benchmark decontamination (bench = docs 0-9, broadcast)
    ex_shingled = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(shingles(F.col("toks"))).alias("shingle"))
        .distinct()
    )
    bench = (
        ex_shingled.where(F.col("doc_id") < 10).select("shingle").distinct()
    )
    corpus_sh = ex_shingled.where(F.col("doc_id") >= 10)
    contaminated = (
        corpus_sh.join(
            F.broadcast(bench.withColumn("hit", F.lit(1))),
            "shingle",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("overlap")
        )
        .where(F.col("overlap") >= 0.5)
        .select("doc_id")
    )

    # 3. domain-mix gate (md5-prefix keep rates)
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    threshold = (
        F.when(F.col("lang") == "en", "40")
        .when(F.col("lang") == "zh", "g")
        .otherwise("cc")
    )
    mixed = (
        clean.where(F.col("doc_id") >= 10)
        .join(contaminated, "doc_id", "left_anti")
        .where(gate < threshold)
        .select("doc_id", "lang", "n_tokens")
    )

    # 4. global shuffle order + cumulative tokens, bucket-prefix style
    sk = F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    keyed = mixed.withColumn("shuffle_key", sk).withColumn(
        "bucket", F.substring("shuffle_key", 1, 2)
    )
    wb = Window.partitionBy("bucket").orderBy(
        F.asc("shuffle_key"), F.asc("doc_id")
    )
    ranked = keyed.withColumn("rn", F.row_number().over(wb)).withColumn(
        "cum_local", F.sum("n_tokens").over(wb)
    )
    per_bucket = keyed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c"), F.sum("n_tokens").alias("t")
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("row_off"),
        F.coalesce(F.sum("t").over(wcum), F.lit(0)).alias("tok_off"),
    )
    cum_tokens = (F.col("tok_off") + F.col("cum_local")).cast("bigint")
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("row_off") + F.col("rn")).cast("bigint").alias(
                "global_pos"
            ),
            cum_tokens.alias("cum_tokens"),
            F.floor(
                (cum_tokens - F.col("n_tokens")).cast("double")
                / F.lit(_EXPORT_PACK_BUDGET)
            )
            .cast("bigint")
            .alias("pack_id"),
        )
    )


@register(
    "incremental_dedup_sim",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    rej0 AS (
      SELECT DISTINCT a.doc_id FROM b0 a JOIN b0 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id > b.doc_id
    ),
    acc0 AS (
      SELECT DISTINCT doc_id FROM b0
      WHERE doc_id NOT IN (SELECT doc_id FROM rej0)
    ),
    store AS (
      SELECT DISTINCT band, bh FROM bands
      WHERE doc_id IN (SELECT doc_id FROM acc0)
    ),
    rej1 AS (
      SELECT DISTINCT a.doc_id FROM b1 a JOIN store s
        ON a.band = s.band AND a.bh = s.bh
      UNION
      SELECT DISTINCT a.doc_id FROM b1 a JOIN b1 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id > b.doc_id
    ),
    acc1 AS (
      SELECT DISTINCT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS batch_id FROM acc0
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER) AS batch_id FROM acc1
    """,
    description="incremental corpus dedup simulated as a batch plan: "
    "the corpus splits by doc_id parity into two successive ingest "
    "'micro-batches'; batch 0 admits docs with no LSH band match to a "
    "lower-id batch-0 doc, its accepted bands become the signature "
    "store, and batch 1 admits docs matching neither the store nor a "
    "lower-id batch-1 doc — exactly the semantics of "
    "streaming/corpus_dedup.py's foreachBatch sink (same band-join "
    "code path), hash-checkable because the batch split is "
    "deterministic.  This gives the incremental-dedup operator "
    "oracle-grade evidence beyond its streaming pytest",
    tags=("pipeline", "dedup", "streaming", "extension"),
)
def incremental_dedup_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.corpus_dedup import (
        batch_bands,
        dedup_batch_against_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1)
    empty_store = spark.createDataFrame([], "doc_id long, band int, bh string")
    acc0 = dedup_batch_against_store(b0, empty_store)
    store = batch_bands(acc0)
    acc1 = dedup_batch_against_store(b1, store)
    return acc0.select(
        "doc_id", F.lit(0).cast("int").alias("batch_id")
    ).unionByName(
        acc1.select("doc_id", F.lit(1).cast("int").alias("batch_id"))
    )


_VERIFY_TAU = 0.3


def _jac_reject_sql(cand_cte: str) -> str:
    """SQL fragment: doc_b ids of candidate pairs whose exact shingle
    Jaccard clears the verification threshold."""
    return f"""
      SELECT DISTINCT i.doc_b AS doc_id FROM (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM {cand_cte} c
        JOIN shingled a ON a.doc_id = c.doc_a
        JOIN shingled b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
      ) i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE (CAST(i.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - i.n_common AS DOUBLE)) >= {_VERIFY_TAU}
    """


@register(
    "incremental_dedup_verified_sim",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id),
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    cand0 AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM b0 a JOIN b0 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    rej0 AS ({_jac_reject_sql("cand0")}),
    acc0 AS (
      SELECT DISTINCT doc_id FROM b0
      WHERE doc_id NOT IN (SELECT doc_id FROM rej0)
    ),
    storeb AS (
      SELECT doc_id, band, bh FROM bands
      WHERE doc_id IN (SELECT doc_id FROM acc0)
    ),
    cand1 AS (
      SELECT DISTINCT s.doc_id AS doc_a, a.doc_id AS doc_b
      FROM b1 a JOIN storeb s ON a.band = s.band AND a.bh = s.bh
      UNION
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM b1 a JOIN b1 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    rej1 AS ({_jac_reject_sql("cand1")}),
    acc1 AS (
      SELECT DISTINCT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS batch_id FROM acc0
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER) AS batch_id FROM acc1
    """,
    description="incremental corpus dedup, VERIFIED mode, as a batch "
    "plan: same two-'micro-batch' parity split as incremental_dedup_sim "
    "but a band candidate only rejects a doc if the exact shingle "
    "Jaccard of the pair clears 0.3 — the LSH-then-verify composition "
    "on the streaming-ingest seam (streaming/corpus_dedup.py:"
    "dedup_batch_verified, same code path), with verification "
    "shingling semi-joined down to candidate docs so per-batch cost "
    "stays candidate-bounded at any store size",
    tags=("pipeline", "dedup", "streaming", "extension"),
)
def incremental_dedup_verified_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.corpus_dedup import batch_bands, dedup_batch_verified

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1)
    empty_store = spark.createDataFrame(
        [], "doc_id long, band int, bh string"
    )
    # acc0 feeds acc1 THREE times (its bands become the store, its
    # text is the verification corpus, and it unions into the output);
    # materialize it once (dup_clusters/neardup_graph_triangles
    # localCheckpoint pattern) instead of re-running the full
    # LSH+verify subtree per reference — the un-checkpointed plan
    # OOMed the round-5 bench at sf0.1
    acc0 = dedup_batch_verified(
        b0, empty_store, None, _VERIFY_TAU
    ).localCheckpoint(eager=True)
    store = batch_bands(acc0)
    acc1 = dedup_batch_verified(b1, store, acc0, _VERIFY_TAU)
    return acc0.select(
        "doc_id", F.lit(0).cast("int").alias("batch_id")
    ).unionByName(
        acc1.select("doc_id", F.lit(1).cast("int").alias("batch_id"))
    )


def _curated_ingest_oracle(surviving_pred: str = "TRUE") -> str:
    """DuckDB replay of the staged ingest: the incremental-dedup
    parity-split admits acc0/acc1 (identical CTE chain to
    incremental_dedup_sim), then the merge-on-read BM25 probe runs
    over ONLY the accepted docs — the composed pipeline's visible
    output.  ``surviving_pred`` restricts the accepted set (the
    erasure sim probes AFTER right-to-erasure, so the replay scores
    only survivors)."""
    from ..functions.core import sql_dsum
    from ..functions.hashing import sql_tokens
    from ..operators.text_index import sql_bm25_score_expr
    from .text_queries import _BM25_TERMS

    terms_sql = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
    return f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    rej0 AS (
      SELECT DISTINCT a.doc_id FROM b0 a JOIN b0 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id > b.doc_id
    ),
    acc0 AS (
      SELECT DISTINCT doc_id FROM b0
      WHERE doc_id NOT IN (SELECT doc_id FROM rej0)
    ),
    store AS (
      SELECT DISTINCT band, bh FROM bands
      WHERE doc_id IN (SELECT doc_id FROM acc0)
    ),
    rej1 AS (
      SELECT DISTINCT a.doc_id FROM b1 a JOIN store s
        ON a.band = s.band AND a.bh = s.bh
      UNION
      SELECT DISTINCT a.doc_id FROM b1 a JOIN b1 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id > b.doc_id
    ),
    acc1 AS (
      SELECT DISTINCT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
    ),
    accepted AS (
      SELECT doc_id FROM (
        SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1
      ) WHERE {surviving_pred}
    ),
    occ AS (
      SELECT dd.doc_id, unnest({sql_tokens('dd.text')}) AS tok
      FROM documents dd JOIN accepted ac ON ac.doc_id = dd.doc_id
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM occ GROUP BY 1, 2
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM occ GROUP BY 1
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY 1
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM accepted) AS n_docs,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_len
    ),
    scored AS (
      SELECT t.doc_id, t.tok, {sql_bm25_score_expr()} AS sc
      FROM tf t
      JOIN vocab d ON d.tok = t.tok
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.tok IN {terms_sql}
    )
    SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_terms_matched,
           {sql_dsum('sc')} AS bm25_score
    FROM scored GROUP BY doc_id
    ORDER BY bm25_score DESC, doc_id ASC
    LIMIT 10
    """


@register(
    "curated_ingest_pipeline",
    _curated_ingest_oracle(),
    description="the composed training-data ingest stage end to end: "
    "two parity-split micro-batches flow through the STAGED fan-out "
    "(streaming/curated_ingest.py — incremental dedup admits, then "
    "the text-index sink indexes exactly the admitted partition, all "
    "batch-id-keyed and replay-convergent), and the merge-on-read "
    "BM25 probe over the resulting index is the hash-checked output.  "
    "One oracle replays the whole composition: dedup parity split -> "
    "accepted set -> BM25 over accepted docs only.  This is the "
    "reference's coordinated-fan-out seam (pipeline/app.py:55-109) "
    "upgraded to STAGED sinks with curation semantics",
    tags=("pipeline", "dedup", "search", "streaming", "extension"),
)
def curated_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.text_index import bm25_topk_merged
    from ..streaming.curated_ingest import curated_ingest_sink
    from .text_queries import _BM25_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="curated_ingest_")
    sink = curated_ingest_sink(
        f"{tmp}/store", f"{tmp}/out", f"{tmp}/index"
    )
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    return bm25_topk_merged(
        spark, f"{tmp}/index", list(_BM25_TERMS), 10
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
_RRF_DEPTH = 20  # candidates taken from each ranker


def _hybrid_fused_sql() -> str:
    """The shared fused-candidates CTE chain: BM25 top-20 rank +
    exact-cosine top-20 rank (vec i is doc i's embedding) fused by
    1/(k+rank) sums — everything up to and including ``fused``.
    Reused by hybrid_search_rrf and the RAG context assembly."""
    from ..functions.core import sql_dsum
    from ..functions.hashing import sql_tokens as _sqlt
    from ..functions.vectors import QV
    from ..operators.text_index import sql_bm25_score_expr
    from .text_queries import _BM25_TERMS

    terms_sql = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
    return f"""
    WITH occ AS (
      SELECT doc_id, unnest({_sqlt('text')}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM occ GROUP BY 1, 2
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM occ GROUP BY 1
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY 1
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_len
    ),
    bscored AS (
      SELECT t.doc_id, t.tok, {sql_bm25_score_expr()} AS sc
      FROM tf t
      JOIN vocab d ON d.tok = t.tok
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.tok IN {terms_sql}
    ),
    bdocs AS (
      SELECT doc_id, {sql_dsum('sc')} AS bm25
      FROM bscored GROUP BY doc_id
    ),
    brank AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                  AS INTEGER) AS rank_text
      FROM bdocs
      ORDER BY bm25 DESC, doc_id ASC LIMIT {_RRF_DEPTH}
    ),
    flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flat GROUP BY vec_id
    ),
    sums AS (
      SELECT cf.vec_id,
             CAST(SUM(CAST(FLOOR(cf.x * qf.x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS dot
      FROM flat cf
      JOIN (SELECT i, x FROM flat WHERE vec_id = 0) qf ON cf.i = qf.i
      WHERE cf.vec_id <> 0
      GROUP BY cf.vec_id
    ),
    vrank AS (
      SELECT s.vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) DESC,
                        s.vec_id ASC) AS INTEGER) AS rank_vec
      FROM sums s
      JOIN norms na ON na.vec_id = s.vec_id
      JOIN norms nq ON nq.vec_id = 0
      ORDER BY (s.dot / (sqrt(na.n2) * sqrt(nq.n2))) DESC, s.vec_id ASC
      LIMIT {_RRF_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
             b.rank_text, v.rank_vec,
             (COALESCE(CAST(1.0 AS DOUBLE)
                       / CAST({_RRF_K} + b.rank_text AS DOUBLE),
                       CAST(0.0 AS DOUBLE))
              + COALESCE(CAST(1.0 AS DOUBLE)
                         / CAST({_RRF_K} + v.rank_vec AS DOUBLE),
                         CAST(0.0 AS DOUBLE))) AS rrf_score
      FROM brank b FULL OUTER JOIN vrank v ON v.doc_id = b.doc_id
    )"""


def _hybrid_rrf_oracle() -> str:
    return (
        _hybrid_fused_sql()
        + """
    SELECT doc_id, rank_text, rank_vec, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 10
    """
    )


@register(
    "hybrid_search_rrf",
    _hybrid_rrf_oracle(),
    description="hybrid retrieval with reciprocal-rank fusion: the "
    f"BM25 top-{_RRF_DEPTH} (persisted inverted-index probe) and the "
    f"exact-cosine top-{_RRF_DEPTH} (vec i as doc i's embedding) fuse "
    f"by sum(1/({_RRF_K}+rank)) — the standard lexical+vector serving "
    "stack (RRF is rank-only, so the two scorers' incomparable scales "
    "never mix; k=60 damping).  Pure rational arithmetic on ranks — "
    "no transcendentals, hash-exact.  Completes the retrieval story: "
    "inverted index, ANN index, fusion layer",
    tags=("pipeline", "search", "similarity", "extension"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    fused = _hybrid_fused(spark, sf_dir)
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)


def _hybrid_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_hybrid_fused_sql` — the fused candidate
    relation (<= 2 x RRF_DEPTH rows), before any final cut."""
    from pyspark.sql import Window

    from ..operators.similarity import brute_force_topk
    from ..operators.text_index import bm25_topk
    from .text_queries import _BM25_TERMS, _ensure_text_index

    tpath = _ensure_text_index(spark, sf_dir)
    brank = (
        bm25_topk(spark, tpath, list(_BM25_TERMS), _RRF_DEPTH)
        .withColumn(
            "rank_text",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25_score"), F.asc("doc_id")))
            .cast("int"),
        )
        .select("doc_id", "rank_text")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    query = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    vrank = (
        brute_force_topk(corpus, query, _RRF_DEPTH)
        .withColumn(
            "rank_vec",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), F.asc("vec_id")))
            .cast("int"),
        )
        .select(F.col("vec_id").alias("doc_id"), "rank_vec")
    )
    zero = F.lit(0.0).cast("double")
    one = F.lit(1.0).cast("double")
    return brank.join(vrank, "doc_id", "full_outer").select(
        "doc_id",
        "rank_text",
        "rank_vec",
        (
            F.coalesce(
                one / (F.lit(_RRF_K) + F.col("rank_text")).cast("double"),
                zero,
            )
            + F.coalesce(
                one / (F.lit(_RRF_K) + F.col("rank_vec")).cast("double"),
                zero,
            )
        ).alias("rrf_score"),
    )


def _curated_multimodal_oracle() -> str:
    """DuckDB replay of the FULL multimodal staged ingest: the
    text-dedup parity split (identical CTE chain to
    _curated_ingest_oracle), then the vector-dedup chain over ONLY the
    text-admitted docs — batch 0 founds the codes store with its
    embedding-survivors, batch 1 gates against them plus its own lower
    peers (cell-local, nprobe=1, the incremental_vector_dedup_sim
    semantics).  Output is the composed acceptance ledger."""
    return f"""
    WITH {_curated_multimodal_chain()}
    SELECT doc_id, CAST(0 AS INTEGER) AS batch_id,
           CAST(CASE WHEN doc_id IN (SELECT doc_id FROM accv0)
                THEN 1 ELSE 0 END AS INTEGER) AS vec_ok
    FROM acc0
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER) AS batch_id,
           CAST(CASE WHEN doc_id IN (SELECT doc_id FROM accv1)
                THEN 1 ELSE 0 END AS INTEGER) AS vec_ok
    FROM acc1
    """


def _curated_multimodal_chain() -> str:
    """The shared CTE chain of the multimodal staged-ingest replay —
    text-dedup parity split (acc0/acc1), PQ encode (pcodes), IVF
    assign (assign), sequential cell-local vector gating
    (accv0/accv1) — reused by the ingest ledger oracle above and the
    erasure-sim oracle below (the parameterized-CTE-generator pattern
    that made round 7's fitted-index oracles first-try green)."""
    from ..functions.vectors import QV
    from .similarity_queries import _PQ_SUBDIM, VEC_DEDUP_THRESH

    return f"""{_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    rej0 AS (
      SELECT DISTINCT a.doc_id FROM b0 a JOIN b0 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id > b.doc_id
    ),
    acc0 AS (
      SELECT DISTINCT doc_id FROM b0
      WHERE doc_id NOT IN (SELECT doc_id FROM rej0)
    ),
    store AS (
      SELECT DISTINCT band, bh FROM bands
      WHERE doc_id IN (SELECT doc_id FROM acc0)
    ),
    rej1 AS (
      SELECT DISTINCT a.doc_id FROM b1 a JOIN store s
        ON a.band = s.band AND a.bh = s.bh
      UNION
      SELECT DISTINCT a.doc_id FROM b1 a JOIN b1 b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id > b.doc_id
    ),
    acc1 AS (
      SELECT DISTINCT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
    ),
    flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flat GROUP BY vec_id
    ),
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pdists AS (
      SELECT psub.vec_id, psub.s, pcent.cid,
             SUM(CAST(FLOOR((psub.x - pcent.x) * (psub.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM psub JOIN pcent ON psub.i = pcent.i AND psub.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    adots AS (
      SELECT flat.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(flat.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat JOIN icent ON flat.i = icent.i
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) DESC,
                          a.cid ASC) AS rn
        FROM adots a
        JOIN norms nv ON nv.vec_id = a.vec_id
        JOIN norms nc ON nc.vec_id = a.cid
      ) WHERE rn = 1
    ),
    qtabm AS (
      SELECT qf.vec_id AS qid, pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM psub qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2, 3
    ),
    cellm AS (
      SELECT t.qid, c.vec_id AS vid, CAST(SUM(t.qd) AS BIGINT) AS dist
      FROM pcodes c
      JOIN qtabm t ON t.s = c.s AND t.cid = c.code
      JOIN assign aq ON aq.vec_id = t.qid
      JOIN assign av ON av.vec_id = c.vec_id
        AND av.list_id = aq.list_id
      WHERE c.vec_id <> t.qid
      GROUP BY 1, 2
    ),
    rejv0 AS (
      SELECT DISTINCT qid FROM cellm
      WHERE dist <= {VEC_DEDUP_THRESH}
        AND qid IN (SELECT doc_id FROM acc0)
        AND vid IN (SELECT doc_id FROM acc0)
        AND vid < qid
    ),
    accv0 AS (
      SELECT doc_id FROM acc0
      WHERE doc_id NOT IN (SELECT qid FROM rejv0)
    ),
    rejv1 AS (
      SELECT DISTINCT qid FROM cellm
      WHERE dist <= {VEC_DEDUP_THRESH}
        AND qid IN (SELECT doc_id FROM acc1)
        AND (vid IN (SELECT doc_id FROM accv0)
             OR (vid IN (SELECT doc_id FROM acc1) AND vid < qid))
    ),
    accv1 AS (
      SELECT doc_id FROM acc1
      WHERE doc_id NOT IN (SELECT qid FROM rejv1)
    )
    """


@register(
    "curated_multimodal_ingest",
    _curated_multimodal_oracle(),
    description="the FULL multimodal curated ingest end to end "
    "(VERDICT r6 item 6): two parity-split micro-batches of (doc_id, "
    "text, embedding) rows flow through the four-stage foreachBatch "
    "(streaming/curated_ingest.curated_multimodal_ingest_sink) — "
    "MinHash text dedup admits, the text index ingests exactly the "
    "admitted partition, cell-local ADC vector dedup gates the "
    "admitted docs' embeddings against the (initially quantizer-only) "
    "ANN index, and embedding-survivors' codes found/extend that "
    "index — every write batch-id-keyed and replay-convergent.  The "
    "hash-checked output is the composed acceptance ledger (doc_id, "
    "batch_id, vec_ok) read back from the persisted artifacts; ONE "
    "oracle replays the entire composition: minhash parity split -> "
    "accepted set -> PQ encode/IVF assign -> sequential cell-local "
    "vector gating with batch 0's survivors as batch 1's store",
    tags=("pipeline", "dedup", "similarity", "ann", "index",
          "streaming", "multimodal", "extension"),
)
def curated_multimodal_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from ..operators.ann_index import build_pq_quantizer
    from ..streaming.curated_ingest import curated_multimodal_ingest_sink
    from .similarity_queries import VEC_DEDUP_THRESH

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    batch = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    tmp = tempfile.mkdtemp(prefix="curated_mm_")
    build_pq_quantizer(spark, emb, f"{tmp}/ann")
    sink = curated_multimodal_ingest_sink(
        f"{tmp}/store",
        f"{tmp}/out",
        f"{tmp}/tidx",
        f"{tmp}/ann",
        f"{tmp}/vec_out",
        VEC_DEDUP_THRESH,
    )
    sink(batch.where(F.col("doc_id") % 2 == 0), 0)
    sink(batch.where(F.col("doc_id") % 2 == 1), 1)
    out = spark.read.parquet(f"{tmp}/out").select(
        "doc_id", F.col("batch_id").cast("int").alias("batch_id")
    )
    vec = (
        spark.read.parquet(f"{tmp}/vec_out")
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("_v", F.lit(1))
    )
    return out.join(vec, "doc_id", "left").select(
        "doc_id",
        "batch_id",
        F.coalesce(F.col("_v"), F.lit(0)).cast("int").alias("vec_ok"),
    )


_HYBRID_BATCH = ((1, ("spark", "window")), (2, ("window", "join")),
                 (3, ("spark", "join")))


def _hybrid_batch_oracle() -> str:
    """DuckDB replay of the fused batch: per-qid BM25 ranking (the
    bm25_batch_search oracle), per-qid IVF-pruned ADC ranking (the
    ann_pq_persisted_batch_topk oracle), RRF fusion — three proven
    replay chains composed."""
    from ..functions.core import sql_dsum
    from ..functions.hashing import sql_tokens as _sqlt
    from ..functions.vectors import QV
    from ..operators.hybrid import HYBRID_DEPTH, RRF_K
    from ..operators.text_index import sql_bm25_score_expr
    from .similarity_queries import _PQ_SUBDIM

    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _HYBRID_BATCH for t in terms
    )
    all_terms = sorted({t for _, terms in _HYBRID_BATCH for t in terms})
    terms_sql = "(" + ", ".join(f"'{t}'" for t in all_terms) + ")"
    qids_sql = "(" + ", ".join(str(q) for q, _ in _HYBRID_BATCH) + ")"
    return f"""
    WITH qterms AS (
      SELECT CAST(qid AS BIGINT) AS qid, tok
      FROM (VALUES {values}) v(qid, tok)
    ),
    occ AS (
      SELECT doc_id, unnest({_sqlt('text')}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM occ GROUP BY 1, 2
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM occ GROUP BY 1
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY 1
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_len
    ),
    bscored AS (
      SELECT q.qid, t.doc_id, t.tok, {sql_bm25_score_expr()} AS sc
      FROM tf t
      JOIN qterms q ON q.tok = t.tok
      JOIN vocab d ON d.tok = t.tok
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.tok IN {terms_sql}
    ),
    bdocs AS (
      SELECT qid, doc_id, {sql_dsum('sc')} AS bm25
      FROM bscored GROUP BY qid, doc_id
    ),
    brank AS (
      SELECT qid, doc_id, rank_text FROM (
        SELECT qid, doc_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY qid
                 ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rank_text
        FROM bdocs
      ) WHERE rank_text <= {HYBRID_DEPTH}
    ),
    flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flat GROUP BY vec_id
    ),
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) DESC,
                          a.cid ASC) AS rn
        FROM adots a
        JOIN norms nv ON nv.vec_id = a.vec_id
        JOIN norms nc ON nc.vec_id = a.cid
      ) WHERE rn = 1
    ),
    qdots AS (
      SELECT qf.vec_id AS qid, icent.cid,
             CAST(SUM(CAST(FLOOR(qf.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN icent ON qf.i = icent.i
      WHERE qf.vec_id IN {qids_sql}
      GROUP BY 1, 2
    ),
    qprobes AS (
      SELECT qid, cid FROM (
        SELECT q.qid, q.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(nc.n2))) DESC,
                          q.cid ASC) AS rn
        FROM qdots q
        JOIN norms nq ON nq.vec_id = q.qid
        JOIN norms nc ON nc.vec_id = q.cid
      ) WHERE rn <= 2
    ),
    qtables AS (
      SELECT qf.vec_id AS qid, pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT vec_id, s, i, x FROM psub
            WHERE vec_id IN {qids_sql}) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2, 3
    ),
    adc AS (
      SELECT t.qid, c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c
      JOIN assign g ON g.vec_id = c.vec_id
      JOIN qtables t ON t.s = c.s AND t.cid = c.code
      JOIN qprobes p ON p.qid = t.qid AND p.cid = g.list_id
      WHERE c.vec_id <> t.qid
      GROUP BY 1, 2
    ),
    vrank AS (
      SELECT qid, doc_id, rank_vec FROM (
        SELECT qid, vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY qid
                 ORDER BY adc_dist ASC, vec_id ASC) AS INTEGER)
                 AS rank_vec
        FROM adc
      ) WHERE rank_vec <= {HYBRID_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(b.qid, v.qid) AS qid,
             COALESCE(b.doc_id, v.doc_id) AS doc_id,
             b.rank_text, v.rank_vec,
             (COALESCE(CAST(1.0 AS DOUBLE)
                       / CAST({RRF_K} + b.rank_text AS DOUBLE),
                       CAST(0.0 AS DOUBLE))
              + COALESCE(CAST(1.0 AS DOUBLE)
                         / CAST({RRF_K} + v.rank_vec AS DOUBLE),
                         CAST(0.0 AS DOUBLE))) AS rrf_score
      FROM brank b
      FULL OUTER JOIN vrank v
        ON v.qid = b.qid AND v.doc_id = b.doc_id
    )
    SELECT qid, doc_id, rank_text, rank_vec, rrf_score, rank FROM (
      SELECT qid, doc_id, rank_text, rank_vec, rrf_score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER) AS rank
      FROM fused
    ) WHERE rank <= 10
    """


def _hybrid_filtered_oracle() -> str:
    """DuckDB replay of the FILTERED hybrid (lang='en' on both sides):
    candidate-restricted BM25 top-depth rank (stats corpus-global — the
    bm25_filtered_search contract) + candidate-restricted IVF-pruned
    ADC top-depth rank (the ann_pq_filtered_topk contract: coarse-list
    selection ignores the filter), RRF-fused — the two filtered replay
    chains composed exactly like _hybrid_batch_oracle composes the
    unfiltered ones."""
    from ..functions.core import sql_dsum
    from ..functions.hashing import sql_tokens as _sqlt
    from ..functions.vectors import QV
    from ..operators.hybrid import HYBRID_DEPTH, RRF_K
    from ..operators.text_index import sql_bm25_score_expr
    from .similarity_queries import _PQ_SUBDIM
    from .text_queries import _BM25_TERMS

    terms_sql = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
    allowed = "(SELECT doc_id FROM documents WHERE lang = 'en')"
    return f"""
    WITH occ AS (
      SELECT doc_id, unnest({_sqlt('text')}) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM occ GROUP BY 1, 2
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM occ GROUP BY 1
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY 1
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_len
    ),
    bscored AS (
      SELECT t.doc_id, t.tok, {sql_bm25_score_expr()} AS sc
      FROM tf t
      JOIN vocab d ON d.tok = t.tok
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.tok IN {terms_sql}
        AND t.doc_id IN {allowed}
    ),
    bdocs AS (
      SELECT doc_id, {sql_dsum('sc')} AS bm25
      FROM bscored GROUP BY doc_id
    ),
    brank AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                  AS INTEGER) AS rank_text
      FROM bdocs
      ORDER BY bm25 DESC, doc_id ASC LIMIT {HYBRID_DEPTH}
    ),
    flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(FLOOR(x * x * {QV!r} + 0.5) AS BIGINT))
                  AS DOUBLE) / {QV!r} AS n2
      FROM flat GROUP BY vec_id
    ),
    psub AS (
      SELECT vec_id, CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS s, i, x
      FROM flat
    ),
    pcent AS (
      SELECT vec_id AS cid, s, i, x FROM psub
      WHERE vec_id BETWEEN 10 AND 17
    ),
    pcorp AS (SELECT vec_id, s, i, x FROM psub WHERE vec_id <> 0),
    pdists AS (
      SELECT pcorp.vec_id, pcorp.s, pcent.cid,
             SUM(CAST(FLOOR((pcorp.x - pcent.x) * (pcorp.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS d
      FROM pcorp JOIN pcent ON pcorp.i = pcent.i AND pcorp.s = pcent.s
      GROUP BY 1, 2, 3
    ),
    pcodes AS (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d ASC, cid ASC) AS rn
        FROM pdists
      ) WHERE rn = 1
    ),
    icent AS (SELECT vec_id AS cid, i, x FROM flat
              WHERE vec_id BETWEEN 10 AND 17),
    corp AS (SELECT vec_id, i, x FROM flat WHERE vec_id <> 0),
    adots AS (
      SELECT corp.vec_id, icent.cid,
             CAST(SUM(CAST(FLOOR(corp.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM corp JOIN icent ON corp.i = icent.i
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cid AS list_id FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY (a.dot / (sqrt(nv.n2) * sqrt(nc.n2))) DESC,
                          a.cid ASC) AS rn
        FROM adots a
        JOIN norms nv ON nv.vec_id = a.vec_id
        JOIN norms nc ON nc.vec_id = a.cid
      ) WHERE rn = 1
    ),
    qdots AS (
      SELECT icent.cid,
             CAST(SUM(CAST(FLOOR(qf.x * icent.x * {QV!r} + 0.5)
                           AS BIGINT)) AS DOUBLE) / {QV!r} AS dot
      FROM flat qf JOIN icent ON qf.i = icent.i
      WHERE qf.vec_id = 0
      GROUP BY 1
    ),
    probes AS (
      SELECT q.cid FROM qdots q
      JOIN norms nq ON nq.vec_id = 0
      JOIN norms nc ON nc.vec_id = q.cid
      ORDER BY (q.dot / (sqrt(nq.n2) * sqrt(nc.n2))) DESC, q.cid ASC
      LIMIT 2
    ),
    qtable AS (
      SELECT pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM (SELECT s, i, x FROM psub WHERE vec_id = 0) qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      GROUP BY 1, 2
    ),
    adc AS (
      SELECT c.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_dist
      FROM pcodes c
      JOIN assign g ON g.vec_id = c.vec_id
      JOIN qtable t ON t.s = c.s AND t.cid = c.code
      WHERE g.list_id IN (SELECT cid FROM probes)
        AND c.vec_id IN {allowed}
      GROUP BY 1
    ),
    vrank AS (
      SELECT vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY adc_dist ASC, vec_id ASC) AS INTEGER)
               AS rank_vec
      FROM adc
      ORDER BY adc_dist ASC, vec_id ASC
      LIMIT {HYBRID_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
             b.rank_text, v.rank_vec,
             (COALESCE(CAST(1.0 AS DOUBLE)
                       / CAST({RRF_K} + b.rank_text AS DOUBLE),
                       CAST(0.0 AS DOUBLE))
              + COALESCE(CAST(1.0 AS DOUBLE)
                         / CAST({RRF_K} + v.rank_vec AS DOUBLE),
                         CAST(0.0 AS DOUBLE))) AS rrf_score
      FROM brank b FULL OUTER JOIN vrank v ON v.doc_id = b.doc_id
    )
    SELECT doc_id, rank_text, rank_vec, rrf_score, rank FROM (
      SELECT doc_id, rank_text, rank_vec, rrf_score,
             CAST(ROW_NUMBER() OVER (
               ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER) AS rank
      FROM fused
    ) WHERE rank <= 10
    """


@register(
    "hybrid_filtered_search_rrf",
    _hybrid_filtered_oracle(),
    description="FILTERED hybrid retrieval over BOTH persisted "
    "indexes — 'hybrid search within lang=en', the predicate+fusion "
    "query a RAG stack serves (VERDICT r9 item 3's hybrid variant): "
    "the filtered BM25 probe (postings-layout attr store, term-"
    "filtered metadata scan) and the filtered IVF-PQ probe (codes-"
    "layout attr store, list-pruned metadata scan) each contribute "
    "their top-20 among lang='en' docs, fused per doc by "
    "reciprocal-rank sums 1/(60+rank).  Each side's candidate "
    "restriction rides its own index layout — nothing corpus-wide "
    "enters the fused plan; statistics stay corpus-global on the text "
    "side and coarse-list selection ignores the filter on the ANN "
    "side (both standard filtered-search contracts, both replayed by "
    "the composed oracle)",
    tags=("pipeline", "search", "similarity", "ann", "bm25", "index",
          "filtered", "extension"),
)
def hybrid_filtered_search_rrf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.hybrid import hybrid_filtered_rrf
    from .similarity_queries import _ensure_pq_attrs
    from .text_queries import _BM25_TERMS, _ensure_text_attrs

    tpath = _ensure_text_attrs(spark, sf_dir)
    apath = _ensure_pq_attrs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding")
    return hybrid_filtered_rrf(
        spark,
        tpath,
        apath,
        list(_BM25_TERMS),
        query,
        attr_pred_text=F.col("lang") == "en",
        attr_pred_vec=F.col("lang") == "en",
        k=10,
        nprobe=2,
    )


@register(
    "hybrid_batch_search_rrf",
    _hybrid_batch_oracle(),
    description="BATCH hybrid retrieval over BOTH persisted indexes "
    "(the serving-stack completion of hybrid_search_rrf): 3 queries, "
    "each carrying a term bag AND an embedding, answered by ONE "
    "term-filtered postings scan (BM25 top-20 per qid, pushed IN "
    "predicate) + ONE IVF-pruned codes scan (ADC top-20 per qid, "
    "nprobe=2 dynamic partition pruning), fused per (qid, doc) by "
    "reciprocal-rank sums 1/(60+rank) — rank-only, pure rational "
    "arithmetic, hash-exact.  The same operator "
    "(operators/hybrid.hybrid_batch_rrf) is the engine of the "
    "streaming hybrid serving sink (streaming/hybrid_serve.py, "
    "pytest-pinned).  The oracle composes the three proven replay "
    "chains: per-qid BM25, per-qid coarse ranking + pruned ADC, RRF",
    tags=("pipeline", "search", "similarity", "ann", "bm25", "index",
          "batch", "extension"),
)
def hybrid_batch_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hybrid import hybrid_batch_rrf
    from .similarity_queries import _ensure_pq_index
    from .text_queries import _ensure_text_index

    tpath = _ensure_text_index(spark, sf_dir)
    apath = _ensure_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qdefs = spark.createDataFrame(
        [(qid, list(terms)) for qid, terms in _HYBRID_BATCH],
        "qid long, terms array<string>",
    )
    queries = qdefs.join(
        emb.select(F.col("vec_id").alias("qid"), "embedding"), "qid"
    )
    all_terms = sorted({t for _, terms in _HYBRID_BATCH for t in terms})
    return hybrid_batch_rrf(
        spark,
        tpath,
        apath,
        queries,
        k=10,
        nprobe=2,
        terms_literal=all_terms,
    )


@register(
    "curated_erasure_sim",
    _curated_ingest_oracle("doc_id % 7 <> 3"),
    description="right-to-erasure across the WHOLE curated pipeline "
    "(streaming/curated_ingest.curated_erase): after the staged "
    "dedup->index ingest of two parity batches, every doc_id % 7 == 3 "
    "is erased from the signature store, the accepted artifact AND "
    "the text index in one call — ghost bands gone (future near-dups "
    "of erased docs admit again, pytest-pinned), postings/df/stats "
    "contributions gone — and the merge-on-read BM25 probe must equal "
    "a pipeline whose accepted set never included them.  Erasure "
    "semantics stated plainly: data and future influence removed, "
    "historical rejection decisions stand (the oracle filters the "
    "accepted set, not the dedup history)",
    tags=("pipeline", "dedup", "search", "maintenance", "streaming",
          "extension"),
)
def curated_erasure_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.text_index import bm25_topk_merged
    from ..streaming.curated_ingest import curated_erase, curated_ingest_sink
    from .text_queries import _BM25_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="curated_erase_")
    sink = curated_ingest_sink(
        f"{tmp}/store", f"{tmp}/out", f"{tmp}/index"
    )
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    erased = [
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 == 3)
        .select("doc_id")
        .collect()
    ]
    curated_erase(
        spark, f"{tmp}/store", f"{tmp}/out", f"{tmp}/index", erased
    )
    return bm25_topk_merged(
        spark, f"{tmp}/index", list(_BM25_TERMS), 10
    )


def _curated_multimodal_erasure_oracle() -> str:
    """DuckDB replay of the multimodal ingest FOLLOWED BY
    right-to-erasure across all four stores: the shared multimodal
    chain computes the text-accepted (acc0/acc1) and vector-accepted
    (accv0/accv1) sets, the erasure predicate removes doc_id % 7 == 3
    from both, and BOTH serving probes replay over survivors only —
    merge-on-read BM25 over the surviving text-accepted docs, full-PQ
    ADC top-10 for query vec 0 over the surviving indexed codes.  A
    post-erasure probe that differs from this never-contained replay
    would mean the erasure left a trace in postings/df/stats or in the
    ANN codes."""
    from ..functions.core import sql_dsum
    from ..functions.hashing import sql_tokens
    from ..functions.vectors import QV
    from ..operators.text_index import sql_bm25_score_expr
    from .text_queries import _BM25_TERMS

    terms_sql = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
    return f"""
    WITH {_curated_multimodal_chain()},
    acceptedt AS (
      SELECT doc_id FROM (
        SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1
      ) WHERE doc_id % 7 <> 3
    ),
    occ AS (
      SELECT dd.doc_id, unnest({sql_tokens('dd.text')}) AS tok
      FROM documents dd JOIN acceptedt ac ON ac.doc_id = dd.doc_id
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM occ GROUP BY 1, 2
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM occ GROUP BY 1
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY 1
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM acceptedt) AS n_docs,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_len
    ),
    tscored AS (
      SELECT t.doc_id, t.tok, {sql_bm25_score_expr()} AS sc
      FROM tf t
      JOIN vocab d ON d.tok = t.tok
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.tok IN {terms_sql}
    ),
    textside AS (
      SELECT 'text' AS side, doc_id,
             CAST(COUNT(*) AS INTEGER) AS n, {sql_dsum('sc')} AS metric
      FROM tscored GROUP BY doc_id
      ORDER BY metric DESC, doc_id ASC
      LIMIT 10
    ),
    survv AS (
      SELECT doc_id FROM (
        SELECT doc_id FROM accv0 UNION ALL SELECT doc_id FROM accv1
      ) WHERE doc_id % 7 <> 3
    ),
    qt0 AS (
      SELECT pcent.s, pcent.cid,
             SUM(CAST(FLOOR((qf.x - pcent.x) * (qf.x - pcent.x)
                            * {QV!r} + 0.5) AS BIGINT)) AS qd
      FROM psub qf
      JOIN pcent ON pcent.i = qf.i AND pcent.s = qf.s
      WHERE qf.vec_id = 0
      GROUP BY 1, 2
    ),
    vprobe AS (
      SELECT c.vec_id AS doc_id, CAST(SUM(t.qd) AS BIGINT) AS dist
      FROM pcodes c
      JOIN qt0 t ON t.s = c.s AND t.cid = c.code
      WHERE c.vec_id IN (SELECT doc_id FROM survv)
      GROUP BY 1
    ),
    vecside AS (
      SELECT 'vec' AS side, doc_id, CAST(rnk AS INTEGER) AS n,
             CAST(dist AS DOUBLE) AS metric
      FROM (
        SELECT doc_id, dist,
               ROW_NUMBER() OVER (ORDER BY dist ASC, doc_id ASC) AS rnk
        FROM vprobe
      ) WHERE rnk <= 10
    )
    SELECT side, doc_id, n, metric FROM textside
    UNION ALL
    SELECT side, doc_id, n, metric FROM vecside
    """


@register(
    "curated_multimodal_erasure_sim",
    _curated_multimodal_erasure_oracle(),
    description="right-to-erasure across ALL FOUR multimodal stores in "
    "one call (VERDICT r7 item 4 — the erasure twin of "
    "curated_multimodal_ingest): after the staged text-dedup -> "
    "text-index -> vector-dedup -> ANN ingest of two parity batches, "
    "every doc_id % 7 == 3 is erased from the signature store, the "
    "accepted artifact, the text index (delta corrections — VERDICT "
    "r7 item 3), the accepted-vector store AND the ANN codes via "
    "curated_erase(ann_index_path=..., vec_out_path=...); the "
    "hash-checked output is BOTH serving probes side by side — "
    "merge-on-read BM25 top-10 and full-PQ ADC top-10 for query vec 0 "
    "— which must equal a pipeline whose accepted sets never "
    "contained the erased docs.  One oracle replays the whole "
    "composition over survivors; the vector ghost-code semantics "
    "(near-dups of erased vectors admit again) are pytest-pinned",
    tags=("pipeline", "dedup", "search", "similarity", "ann", "index",
          "maintenance", "streaming", "multimodal", "extension"),
)
def curated_multimodal_erasure_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from pyspark.sql import Window

    from ..operators.ann_index import build_pq_quantizer, pq_probe_topk
    from ..operators.text_index import bm25_topk_merged
    from ..streaming.curated_ingest import (
        curated_erase,
        curated_multimodal_ingest_sink,
    )
    from .similarity_queries import VEC_DEDUP_THRESH
    from .text_queries import _BM25_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    batch = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    tmp = tempfile.mkdtemp(prefix="curated_mm_erase_")
    build_pq_quantizer(spark, emb, f"{tmp}/ann")
    sink = curated_multimodal_ingest_sink(
        f"{tmp}/store",
        f"{tmp}/out",
        f"{tmp}/tidx",
        f"{tmp}/ann",
        f"{tmp}/vec_out",
        VEC_DEDUP_THRESH,
    )
    sink(batch.where(F.col("doc_id") % 2 == 0), 0)
    sink(batch.where(F.col("doc_id") % 2 == 1), 1)
    erased = [
        int(r["doc_id"])
        for r in docs.where(F.col("doc_id") % 7 == 3)
        .select("doc_id")
        .collect()
    ]
    curated_erase(
        spark,
        f"{tmp}/store",
        f"{tmp}/out",
        f"{tmp}/tidx",
        erased,
        ann_index_path=f"{tmp}/ann",
        vec_out_path=f"{tmp}/vec_out",
    )
    text = bm25_topk_merged(
        spark, f"{tmp}/tidx", list(_BM25_TERMS), 10
    ).select(
        F.lit("text").alias("side"),
        "doc_id",
        F.col("n_terms_matched").alias("n"),
        F.col("bm25_score").alias("metric"),
    )
    query = emb.where(F.col("vec_id") == 0).select("embedding")
    vec = (
        pq_probe_topk(spark, f"{tmp}/ann", query, 10)
        .withColumn(
            "n",
            F.row_number()
            .over(Window.orderBy(F.asc("adc_dist"), F.asc("vec_id")))
            .cast("int"),
        )
        .select(
            F.lit("vec").alias("side"),
            F.col("vec_id").alias("doc_id"),
            "n",
            F.col("adc_dist").cast("double").alias("metric"),
        )
    )
    return text.unionByName(vec)


@register(
    "streaming_erasure_sim",
    _curated_ingest_oracle("doc_id % 7 <> 3 AND doc_id % 7 <> 5"),
    description="right-to-erasure as a STREAM (the deletion-queue "
    "shape a GDPR/DSAR processor emits): after the staged "
    "dedup->index ingest of two parity batches, TWO erasure-request "
    "micro-batches flow through streaming_erasure_sink (doc_id % 7 == "
    "3, then % 7 == 5), each applied via curated_erase — "
    "delta-corrected, tombstone-committed, idempotent under replay — "
    "and the merge-on-read BM25 probe must equal a pipeline whose "
    "accepted set never contained either request's docs.  The second "
    "batch erases from a store the first already fragmented, so the "
    "hash also pins correction-over-correction composition "
    "(two stacked correction generations summing exactly)",
    tags=("pipeline", "dedup", "search", "maintenance", "streaming",
          "extension"),
)
def streaming_erasure_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.text_index import bm25_topk_merged
    from ..streaming.curated_ingest import (
        curated_ingest_sink,
        streaming_erasure_sink,
    )
    from .text_queries import _BM25_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_erase_")
    sink = curated_ingest_sink(
        f"{tmp}/store", f"{tmp}/out", f"{tmp}/index"
    )
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    eraser = streaming_erasure_sink(
        f"{tmp}/store", f"{tmp}/out", f"{tmp}/index"
    )
    eraser(docs.where(F.col("doc_id") % 7 == 3).select("doc_id"), 0)
    eraser(docs.where(F.col("doc_id") % 7 == 5).select("doc_id"), 1)
    return bm25_topk_merged(
        spark, f"{tmp}/index", list(_BM25_TERMS), 10
    )


# --- RAG context assembly (retrieval -> token-budget packing) ----------

_CTX_BUDGET = 1024  # tokens of retrieved context the prompt can hold


@register(
    "rag_context_pack",
    _hybrid_fused_sql()
    + f""",
    ctx_toked AS (
      SELECT f.doc_id, f.rrf_score,
             CAST(len(string_split_regex(trim(lower(d.text)), '\\s+')) AS BIGINT) AS n_tokens
      FROM fused f JOIN documents d ON d.doc_id = f.doc_id
    ),
    ctx AS (
      SELECT doc_id, rrf_score, n_tokens,
             CAST(ROW_NUMBER() OVER w AS INTEGER) AS ctx_rank,
             CAST(SUM(n_tokens) OVER (
               ORDER BY rrf_score DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM ctx_toked
      WINDOW w AS (ORDER BY rrf_score DESC, doc_id ASC)
    )
    SELECT doc_id, ctx_rank, rrf_score, n_tokens, cum_tokens,
           (cum_tokens <= {_CTX_BUDGET}) AS included
    FROM ctx
    """,
    description="RAG context assembly: the hybrid (BM25 + cosine) RRF "
    f"candidate set, ranked by fused score, greedily packed into a "
    f"{_CTX_BUDGET}-token context budget (rank-ordered prefix: a doc "
    "is included iff the running token total through it fits). One "
    "row per retrieved candidate with its inclusion fate — the "
    "retrieval-to-prompt stage of a RAG pipeline as a single "
    "declarative plan. The cumulative window runs over the fused "
    "candidate relation (<= 2x RRF depth rows, bounded post-top-k)",
    tags=("pipeline", "search", "rag", "extension"),
)
def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import tokens as _tok

    fused = _hybrid_fused(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_tok(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    ctx = fused.join(docs, "doc_id").select(
        "doc_id", "rrf_score", "n_tokens"
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ctx.select(
        "doc_id",
        F.row_number().over(w).cast("int").alias("ctx_rank"),
        "rrf_score",
        "n_tokens",
        F.sum("n_tokens").over(wsum).cast("bigint").alias("cum_tokens"),
    ).withColumn("included", F.col("cum_tokens") <= F.lit(_CTX_BUDGET))
