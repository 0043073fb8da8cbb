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
from ..sources.tables import dataset_cache_key, load_table
from .registry import register

# Rank store, built ONCE per (process, sf_dir) — the production shape:
# domain authority is a scheduled artifact the curation queries read,
# not something every consumer re-derives (same amortization pattern
# as similarity_queries._ensure_pq_index).  domain_pagerank itself
# stays a full derivation so the rank math keeps direct driver-gate
# evidence.
_RANK_STORE_CACHE: dict[str, str] = {}


def _ensure_rank_store(spark: SparkSession, sf_dir: str) -> str:
    key = dataset_cache_key(sf_dir)
    path = _RANK_STORE_CACHE.get(key)
    if path is None:
        import tempfile

        docs = load_table(spark, sf_dir, "documents")
        path = tempfile.mkdtemp(prefix="rank_store_") + "/ranks"
        pagerank_integer(
            docs.select("source").distinct(), cocitation_edges(docs)
        ).write.mode("overwrite").parquet(path)
        _RANK_STORE_CACHE[key] = path
    return path


def _pagerank_ctes(n_iter: int = N_ITER) -> str:
    """The shared CTE body (no WITH, no tail select): edge derivation
    + n_iter unrolled integer rank steps, ending at rank{n_iter}."""
    head = f"""
    toks AS (
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
    return head + "," + ",".join(steps)


def _pagerank_oracle(n_iter: int = N_ITER) -> str:
    return f"""
    WITH {_pagerank_ctes(n_iter)}
    SELECT r.source, CAST(r.r AS BIGINT) AS rank_micro,
           CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
           CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
    FROM rank{n_iter} r
    LEFT JOIN outdeg o ON o.src = r.source
    LEFT JOIN indeg i ON i.dst = r.source
    """


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


_SAMPLE_TARGET = 100


@register(
    "authority_weighted_sample",
    f"""
    WITH {{CTES}},
    ranks AS (
      SELECT source, CAST(r AS BIGINT) AS rank_micro
      FROM rank{N_ITER}
    ),
    total AS (
      SELECT CAST(SUM(rank_micro) AS BIGINT) AS total_rank FROM ranks
    ),
    quotas AS (
      SELECT r.source, r.rank_micro,
             CAST(FLOOR(r.rank_micro * {_SAMPLE_TARGET}.0
                        / t.total_rank) AS BIGINT) AS quota
      FROM ranks r CROSS JOIN total t
    ),
    picked AS (
      SELECT d.doc_id, d.source, q.rank_micro, q.quota,
             ROW_NUMBER() OVER (
               PARTITION BY d.source ORDER BY d.doc_id ASC) AS rn
      FROM documents d JOIN quotas q ON q.source = d.source
    )
    SELECT doc_id, source, rank_micro, quota
    FROM picked WHERE rn <= quota
    """.replace("{CTES}", _pagerank_ctes()),
    description="authority-weighted curation sampling: each source's "
    f"quota of a {_SAMPLE_TARGET}-doc sample is proportional to its "
    "integer PageRank (floor(rank * N / total_rank)); the quota is "
    "filled deterministically with the source's lowest doc_ids.  The "
    "domain-mix stage of a crawl-curation pipeline, driven by the "
    "measured authority signal instead of a hand-set mix",
    tags=("graph", "curation", "sampling", "extension"),
)
def authority_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    ranks = spark.read.parquet(
        _ensure_rank_store(spark, sf_dir)
    ).select("source", "rank_micro")
    total = ranks.agg(
        F.sum("rank_micro").cast("long").alias("total_rank")
    )
    quotas = ranks.crossJoin(F.broadcast(total)).select(
        "source",
        "rank_micro",
        F.floor(
            F.col("rank_micro") * F.lit(float(_SAMPLE_TARGET))
            / F.col("total_rank")
        )
        .cast("long")
        .alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
    return (
        docs.select("doc_id", "source")
        .join(quotas, "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "rank_micro", "quota")
    )


# ---------------------------------------------------------------- #
# incremental PageRank maintenance (round 13)                       #
# ---------------------------------------------------------------- #

# batch split: base = 3 quarters of the corpus, two delta batches
_BATCH_CASE = (
    "CASE WHEN doc_id % 4 <> 3 THEN 0 "
    "WHEN doc_id % 8 = 3 THEN 1 ELSE 2 END"
)


def _rank_steps(pfx: str, nodes: str, edges: str,
                n_iter: int = N_ITER) -> str:
    """Prefixed integer-PageRank CTE chain over arbitrary node/edge
    CTEs, ending at ``{pfx}out`` — the parametrized twin of
    _pagerank_ctes' rank section, so several generations coexist in
    one oracle."""
    head = f"""
    {pfx}nn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM {nodes}
    ),
    {pfx}outdeg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
      FROM {edges} GROUP BY src
    ),
    {pfx}indeg AS (
      SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_deg
      FROM {edges} GROUP BY dst
    ),
    {pfx}degreed AS (
      SELECT e.src, e.dst, o.out_deg
      FROM {edges} e JOIN {pfx}outdeg o ON o.src = e.src
    ),
    {pfx}rank0 AS (
      SELECT source, CAST(FLOOR({RANK_SCALE!r} / n_nodes) AS BIGINT) AS r
      FROM {nodes} CROSS JOIN {pfx}nn
    )"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
    {pfx}contrib{k} AS (
      SELECT e.dst AS source,
             CAST(SUM(CAST(FLOOR(0.85 * r.r / e.out_deg) AS BIGINT))
                  AS BIGINT) AS contrib
      FROM {pfx}rank{k - 1} r JOIN {pfx}degreed e ON e.src = r.source
      GROUP BY e.dst
    ),
    {pfx}rank{k} AS (
      SELECT n.source,
             CAST(CAST(FLOOR(0.15 * {RANK_SCALE!r} / nn.n_nodes)
                       AS BIGINT)
                  + COALESCE(c.contrib, 0) AS BIGINT) AS r
      FROM {nodes} n CROSS JOIN {pfx}nn nn
      LEFT JOIN {pfx}contrib{k} c ON c.source = n.source
    )""")
    tail = f""",
    {pfx}out AS (
      SELECT r.source, CAST(r.r AS BIGINT) AS rank_micro,
             CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
             CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg
      FROM {pfx}rank{n_iter} r
      LEFT JOIN {pfx}outdeg o ON o.src = r.source
      LEFT JOIN {pfx}indeg i ON i.dst = r.source
    )"""
    return head + "," + ",".join(steps) + tail


def _incremental_ctes() -> str:
    """The incremental edge/rank CTE body (no WITH, no tail selects),
    generations 0-2 — shared by the sim's oracle and the staleness
    report's."""
    gens = []
    for k in range(3):
        prev = f"ed{k - 1}"
        merge = (
            f"ed{k} AS (SELECT src, dst FROM pr{k})"
            if k == 0
            else f"""ed{k} AS (
      SELECT src, dst FROM {prev}
      UNION
      SELECT src, dst FROM pr{k}
    )"""
        )
        gens.append(f"""
    tch{k} AS (SELECT DISTINCT g FROM ish WHERE b = {k}),
    pl{k} AS (
      SELECT DISTINCT s.g, s.source, s.doc_id
      FROM ish s JOIN tch{k} t ON t.g = s.g WHERE s.b <= {k}
    ),
    rr{k} AS (
      SELECT g FROM pl{k} GROUP BY g
      HAVING COUNT(*) BETWEEN {DF_MIN} AND {DF_MAX}
    ),
    pr{k} AS (
      SELECT DISTINCT a.source AS src, b2.source AS dst
      FROM pl{k} a JOIN rr{k} r ON r.g = a.g
      JOIN pl{k} b2 ON b2.g = a.g
      WHERE a.source <> b2.source
    ),
    {merge},
    nd{k} AS (
      SELECT DISTINCT source FROM itoks WHERE b <= {k}
    ),
    {_rank_steps(f"g{k}", f"nd{k}", f"ed{k}")}""")
    return f"""
    itoks AS (
      SELECT doc_id, source, {sql_tokens('text')} AS t,
             {_BATCH_CASE} AS b
      FROM documents
    ),
    ish AS (
      SELECT DISTINCT doc_id, source, b,
             unnest({sql_shingles('t', SHINGLE_N)}) AS g
      FROM itoks
    ),{",".join(gens)}"""


def _incremental_oracle() -> str:
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({k} AS INT) AS gen, source, rank_micro, "
        f"out_deg, in_deg FROM g{k}out"
        for k in range(3)
    )
    return f"""
    WITH {_incremental_ctes()}
    {selects}
    """


@register(
    "pagerank_incremental_sim",
    _incremental_oracle(),
    description="incremental PageRank maintenance under a generational "
    "rank store (round-12 verdict item 6 — domain_pagerank's full "
    "derivation made refreshable): a base corpus plus two delta "
    "batches ingest through streaming/graph_ingest.py; each refresh "
    "derives NEW co-citation pairs only for the shingles the delta "
    "touched (merged df re-checked against [2,6], posting lists <= "
    "DF_MAX rows, so the pair join is delta-bounded) and re-runs the "
    "5 integer rank iterations over the merged |sources|^2-bounded "
    "edge aggregates — never the corpus.  Edges are ADD-ONLY between "
    "full rebuilds (documented contract, oracle-replayed exactly); "
    "batch 1's refresh is REPLAYED after batch 2 and the as-of reads "
    "(batch_id <= b everywhere) make the replay byte-identical with "
    "no marker.  Output: all three rank generations, hash-checked",
    tags=("graph", "incremental", "streaming", "curation", "extension"),
)
def pagerank_incremental_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.graph_ingest import (
        ingest_graph_batch,
        read_rank_generations,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tmp = tempfile.mkdtemp(prefix="graph_store_")
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 4 != 3), 0)
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 8 == 3), 1)
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 8 == 7), 2)
    # crash-replay of batch 1 AFTER batch 2 landed: the as-of reads
    # pin its inputs, so every partition rewrites byte-for-byte
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 8 == 3), 1)
    return read_rank_generations(spark, tmp)


# Incremental store, built ONCE per (process, sf_dir) for the
# consumers below (the sim builds its own store so its replay stays
# inside the hashed state; the report reads the amortized artifact —
# the rank-store pattern of _ensure_rank_store).
_INC_STORE_CACHE: dict[str, str] = {}


def _ensure_inc_store(spark: SparkSession, sf_dir: str) -> str:
    key = dataset_cache_key(sf_dir)
    path = _INC_STORE_CACHE.get(key)
    if path is None:
        import tempfile

        from pyspark.sql import functions as F

        from ..streaming.graph_ingest import ingest_graph_batch

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        path = tempfile.mkdtemp(prefix="graph_inc_")
        ingest_graph_batch(
            spark, path, docs.where(F.col("doc_id") % 4 != 3), 0
        )
        ingest_graph_batch(
            spark, path, docs.where(F.col("doc_id") % 8 == 3), 1
        )
        ingest_graph_batch(
            spark, path, docs.where(F.col("doc_id") % 8 == 7), 2
        )
        _INC_STORE_CACHE[key] = path
    return path


@register(
    "pagerank_staleness_report",
    f"""
    WITH {_incremental_ctes()},
    {_pagerank_ctes()},
    exact_out AS (
      SELECT r.source, CAST(r.r AS BIGINT) AS rank_exact
      FROM rank{N_ITER} r
    ),
    counts AS (
      SELECT CAST((SELECT COUNT(*) FROM ed2) AS BIGINT) AS n_edges_incr,
             CAST((SELECT COUNT(*) FROM edges) AS BIGINT)
               AS n_edges_exact
    )
    SELECT i.source,
           i.rank_micro AS rank_incr,
           e.rank_exact,
           (i.rank_micro = e.rank_exact) AS ranks_equal,
           c.n_edges_incr, c.n_edges_exact
    FROM g2out i
    JOIN exact_out e ON e.source = i.source
    CROSS JOIN counts c
    """,
    description="the add-only contract's staleness MEASURED (the "
    "drift report of the graph family, mirroring "
    "ann_recall_after_churn): the incrementally-maintained generation "
    "2 ranks vs an exact full rebuild over the same corpus — "
    "per-source rank pair + equality flag + both edge-set sizes.  The "
    "divergence (edges kept after their shingle's df left [2,6], "
    "pairs never re-derived for untouched shingles) is exactly what a "
    "scheduled full rebuild repairs; this report is the gauge that "
    "schedules it.  Hash-stable because both engines replay both "
    "contracts exactly",
    tags=("graph", "evaluation", "incremental", "extension"),
)
def pagerank_staleness_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    store = _ensure_inc_store(spark, sf_dir)
    incr = (
        spark.read.parquet(f"{store}/ranks")
        .where(F.col("gen") == 2)
        .select("source", F.col("rank_micro").alias("rank_incr"))
    )
    # derive the exact edge set ONCE: it feeds both the exact rank and
    # the edge-count comparator, and its lineage is the full
    # corpus-sized shingle self-join (previously re-run per consumer).
    # pagerank_integer localCheckpoints its edges input anyway, so
    # checkpointing here just moves that materialization one level up
    # and lets the count reuse it.
    edges_exact = cocitation_edges(docs).localCheckpoint(eager=True)
    exact = pagerank_integer(
        docs.select("source").distinct(), edges_exact
    ).select("source", F.col("rank_micro").alias("rank_exact"))
    n_incr = (
        spark.read.parquet(f"{store}/edges")
        .select("src", "dst")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges_incr"))
    )
    n_exact = edges_exact.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges_exact")
    )
    return (
        incr.join(exact, "source")
        .withColumn(
            "ranks_equal", F.col("rank_incr") == F.col("rank_exact")
        )
        .crossJoin(F.broadcast(n_incr))
        .crossJoin(F.broadcast(n_exact))
    )


@register(
    "pagerank_rebuild_sim",
    f"""
    WITH {_incremental_ctes()},
    exsh AS (
      SELECT DISTINCT doc_id, source, g FROM ish WHERE b <= 1
    ),
    exrare AS (
      SELECT g FROM exsh GROUP BY g
      HAVING COUNT(*) BETWEEN {DF_MIN} AND {DF_MAX}
    ),
    expairs AS (
      SELECT DISTINCT a.source AS src, b2.source AS dst
      FROM exsh a JOIN exrare r ON r.g = a.g
      JOIN exsh b2 ON b2.g = a.g
      WHERE a.source <> b2.source
    ),
    ed2r AS (
      SELECT src, dst FROM expairs
      UNION
      SELECT src, dst FROM pr2
    ),
    {_rank_steps("g2r", "nd2", "ed2r")}
    SELECT CAST(0 AS INT) AS gen, source, rank_micro, out_deg, in_deg
    FROM g0out
    UNION ALL
    SELECT CAST(1 AS INT) AS gen, source, rank_micro, out_deg, in_deg
    FROM g1out
    UNION ALL
    SELECT CAST(2 AS INT) AS gen, source, rank_micro, out_deg, in_deg
    FROM g2rout
    """,
    description="the full-rebuild REPAIR composed with continued "
    "incremental serving (the graph family's refit_index, closing the "
    "loop pagerank_staleness_report's gauge schedules): base + one "
    "delta ingest incrementally (generations 0-1), a scheduled "
    "rebuild commits the EXACT as-of edge set under an immutable "
    "epoch (both add-only staleness modes corrected), the next delta "
    "ingests ON TOP of the epoch (serving = rebuilt ∪ later batches; "
    "its rank generation PINS the epoch via a marker written first), "
    "and that post-rebuild batch is REPLAYED — marker + as-of reads "
    "keep every partition byte-identical.  All three generations "
    "hash-checked against an oracle replaying exact-then-incremental "
    "composition",
    tags=("graph", "incremental", "streaming", "extension"),
)
def pagerank_rebuild_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.graph_ingest import (
        ingest_graph_batch,
        read_rank_generations,
        rebuild_graph_store,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tmp = tempfile.mkdtemp(prefix="graph_rebuild_")
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 4 != 3), 0)
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 8 == 3), 1)
    rebuild_graph_store(spark, tmp, epoch=1)
    d2 = docs.where(F.col("doc_id") % 8 == 7)
    ingest_graph_batch(spark, tmp, d2, 2)
    ingest_graph_batch(spark, tmp, d2, 2)  # replay past the rebuild
    return read_rank_generations(spark, tmp)


@register(
    "stream_graph_ingest",
    _incremental_oracle(),
    description="REAL Structured Streaming proof for the incremental "
    "graph family (the stream_rollup_cascade pattern applied to "
    "PageRank maintenance): the base/delta/delta document groups land "
    "as three files with ascending modification times, stream through "
    "maxFilesPerTrigger=1 into the foreachBatch graph sink — which "
    "keys every store write off the DATA's group id, not the "
    "trigger counter, because edge derivation is path-dependent and "
    "must not inherit the source's file-to-trigger accidents — and "
    "then the WHOLE stream reprocesses from a fresh checkpoint "
    "(every trigger replays; as-of reads + epoch markers keep each "
    "ingest byte-identical).  The three persisted rank generations "
    "must hash-equal the same incremental-contract oracle "
    "pagerank_incremental_sim replays",
    tags=("graph", "incremental", "streaming", "extension"),
)
def stream_graph_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming import await_or_raise
    from ..streaming.graph_ingest import (
        graph_ingest_sink,
        read_rank_generations,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    grp = (
        F.when(F.col("doc_id") % 4 != 3, F.lit(0))
        .when(F.col("doc_id") % 8 == 3, F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
    )
    tmp = tempfile.mkdtemp(prefix="stream_graph_")
    src = f"{tmp}/src"
    (
        docs.withColumn("grp", grp)
        .coalesce(1)
        .write.partitionBy("grp")
        .mode("overwrite")
        .parquet(src)
    )
    # pin the trigger ORDER: FileStreamSource batches by modification
    # time, so give each group's file an explicitly ascending mtime
    # (base must stay in the past so a reprocess sees them all at once
    # in the same order)
    base = os.path.getmtime(src) - 3600
    for g in (0, 1, 2):
        for f in glob.glob(f"{src}/grp={g}/*.parquet"):
            os.utime(f, (base + g, base + g))
    sink = graph_ingest_sink(f"{tmp}/store")
    for run in (1, 2):  # run 2 = full reprocess from a fresh checkpoint
        q = (
            spark.readStream.schema(
                "doc_id long, source string, text string, grp int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{tmp}/ckpt{run}")
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, 600)
    return read_rank_generations(spark, f"{tmp}/store")


@register(
    "graph_postings_compact_sim",
    f"""
    WITH {_incremental_ctes()},
    compact_ranks AS (
      SELECT CAST(0 AS INT) AS gen, source, rank_micro,
             out_deg, in_deg FROM g0out
      UNION ALL
      SELECT CAST(1 AS INT) AS gen, source, rank_micro,
             out_deg, in_deg FROM g1out
      UNION ALL
      SELECT CAST(2 AS INT) AS gen, source, rank_micro,
             out_deg, in_deg FROM g2out
    )
    SELECT r.*, CAST(2 AS BIGINT) AS n_live_parts
    FROM compact_ranks r
    """,
    description="manifest-committed postings compaction proven "
    "TRANSPARENT to the refresh (r14): the pagerank_incremental_sim "
    "ingest sequence with compact_postings(upto=2) folding batches "
    "0-1 into a frozen generation BEFORE batch 2's refresh — the "
    "delta edge derivation reads the frozen base exactly as it read "
    "the per-batch partitions, so all three rank generations "
    "hash-match the uncompacted replay; n_live_parts (computed from "
    "the table's actual partitions) pins that the fold really "
    "happened (frozen gen + batch 2 = 2).  The oracle is the plain "
    "incremental replay — compaction must be invisible to it",
    tags=("graph", "incremental", "compaction", "store", "extension"),
)
def graph_postings_compact_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.graph_ingest import (
        compact_postings,
        ingest_graph_batch,
        postings_table_name,
        read_rank_generations,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tmp = tempfile.mkdtemp(prefix="graph_compact_")
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 4 != 3), 0)
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 8 == 3), 1)
    compact_postings(spark, tmp, upto_batch_id=2)
    ingest_graph_batch(spark, tmp, docs.where(F.col("doc_id") % 8 == 7), 2)
    parts = (
        spark.table(postings_table_name(tmp))
        .select("batch_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_live_parts"))
    )
    return read_rank_generations(spark, tmp).crossJoin(F.broadcast(parts))
