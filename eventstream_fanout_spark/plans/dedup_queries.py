"""Dedup query family over ``documents`` with full DuckDB oracles.

The injected-duplicates fixture (every 7th doc re-added with a shifted
id) appears identically in the Spark query and the SQL oracle, giving
the operators real duplicate groups to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_BANDS,
    NUM_MINHASHES,
    SIMHASH_BITS,
    sql_band_hash,
    sql_minhash_hash_cols,
    sql_minhash_min_aggs,
    sql_shingles,
    sql_simhash_bit,
    sql_tokens,
)
from ..operators.dedup import (
    HOT_BUCKET_CAP,
    HOT_BUCKET_SALTS,
    doc_shingles,
    exact_dedup_groups,
    jaccard_verify_candidates,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_docs,
    simhash_near_pairs,
    with_duplicates_injected,
)
from ..sources.tables import load_table
from .registry import register

_INJECTED = """
  injected AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  )
"""

_SHINGLED = f"""
  toks AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
  ),
  shingled AS (
    SELECT DISTINCT doc_id, unnest({sql_shingles('toks')}) AS shingle FROM toks
  )
"""

# Shared signature CTE chain: shingles -> materialized salted md5s ->
# min-of-slice signature (mirrors operators/dedup.minhash_signatures).
_SIG_CTES = f"""{_SHINGLED},
  hashed AS (
    SELECT doc_id, {sql_minhash_hash_cols('shingle')} FROM shingled
  ),
  sig AS (
    SELECT doc_id, {sql_minhash_min_aggs()} FROM hashed GROUP BY doc_id
  )
"""


@register(
    "dedup_exact",
    f"""
    WITH {_INJECTED}
    SELECT md5(text) AS content_md5,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM injected
    GROUP BY 1
    """,
    description="exact dedup by content hash over documents + injected "
    "duplicate copies (hash-groupBy; uniform key, no skew at scale)",
    tags=("dedup", "extension"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_dedup_groups(with_duplicates_injected(docs))


@register(
    "minhash_signatures",
    f"""
    WITH {_SIG_CTES}
    SELECT * FROM sig
    """,
    description="16-hash MinHash signatures over word-3-gram shingles "
    "(4 salted md5s sliced into 16 32-bit slots; single pass, "
    "map-side combinable)",
    tags=("dedup", "minhash", "extension"),
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_signatures(docs)


_ROWS_PER_BAND = NUM_MINHASHES // LSH_BANDS
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, {sql_band_hash(b, _ROWS_PER_BAND)} AS bh FROM sig"
    for b in range(LSH_BANDS)
)


@register(
    "minhash_lsh_pairs",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    """,
    description="MinHash-LSH near-dup candidate pairs (4 bands x 4 rows; "
    "join only within equal band buckets — the n² -> bucket-local scale path)",
    tags=("dedup", "minhash", "lsh", "extension"),
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return lsh_candidate_pairs(minhash_signatures(docs))


@register(
    "lsh_bucket_stats",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    sizes AS (
      SELECT band, bh, CAST(COUNT(*) AS BIGINT) AS n
      FROM bands GROUP BY band, bh
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(n) AS BIGINT) AS total_band_rows,
           CAST(SUM(CASE WHEN n > {HOT_BUCKET_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot,
           CAST(MAX(CASE WHEN n > {HOT_BUCKET_CAP}
                     THEN (n + {HOT_BUCKET_SALTS - 1}) // {HOT_BUCKET_SALTS}
                     ELSE n END)
                AS BIGINT) AS max_task_rows
    FROM sizes
    """,
    description="LSH band-bucket skew report — the salting evidence "
    "query (VERDICT r3 item 3): bucket count, max/total bucket sizes, "
    "hot-bucket count (> HOT_BUCKET_CAP=1000) and the EVEN-SPLIT "
    "per-task left-side row count after the 8-way salt "
    "(ceil(n/8) inside hot buckets).  max_task_rows is the idealized "
    "even split; the actual largest xxhash64%8 cell is multinomial "
    "around it (typically within a few percent for n >> 8), so read "
    "it as the expected task size the salt enforces, not a hard "
    "ceiling — what IS hard is that one task never sees the whole "
    "bucket again",
    tags=("dedup", "lsh", "skew", "extension"),
)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import banded_signatures

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sizes = (
        banded_signatures(minhash_signatures(docs))
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    task_rows = F.when(
        F.col("n") > HOT_BUCKET_CAP,
        F.expr(f"(n + {HOT_BUCKET_SALTS - 1}) div {HOT_BUCKET_SALTS}"),
    ).otherwise(F.col("n"))
    return sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.sum("n").cast("bigint").alias("total_band_rows"),
        F.sum((F.col("n") > HOT_BUCKET_CAP).cast("long"))
        .cast("bigint")
        .alias("n_hot"),
        F.max(task_rows).cast("bigint").alias("max_task_rows"),
    )


@register(
    "ngram_jaccard_dups",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shingled a ON a.doc_id = c.doc_a
      JOIN shingled b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           (CAST(i.n_common AS DOUBLE)
            / CAST(sa.n + sb.n - i.n_common AS DOUBLE)) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE (CAST(i.n_common AS DOUBLE)
           / CAST(sa.n + sb.n - i.n_common AS DOUBLE)) >= 0.3
    """,
    description="exact word-3-gram Jaccard >= 0.3, computed ONLY for "
    "MinHash-LSH candidate pairs (the verifier composition: cost "
    "O(|candidates| x shingles/doc), never quadratic in hot shingles)",
    tags=("dedup", "jaccard", "lsh", "extension"),
)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cand = lsh_candidate_pairs(minhash_signatures(docs))
    return jaccard_verify_candidates(doc_shingles(docs), cand, 0.3)


_SIMHASH_SUMS = ", ".join(
    f"SUM({sql_simhash_bit('tok', k)} * 2 - 1) AS s_{k}"
    for k in range(SIMHASH_BITS)
)
_SIMHASH_VALUE = " + ".join(
    f"(CASE WHEN s_{k} > 0 THEN CAST({2**k} AS BIGINT) ELSE 0 END)"
    for k in range(SIMHASH_BITS)
)

_SIMHASH_CTE = f"""
  toked AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
  ),
  bitsums AS (
    SELECT doc_id, {_SIMHASH_SUMS} FROM toked GROUP BY doc_id
  ),
  sim AS (
    SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM bitsums
  )
"""


@register(
    "simhash_docs",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sim
    """,
    description="32-bit SimHash per document (signed per-bit sums over "
    "token occurrences, one aggregation pass)",
    tags=("dedup", "simhash", "extension"),
)
def simhash_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_docs(docs)


@register(
    "simhash_near_pairs",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    description="SimHash near-dup pairs at Hamming distance <= 3 (the "
    "standard simhash near-dup radius). Spark plan: pigeonhole bit-band "
    "equi-join candidates + exact Hamming filter — lossless, "
    "bucket-local with 8-bit bands (4 bands x 256 values -> selective "
    "buckets; at Hamming 6 the 4.5-bit bands were ~14x less selective, "
    "measured 10.6 s -> see PERF.md); oracle states the all-pairs "
    "semantics the banded plan must reproduce",
    tags=("dedup", "simhash", "extension"),
)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_near_pairs(simhash_docs(docs), 3)


@register(
    "neardup_edit_distance_verify",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
           (1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
                  / CAST(greatest(length(da.text), length(db.text))
                         AS DOUBLE)) AS edit_sim
    FROM cand c
    JOIN documents da ON da.doc_id = c.doc_a
    JOIN documents db ON db.doc_id = c.doc_b
    """,
    description="character-level verification of LSH near-dup "
    "candidates: exact Levenshtein distance + normalized similarity "
    "for every candidate pair — the third verifier signal beside "
    "n-gram Jaccard and cosine. Candidate-scoped by construction "
    "(edit distance is O(len²) per pair, so it must NEVER free-run "
    "over all pairs; the LSH equi-join bounds the pair count), "
    "equi-joined back to text by doc id",
    tags=("dedup", "verify", "extension"),
)
def neardup_edit_distance_verify(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(
        minhash_signatures(docs.select("doc_id", "text"))
    ).select("doc_a", "doc_b").distinct()
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")
    )
    dist = F.levenshtein(F.col("ta"), F.col("tb"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.cast("bigint").alias("edit_dist"),
            (
                F.lit(1.0)
                - dist.cast("double")
                / F.greatest(F.length("ta"), F.length("tb")).cast(
                    "double"
                )
            ).alias("edit_sim"),
        )
    )


_MH_MATCH_SUM = " + ".join(
    f"(CASE WHEN sa.mh_{h} = sb.mh_{h} THEN 1 ELSE 0 END)"
    for h in range(NUM_MINHASHES)
)


@register(
    "minhash_accuracy_report",
    f"""
    WITH {_SIG_CTES},
    bands AS ({_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN shingled s1 ON s1.doc_id = c.doc_a
      JOIN shingled s2 ON s2.doc_id = c.doc_b
                      AND s2.shingle = s1.shingle
      GROUP BY 1, 2
    ),
    est AS (
      SELECT c.doc_a, c.doc_b,
             (CAST({_MH_MATCH_SUM} AS DOUBLE)
              / {float(NUM_MINHASHES)!r}) AS est_jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           (CAST(i.n_common AS DOUBLE)
            / CAST(za.n + zb.n - i.n_common AS DOUBLE)) AS exact_jaccard,
           e.est_jaccard,
           ABS(e.est_jaccard
               - (CAST(i.n_common AS DOUBLE)
                  / CAST(za.n + zb.n - i.n_common AS DOUBLE))) AS abs_err
    FROM inter i
    JOIN est e ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    """,
    description="MinHash sketch accuracy, made a first-class result "
    "(the dedup counterpart of ann_recall_report): for every LSH "
    "candidate pair, the signature-agreement Jaccard estimate next to "
    "the exact shingle-set Jaccard and the absolute error — E[est] = "
    "exact with sd <= 1/sqrt(16); everything md5-deterministic so "
    "even the error column hash-matches the oracle",
    tags=("dedup", "accuracy", "extension"),
)
def minhash_accuracy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = minhash_signatures(docs)
    cand = lsh_candidate_pairs(sig).select("doc_a", "doc_b").distinct()
    sh = doc_shingles(docs)
    exact = jaccard_verify_candidates(sh, cand, 0.0).select(
        "doc_a", "doc_b", F.col("jaccard").alias("exact_jaccard")
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{h}").alias(f"a{h}") for h in range(NUM_MINHASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{h}").alias(f"b{h}") for h in range(NUM_MINHASHES)],
    )
    matches = None
    for h in range(NUM_MINHASHES):
        term = (F.col(f"a{h}") == F.col(f"b{h}")).cast("int")
        matches = term if matches is None else matches + term
    est = (matches.cast("double") / F.lit(float(NUM_MINHASHES))).alias(
        "est_jaccard"
    )
    return (
        exact.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "exact_jaccard",
            est,
            F.abs(
                (matches.cast("double") / F.lit(float(NUM_MINHASHES)))
                - F.col("exact_jaccard")
            ).alias("abs_err"),
        )
    )


_SPAN_K = 8  # duplicated token-run threshold (the ExactSubstr dial)


@register(
    "exact_substring_spans",
    f"""
    WITH toked AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             generate_subscripts({sql_shingles('toks', _SPAN_K)}, 1) AS pos,
             md5(unnest({sql_shingles('toks', _SPAN_K)})) AS h
      FROM toked
    ),
    dup AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    flagged AS (
      SELECT s.doc_id, s.pos FROM sh s JOIN dup d ON d.h = s.h
    ),
    brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) > {_SPAN_K}
                  THEN 1 ELSE 0 END AS b
      FROM flagged
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM brk
    ),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e
      FROM isl GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_dup_spans,
             CAST(SUM(e - s + {_SPAN_K}) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY 1
    )
    SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_dup_spans, 0) AS INTEGER) AS n_dup_spans,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CASE WHEN len(t.toks) > 0
                THEN CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
                     / CAST(len(t.toks) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS dup_ratio
    FROM toked t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    """,
    description="exact duplicated-substring SPAN report (the "
    "ExactSubstr-dedup family, Lee et al.'s 'Deduplicating Training "
    f"Data' operator re-expressed Spark-first): every {_SPAN_K}-token "
    "run is shingled at every position (no stride, no sampling — "
    "alignment-robust and exhaustive by construction), runs appearing "
    "in >= 2 distinct docs flag their positions, and per-doc "
    "gaps-and-islands merging (windows whose starts differ by <= "
    f"{_SPAN_K} cover a contiguous token range) yields MAXIMAL "
    "duplicated spans — per doc: span count, duplicated-token "
    "coverage, and the dup ratio a filtering policy thresholds on.  "
    "Scale shape: rows = tokens per doc (the tf/postings explode "
    "factor), the only shuffles are the shingle-hash groupBy and an "
    "equi-join back on the hash (bucket-local, the suffix-array "
    "replacement that distributes), islands are doc-local windows",
    tags=("dedup", "text", "quality", "extension"),
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import shingles, tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toked.select(
        "doc_id",
        F.posexplode(shingles(F.col("toks"), _SPAN_K)).alias("pos", "g"),
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), F.md5("g").alias("h"))
    dup = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    flagged = sh.join(dup, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = flagged.withColumn(
        "b",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > _SPAN_K, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    isl = brk.withColumn("island", F.sum("b").over(w))
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + F.lit(_SPAN_K))
        .cast("bigint")
        .alias("dup_tokens"),
    )
    base = toked.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_tokens")
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("int").alias(
            "n_dup_spans"
        ),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias(
            "dup_tokens"
        ),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0).cast("double"))
        .alias("dup_ratio"),
    )


def _dup_token_spans(docs: DataFrame):
    """(toked, spans): the maximal duplicated-run spans of
    :func:`exact_substring_spans`, shared with the CUT step below.
    ``spans`` rows are (doc_id, s, e) over 1-based shingle start
    positions; the covered token range is [s, e + K - 1]."""
    from pyspark.sql import Window

    from ..functions.hashing import shingles, tokens

    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = toked.select(
        "doc_id",
        F.posexplode(shingles(F.col("toks"), _SPAN_K)).alias("pos", "g"),
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), F.md5("g").alias("h"))
    dup = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    flagged = sh.join(dup, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = flagged.withColumn(
        "b",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > _SPAN_K, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("b").over(w))
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    return toked, spans


_CUT_SPAN_CTES = f"""
    toked AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             generate_subscripts({sql_shingles('toks', _SPAN_K)}, 1) AS pos,
             md5(unnest({sql_shingles('toks', _SPAN_K)})) AS h
      FROM toked
    ),
    dup AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    flagged AS (
      SELECT s.doc_id, s.pos FROM sh s JOIN dup d ON d.h = s.h
    ),
    brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) > {_SPAN_K}
                  THEN 1 ELSE 0 END AS b
      FROM flagged
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM brk
    ),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e
      FROM isl GROUP BY 1, 2
    )
"""


@register(
    "exact_substring_dedup_cut",
    f"""
    WITH {_CUT_SPAN_CTES},
    tokpos AS (
      SELECT doc_id, generate_subscripts(toks, 1) AS pos,
             unnest(toks) AS tok
      FROM toked
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM tokpos t
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = t.doc_id
          AND t.pos BETWEEN sp.s AND sp.e + {_SPAN_K} - 1
      )
    ),
    cleaned AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY 1
    )
    SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
           COALESCE(c.clean_md5, md5('')) AS clean_md5
    FROM toked t LEFT JOIN cleaned c ON c.doc_id = t.doc_id
    """,
    description="the ExactSubstr dedup FIX step (the removal half of "
    "Lee et al.'s operator — exact_substring_spans finds, this CUTS): "
    "every token covered by a cross-doc duplicated maximal span is "
    "removed from EVERY copy, and the surviving tokens re-assemble in "
    "position order into the cleaned token stream — hash-checked via "
    "its md5 plus kept/total counts per doc (a fully-duplicated doc "
    "cleans to the empty stream).  Scale shape: the span chain's two "
    "bucket-local shuffles plus one doc_id-equi ANTI join (token "
    "positions vs their doc's span ranges — spans per doc are few) "
    "and a doc-local ordered re-assembly; no all-pairs anywhere",
    tags=("dedup", "text", "quality", "extension"),
)
def exact_substring_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toked, spans = _dup_token_spans(docs)
    tokpos = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), "tok")
    t, sp = tokpos.alias("t"), spans.alias("sp")
    kept = t.join(
        sp,
        (F.col("t.doc_id") == F.col("sp.doc_id"))
        & (F.col("t.pos") >= F.col("sp.s"))
        & (F.col("t.pos") <= F.col("sp.e") + F.lit(_SPAN_K - 1)),
        "left_anti",
    )
    cleaned = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda st: st.getField("tok"),
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    base = toked.select(
        "doc_id", F.size("toks").cast("bigint").alias("n_tokens")
    )
    return base.join(cleaned, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_tokens_kept"), F.lit(0)).cast("bigint").alias(
            "n_tokens_kept"
        ),
        F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
    )
