"""Deduplication operator family for training-data pipelines
(north-star surface, BASELINE.json): exact, MinHash+LSH, SimHash, and
exact n-gram Jaccard verification.

Scale design (the point of each variant):

* **exact**: one hash-groupBy shuffle on md5(content).  At 100 TB the
  md5 key distributes uniformly — no skew; partial aggregation applies.
* **MinHash+LSH**: signatures are a single pass over exploded shingles
  (map-side combinable mins); candidate generation joins docs only
  within equal (band, band_hash) buckets — the shuffle key is the band
  hash, so cost is sum of bucket sizes squared, not n².  This is the
  scale path that replaces the exact-Jaccard self-join.
* **SimHash**: 32 aggregate expressions in one pass; near-dup pairs via
  Hamming distance on a 32-bit int — pair generation can bucket on
  rotated bit-slices at scale (here: threshold filter after LSH-style
  self-join on simhash prefix).
* **exact n-gram Jaccard**: the ground-truth verifier — an
  explode-and-join on shingles.  Quadratic in hot shingles; used to
  verify LSH candidates, never as the primary pairing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_BANDS,
    NUM_MINHASHES,
    SIMHASH_BITS,
    band_hash,
    minhash_hash_cols,
    minhash_min_aggs,
    shingles,
    tokens,
)


def with_duplicates_injected(
    docs: DataFrame, modulus: int = 7, id_offset: int = 100_000
) -> DataFrame:
    """Deterministically re-inject every ``modulus``-th doc as an exact
    copy with a shifted id — gives the dedup operators real duplicate
    groups to find on corpora that have none (test fixture; both the
    Spark query and the SQL oracle apply the same injection)."""
    copies = docs.where(F.col("doc_id") % modulus == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(id_offset)
    )
    return docs.unionByName(copies)


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with
    the canonical (min) id and the copy count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def doc_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word-3-gram shingles per doc.

    Tokens are materialized as a column first: inlining the split into
    the shingle lambda makes every element_at re-split the text —
    O(tokens^2) per doc (measured 3-4x slower at sf0.1).
    """
    toked = docs.select("doc_id", tokens(F.col(text_col)).alias("toks"))
    return toked.select(
        "doc_id", F.explode(shingles(F.col("toks"))).alias("shingle")
    ).distinct()


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """MinHash signature (NUM_MINHASHES min-of-hash-slice columns) per
    doc; the salted md5s are materialized once per shingle, then sliced."""
    sh = doc_shingles(docs, text_col)
    for name, col in minhash_hash_cols(F.col("shingle")):
        sh = sh.withColumn(name, col)
    return sh.groupBy("doc_id").agg(*minhash_min_aggs())


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.
    The join key is (band, band_hash) — bucket-local, never all-pairs."""
    rows_per_band = NUM_MINHASHES // LSH_BANDS
    bands = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_hash(b, rows_per_band).alias("bh"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    doc_shingle_df: DataFrame, min_jaccard: float
) -> DataFrame:
    """Exact shingle-set Jaccard for every co-shingled pair, filtered to
    >= min_jaccard.  Quantized to 6 decimals deterministically."""
    sizes = doc_shingle_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    a = doc_shingle_df.alias("a")
    b = doc_shingle_df.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    jac = (
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(min_jaccard))
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def simhash_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc: per-bit signed sums over token
    occurrences (one pass, 32 aggregate expressions)."""
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))  # hash once, slice 32 times
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum((F.ascii(F.substring(F.col("h"), k + 1, 1)) % 2) * 2 - 1).alias(
                f"s_{k}"
            )
            for k in range(SIMHASH_BITS)
        ]
    )
    value = None
    for k in range(SIMHASH_BITS):
        term = F.when(F.col(f"s_{k}") > 0, F.lit(2**k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        value = term if value is None else value + term
    return bit_sums.select("doc_id", value.alias("simhash"))


def simhash_near_pairs(sim: DataFrame, max_hamming: int) -> DataFrame:
    """Pairs with Hamming distance <= threshold on the 32-bit simhash."""
    a = sim.alias("a")
    b = sim.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
    )
