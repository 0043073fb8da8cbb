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
  Hamming distance on a 32-bit int — pair generation slices the code
  into ``max_hamming + 1`` bit-bands and equi-joins on
  (band_idx, band_bits): by pigeonhole every qualifying pair shares an
  exact band, so the candidate set is bucket-local (lossless), and the
  exact Hamming filter runs only on candidates.
* **exact n-gram Jaccard**: the ground-truth verifier — computes exact
  Jaccard ONLY for supplied candidate pairs (from LSH); the
  free-running all-co-shingled-pairs form is quadratic in hot shingles
  and deliberately not exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


# Hot-bucket salting knobs (PERF.md: 30x max/mean band-bucket skew at
# sf0.1; on a real corpus a degenerate band value concentrates a
# super-linear share of candidate pairs in one task).  Buckets larger
# than HOT_BUCKET_CAP are split into HOT_BUCKET_SALTS sub-tasks.
HOT_BUCKET_CAP = 1_000
HOT_BUCKET_SALTS = 8


def _salted_bucket_pairs(
    banded: DataFrame,
    keys: list[str],
    id_col: str,
    hot_cap: int = HOT_BUCKET_CAP,
    n_salts: int = HOT_BUCKET_SALTS,
) -> DataFrame:
    """Self-join ``banded`` within equal-``keys`` buckets, producing the
    ordered pair columns ``a.* / b.*`` — with buckets larger than
    ``hot_cap`` salted into ``n_salts`` sub-tasks.

    Lossless skew split: the left side gets a computed salt
    ``xxhash64(id) % n_salts``; the right side is replicated once per
    salt (only inside hot buckets), so every qualifying pair meets on
    exactly one salt value and the result set is IDENTICAL to the
    unsalted join.  Non-hot buckets pay zero replication, and the join
    stays a pure equi-join on (keys..., salt) — no BNLJ,
    AQE-independent, deterministic.

    Bucket sizes come from a count window over the banded rows
    themselves (partitioned on the join keys) — NOT a separate
    aggregate-and-broadcast-join subtree, which would recompute the
    (expensive) upstream signature pipeline a third time and taxed the
    no-hot-bucket common case ~1.4x at sf0.1.  The window's shuffle is
    the same keys-partitioning the join needs anyway; counting a hot
    bucket is O(n) — it is the pairing, not the counting, that
    salting bounds."""
    wn = Window.partitionBy(*keys)
    sized = banded.withColumn("_bn", F.count(F.lit(1)).over(wn))
    ns = F.when(F.col("_bn") > hot_cap, F.lit(n_salts)).otherwise(F.lit(1))
    a = sized.withColumn(
        "_salt",
        F.when(
            F.col("_bn") > hot_cap,
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("_bn")
    b = sized.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("int"), (ns - F.lit(1)).cast("int"))
        ),
    ).drop("_bn")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a._salt") == F.col("b._salt")
    )
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return a.alias("a").join(b.alias("b"), cond)


def banded_signatures(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, bh) — one row per LSH band per doc."""
    rows_per_band = NUM_MINHASHES // LSH_BANDS
    return signatures.select(
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


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.
    The join key is (band, band_hash) — bucket-local, never all-pairs;
    buckets above HOT_BUCKET_CAP are salt-split (lossless, see
    :func:`_salted_bucket_pairs`)."""
    bands = banded_signatures(signatures)
    return (
        _salted_bucket_pairs(bands, ["band", "bh"], "doc_id")
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify_candidates(
    doc_shingle_df: DataFrame, candidates: DataFrame, min_jaccard: float
) -> DataFrame:
    """Exact shingle-set Jaccard computed ONLY for the supplied
    ``candidates`` (doc_a, doc_b) pairs — the LSH-verifier composition.

    Scale shape: the shingle self-join is restricted to candidate rows
    (two equi-joins keyed by doc id), so cost is
    O(|candidates| * shingles-per-doc), never quadratic in hot
    shingles.  Use after :func:`lsh_candidate_pairs`."""
    sizes = doc_shingle_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    sh_a = doc_shingle_df.select(
        F.col("doc_id").alias("doc_a"), "shingle"
    )
    sh_b = doc_shingle_df.select(
        F.col("doc_id").alias("doc_b"), "shingle"
    )
    inter = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
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
    occurrences.

    Occurrences are pre-aggregated to (doc, token, count) so the md5 +
    32 bit-extractions run once per DISTINCT token per doc, and each
    bit contributes ``count * (bit*2 - 1)`` — the same integer sums by
    commutative regrouping (the SQL oracle keeps the occurrence-level
    formulation), but on Zipf-distributed text the expression work
    drops by the dup factor (~6x on the test corpus)."""
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    )
    cnts = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.md5(F.col("tok")))  # hash once, slice 32 times
    )
    bit_sums = cnts.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("cnt")
                * ((F.ascii(F.substring(F.col("h"), k + 1, 1)) % 2) * 2 - 1)
            ).alias(f"s_{k}")
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


def _hamming_bands(max_hamming: int, bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """(offset, width) slices covering ``bits`` bits in ``max_hamming+1``
    contiguous bands.  Pigeonhole: two codes within Hamming distance
    ``max_hamming`` differ in at most ``max_hamming`` bands, so they
    agree EXACTLY on at least one of the ``max_hamming+1`` bands —
    candidate generation by band equi-join is lossless."""
    n_bands = max_hamming + 1
    base, extra = divmod(bits, n_bands)
    out, off = [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_near_pairs(
    sim: DataFrame,
    max_hamming: int,
    hot_cap: int | None = None,
    n_salts: int | None = None,
) -> DataFrame:
    """Pairs with Hamming distance <= threshold on the 32-bit simhash.

    Scale path: NOT an all-pairs join.  The code is sliced into
    ``max_hamming + 1`` bit-bands; by pigeonhole any qualifying pair
    shares >= 1 exact band, so candidates come from an equi-join on
    (band_idx, band_bits) — shuffle-partitioned by band bucket, cost
    sum-of-bucket² like MinHash-LSH — then the exact Hamming filter
    runs only on candidates.

    The bucket join's posture is MEASURED, not static (r13 verdict
    item 8 — adaptive_bucket_pairs extended from the LSH band join):
    the banded relation is checkpointed once, its largest bucket read
    back (1-row planning collect), and the join salts only when the
    measurement exceeds ``hot_cap`` — a duplicate-heavy corpus (every
    copy shares all bands) gets the lossless 8-way split, a clean
    corpus pays no salt explode at all."""
    df, _salted, _max_cnt = simhash_near_pairs_measured(
        sim, max_hamming, hot_cap, n_salts
    )
    return df


def simhash_banded(sim: DataFrame, max_hamming: int) -> DataFrame:
    """The pigeonhole bit-band relation of a simhash set:
    (doc_id, simhash, band_idx, band_bits), eagerly checkpointed so
    the posture measurement and the join read it once."""
    bands = _hamming_bands(max_hamming)
    return sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("simhash"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("band_bits"),
                    )
                    for i, (off, w) in enumerate(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "simhash", "bb.band_idx", "bb.band_bits"
    ).localCheckpoint(eager=True)


def simhash_near_pairs_measured(
    sim: DataFrame,
    max_hamming: int,
    hot_cap: int | None = None,
    n_salts: int | None = None,
) -> tuple[DataFrame, bool, int]:
    """:func:`simhash_near_pairs` plus the posture facts —
    (pairs_df, salted?, measured max bucket) — for callers that
    surface the decision itself (skew_adaptive_simhash_hot)."""
    from .diagnostics import adaptive_bucket_pairs

    banded = simhash_banded(sim, max_hamming)
    pairs, salted, max_cnt = adaptive_bucket_pairs(
        banded, ["band_idx", "band_bits"], "doc_id", hot_cap, n_salts
    )
    cand = (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select("doc_a", "doc_b", "hamming"),
        salted,
        max_cnt,
    )
