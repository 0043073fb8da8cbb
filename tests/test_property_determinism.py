"""Property-based (hypothesis) tests: the determinism helpers must
agree with their SQL twins on arbitrary finite doubles within the
documented domain (|x| < 1e12 — beyond that the micro-unit
quantization would overflow the double->long floor)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from eventstream_fanout_spark.functions.core import (
    round_half_up,
    sql_dsum,
    sql_round_half_up,
)

finite_doubles = st.floats(
    allow_nan=False,
    allow_infinity=False,
    min_value=-1e12,
    max_value=1e12,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=40))
def test_round_half_up_property(spark, xs):
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["i", "x"])
    s_vals = [
        r["r"]
        for r in sdf.select("i", round_half_up(F.col("x"), 2).alias("r"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(xs)))
    d_vals = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_round_half_up('x', 2)} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert [repr(a) for a in s_vals] == [repr(b) for b in d_vals]


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=40))
def test_dsum_property(spark, xs):
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.functions.core import dsum

    sdf = spark.createDataFrame([(x,) for x in xs], ["x"])
    s = sdf.agg(dsum(F.col("x"), "s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    d = con.execute(f"SELECT {sql_dsum('x')} FROM t").fetchall()[0][0]
    assert repr(s) == repr(d)


@given(
    a=st.integers(min_value=0, max_value=2**32 - 1),
    flips=st.lists(st.integers(min_value=0, max_value=31), max_size=3,
                   unique=True),
)
@settings(max_examples=200, deadline=None)
def test_hamming_bands_pigeonhole(a, flips):
    """The banded simhash join's correctness argument, property-tested:
    any pair within Hamming distance max_hamming (here: <= 3 bit
    flips) MUST share at least one exact band — otherwise the
    candidate join would silently drop true near-dup pairs."""
    from eventstream_fanout_spark.operators.dedup import _hamming_bands

    b = a
    for f in flips:
        b ^= 1 << f
    bands = _hamming_bands(3)
    assert sum(w for _, w in bands) == 32
    shared = any(
        ((a >> off) & ((1 << w) - 1)) == ((b >> off) & ((1 << w) - 1))
        for off, w in bands
    )
    assert shared, (a, b, flips)


def _py_zorder(x: int, y: int, bits: int = 16) -> int:
    """Reference Morton interleave — the single Python model both
    z-order tests compare against."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    x=st.integers(min_value=0, max_value=2**16 - 1),
    y=st.integers(min_value=0, max_value=2**16 - 1),
)
@settings(max_examples=100, deadline=None)
def test_zorder_reference_roundtrip(x, y):
    """The reference interleave must be invertible: deinterleaving the
    even/odd bits recovers (x, y) exactly (sanity of the model the
    Spark comparison below relies on)."""
    z = _py_zorder(x, y)
    back_x = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    back_y = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (back_x, back_y) == (x, y)


def test_zorder_column_matches_reference(spark):
    """The REAL Column implementation (operators/warehouse.zorder_value)
    must equal the reference interleave on bit-boundary cases plus a
    seeded 200-pair sweep — one Spark job covers the whole batch."""
    import random

    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.warehouse import zorder_value

    rng = random.Random(42)
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (21845, 43690),
             (256, 255), (32768, 1)]
    cases += [
        (rng.randrange(2**16), rng.randrange(2**16)) for _ in range(200)
    ]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", zorder_value(F.col("x"), F.col("y"), 16).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_zorder(r["x"], r["y"]), (r["x"], r["y"], r["z"])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_bucket_prefix_global_order_property(ids):
    """The corpus_shuffle_order trick, pinned as pure algebra: because
    the bucket is a string PREFIX of the sort key, (bucket, key) order
    equals plain key order, so bucket-local ranks + cumulative bucket
    offsets reproduce the global ROW_NUMBER exactly — for ANY id set."""
    import hashlib

    keyed = sorted(
        (hashlib.md5(f"shuf:{i}".encode()).hexdigest(), i) for i in ids
    )
    global_pos = {i: p + 1 for p, (_, i) in enumerate(keyed)}

    # bucketed recomputation (what the Spark plan does)
    from collections import defaultdict

    buckets = defaultdict(list)
    for k, i in keyed:
        buckets[k[:2]].append((k, i))
    offset, recomputed = 0, {}
    for b in sorted(buckets):
        for rn, (_, i) in enumerate(sorted(buckets[b]), start=1):
            recomputed[i] = offset + rn
        offset += len(buckets[b])
    assert recomputed == global_pos


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),   # doc_id
            st.integers(min_value=0, max_value=3),    # band
            st.integers(min_value=0, max_value=2),    # bucket value
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(min_value=1, max_value=10),  # hot cap
    st.integers(min_value=2, max_value=5),   # n_salts
)
def test_salted_bucket_pairs_lossless_property(spark, rows, cap, n_salts):
    """For ANY banded relation, hot cap, and salt count, the salted
    self-join must produce exactly the unsalted join's multiset: one
    row per (bucket, pair) — a pair sharing k buckets appears k times,
    exactly as the plain equi-join emits it (hypothesis found the
    multi-bucket case in round 6; the old expectation deduped pairs
    globally and wrongly demanded once-TOTAL).  Losslessness of the
    skew fix = salted output == unsalted output, nothing less, nothing
    more."""
    from pyspark.sql import functions as F

    from eventstream_fanout_spark.operators.dedup import (
        _salted_bucket_pairs,
    )

    banded = spark.createDataFrame(
        [(d, b, str(v)) for d, b, v in rows],
        "doc_id long, band int, bh string",
    )
    from collections import Counter

    expected: Counter = Counter()
    by_bucket: dict = {}
    for d, b, v in rows:
        by_bucket.setdefault((b, v), []).append(d)
    for members in by_bucket.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                expected[(ms[i], ms[j])] += 1

    got = (
        _salted_bucket_pairs(
            banded, ["band", "bh"], "doc_id", hot_cap=cap, n_salts=n_salts
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .collect()
    )
    pairs = [(r["da"], r["db"]) for r in got]
    assert Counter(pairs) == expected  # one row per (bucket, pair)
