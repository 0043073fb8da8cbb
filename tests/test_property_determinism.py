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
