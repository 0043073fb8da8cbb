"""Scalar-function coverage queries (SURVEY.md §2.8 plus the breadth a
complete engine needs): string, date/time, math, and array functions,
each verified against the DuckDB oracle.

Determinism notes: transcendental functions (exp/ln/pow) are avoided in
oracle queries — libm results differ across engines; sqrt is
IEEE-defined and safe.  Day-of-week is avoided (engines disagree on
numbering conventions); year/month/day/hour extraction is portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "string_functions",
    """
    SELECT doc_id,
           upper(substr(text, 1, 12)) AS prefix_upper,
           length(text) AS n_chars,
           replace(substr(text, 1, 30), ' ', '_') AS snake,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           (text LIKE '%data%') AS mentions_data,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '', 'g') AS devoweled,
           levenshtein(substr(text, 1, 10), 'spark query') AS lev_to_spark,
           concat(source, ':', lang) AS source_lang
    FROM documents
    """,
    description="string function family: case, substr, replace, pad, "
    "LIKE, regexp_replace, levenshtein, concat",
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("prefix_upper"),
        F.length("text").alias("n_chars"),
        F.replace(
            F.substring("text", 1, 30), F.lit(" "), F.lit("_")
        ).alias("snake"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.col("text").like("%data%").alias("mentions_data"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "").alias(
            "devoweled"
        ),
        F.levenshtein(F.substring("text", 1, 10), F.lit("spark query")).alias(
            "lev_to_spark"
        ),
        F.concat("source", F.lit(":"), "lang").alias("source_lang"),
    )


@register(
    "datetime_functions",
    """
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(minute(ts) AS INTEGER) AS mi,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
           ts + INTERVAL 90 MINUTE AS ts_plus_90m,
           CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS INTEGER)
             AS days_since_start,
           strftime(ts, '%Y-%m-%d') AS ymd
    FROM events
    """,
    description="date/time family: component extraction, trunc, interval "
    "arithmetic, day difference, formatting",
    tags=("scalar", "datetime"),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("days_since_start"),
        F.date_format("ts", "yyyy-MM-dd").alias("ymd"),
    )


@register(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0) AS dist_from_50k,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_side,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(l_orderkey % 16 AS BIGINT) AS shard
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    description="math family: abs, ceil/floor, sqrt (IEEE-safe), sign, "
    "greatest/least, modulo sharding",
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 100 == 0
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_50k"),
        F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000.0)
        .cast("bigint")
        .alias("price_k"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_side"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        (F.col("l_orderkey") % 16).cast("bigint").alias("shard"),
    )


@register(
    "array_functions",
    """
    WITH toked AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks))[1:5], ',')
             AS first5_sorted,
           list_contains(toks, 'data') AS has_data,
           toks[1] AS first_token,
           toks[len(toks)] AS last_token,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS top3_csv
    FROM toked
    """,
    description="array family: size, distinct, sort, slice, contains, "
    "element access, join-to-string",
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    )
    sorted_distinct = F.array_sort(F.array_distinct(F.col("toks")))
    return toked.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.array_join(F.slice(sorted_distinct, 1, 5), ",").alias(
            "first5_sorted"
        ),
        F.array_contains("toks", "data").alias("has_data"),
        F.element_at("toks", 1).alias("first_token"),
        F.element_at("toks", -1).alias("last_token"),
        F.array_join(F.slice(sorted_distinct, 1, 3), ",").alias("top3_csv"),
    )


@register(
    "frame_functions",
    """
    SELECT event_id, user_id, ts, value,
           first_value(value) OVER w AS first_in_user,
           last_value(value) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND UNBOUNDED FOLLOWING)
             AS last_in_user,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    description="frame functions: first/last value with explicit frames, "
    "percent_rank, cume_dist",
    tags=("scalar", "window-fn"),
)
def frame_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.first("value").over(w).alias("first_in_user"),
        F.last("value").over(wfull).alias("last_in_user"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "json_nested_roundtrip",
    """
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS id_back,
           value * 2.0 AS arr_second,
           event_type AS inner_type
    FROM events
    """,
    description="nested JSON construction + path extraction: to_json of "
    "struct{id, arr[2], inner{type}} then get_json_object paths back — "
    "must be the identity (oracle computes expected values directly)",
    tags=("scalar", "json"),
)
def json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.array(F.col("value"), F.col("value") * 2.0).alias("arr"),
            F.struct(F.col("event_type").alias("type")).alias("inner"),
        )
    )
    built = e.select("event_id", doc.alias("doc"))
    return built.select(
        "event_id",
        F.get_json_object("doc", "$.id").alias("id_back"),
        F.get_json_object("doc", "$.arr[1]").cast("double").alias("arr_second"),
        F.get_json_object("doc", "$.inner.type").alias("inner_type"),
    )


@register(
    "dq_expectation_profile",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN event_type IN
                 ('click','view','purchase','signup','error')
               THEN 1 ELSE 0 END) AS BIGINT) AS pass_event_type_enum,
           CAST(SUM(CASE WHEN value IS NOT NULL AND value >= 0.0
               THEN 1 ELSE 0 END) AS BIGINT) AS pass_value_nonnegative,
           CAST(SUM(CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS pass_ts_present,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS pass_props_has_k,
           CAST(SUM(CASE WHEN event_type IN
                 ('click','view','purchase','signup','error')
                AND (value IS NOT NULL AND value >= 0.0)
                AND ts IS NOT NULL
                AND json_extract_string(props, '$.k') IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
    FROM events
    """,
    description="data-quality expectation profile — the engine-side "
    "CHECK-constraint analogue (reference enum CHECKs, "
    "sql/00_init_schema.sql:5,13): per-expectation pass counts in one pass",
    tags=("scalar", "quality", "reference"),
)
def dq_expectation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import expectation_profile

    e = load_table(spark, sf_dir, "events")
    return expectation_profile(
        e,
        {
            "event_type_enum": F.col("event_type").isin(
                "click", "view", "purchase", "signup", "error"
            ),
            "value_nonnegative": F.col("value").isNotNull()
            & (F.col("value") >= 0.0),
            "ts_present": F.col("ts").isNotNull(),
            "props_has_k": F.get_json_object("props", "$.k").isNotNull(),
        },
    )


@register(
    "map_functions",
    """
    WITH built AS (
      SELECT event_id,
             map(['k', 'uid'],
                 [CAST(json_extract_string(props, '$.k') AS BIGINT),
                  user_id]) AS m
      FROM events
    )
    SELECT event_id,
           (m['k'])[1] AS k_val,
           (m['uid'])[1] AS uid_val,
           CAST(cardinality(m) AS INTEGER) AS n_entries,
           array_to_string(map_keys(m), ',') AS keys_csv
    FROM built
    """,
    description="map type family: construction, key extraction, "
    "cardinality, key listing (DuckDB extraction yields a list — "
    "indexed for scalar parity)",
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").cast("bigint"),
        F.lit("uid"),
        F.col("user_id"),
    )
    built = e.select("event_id", m.alias("m"))
    return built.select(
        "event_id",
        F.col("m").getItem("k").alias("k_val"),
        F.col("m").getItem("uid").alias("uid_val"),
        F.size("m").alias("n_entries"),
        F.array_join(F.map_keys("m"), ",").alias("keys_csv"),
    )


@register(
    "conditional_functions",
    """
    SELECT event_id,
           CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS value_band,
           coalesce(json_extract_string(props, '$.missing'),
                    json_extract_string(props, '$.k'), 'none') AS first_prop,
           nullif(event_type, 'error') AS type_or_null,
           (CASE WHEN event_type IN ('purchase', 'signup')
                 THEN 1 ELSE 0 END) AS is_conversion,
           ifnull(nullif(event_type, 'error'), 'ERR') AS type_masked
    FROM events
    """,
    description="conditional family: CASE bands, coalesce chains, nullif, "
    "IN-list, ifnull",
    tags=("scalar", "conditional"),
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    type_or_null = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        band.alias("value_band"),
        F.coalesce(
            F.get_json_object("props", "$.missing"),
            F.get_json_object("props", "$.k"),
            F.lit("none"),
        ).alias("first_prop"),
        type_or_null.alias("type_or_null"),
        F.col("event_type")
        .isin("purchase", "signup")
        .cast("int")
        .alias("is_conversion"),
        F.ifnull(type_or_null, F.lit("ERR")).alias("type_masked"),
    )


@register(
    "variant_props_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           'OBJECT<k: BIGINT>' AS vschema,
           (event_id % 13 <> 0) AS parse_ok
    FROM events
    """,
    description="Spark 4 VARIANT path for semi-structured props (the "
    "modern replacement for per-field get_json_object chains, "
    "reference pipeline/app.py:46-52): parse_json once, typed "
    "variant_get extraction, schema_of_variant introspection, and "
    "try_parse_json safe-parsing over deterministically corrupted "
    "copies (every 13th row) — the oracle predicts the parse failures "
    "by construction",
    tags=("scalar", "json", "variant"),
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    corrupted = F.when(
        F.col("event_id") % 13 == 0,
        F.concat(F.lit("garbage{"), F.col("props")),
    ).otherwise(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.schema_of_variant(v).alias("vschema"),
        F.try_parse_json(corrupted).isNotNull().alias("parse_ok"),
    )
