"""Scalar function library (SURVEY.md §2.8) — all [MANDATE].

The reference never interprets payload bytes (the consumer decodes —
``ShardProducerSpec.scala:41-42``); this is the expression surface a query
engine owes its users. All functions here are built-in Catalyst expressions
(JVM-side, codegen'd) — zero Python in the row path.

Cross-engine notes baked into the oracles:
- ``dayofweek``: Spark is 1=Sunday, DuckDB 0=Sunday → oracle adds 1;
- transcendental fns (log, sqrt on non-squares) round to 6dp — libm last-ulp
  differences are real;
- list results are sorted before comparison where order is unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactivestreams_kinesis_spark.catalog import load_table
from reactivestreams_kinesis_spark.queries.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT
        p_partkey,
        LOWER(p_name)                                   AS name_lower,
        UPPER(p_brand)                                  AS brand_upper,
        TRIM(p_type)                                    AS type_trim,
        SUBSTRING(p_name, 1, 8)                         AS name_prefix,
        CONCAT_WS('|', p_brand, p_type)                 AS brand_type,
        LENGTH(p_name)                                  AS name_len,
        REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g')     AS name_devoweled,
        REGEXP_EXTRACT(p_type, '([A-Z]+)', 1)           AS type_first_word,
        LEVENSHTEIN(p_brand, 'Brand#00')                AS brand_dist
    FROM part
    """,
    tags=("§2.8-string",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family. Note DuckDB regexp_replace needs the 'g'
    flag to match Spark's replace-all default."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_first_word"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#00")).alias("brand_dist"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT
        o_orderkey,
        CAST(YEAR(o_orderdate) AS INT)             AS order_year,
        CAST(MONTH(o_orderdate) AS INT)            AS order_month,
        CAST(DAYOFWEEK(o_orderdate) + 1 AS INT)    AS order_dow,
        DATE_TRUNC('month', o_orderdate)           AS order_month_start,
        CAST(EPOCH(o_orderdate) AS BIGINT)         AS order_epoch,
        CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INT)
                                                   AS days_to_y2k
    FROM orders
    """,
    tags=("§2.8-datetime",),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. DuckDB DAYOFWEEK is 0=Sunday vs Spark's 1=Sunday
    (oracle adds 1); EPOCH ≡ unix_timestamp under a UTC session."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
    )


@register(
    "fn_math",
    oracle="""
    SELECT
        p_partkey,
        ABS(p_size - 25)                       AS size_dev,
        CAST(POW(p_size, 2) AS DOUBLE)         AS size_sq,
        ROUND(SQRT(p_retailprice), 6)          AS price_sqrt,
        ROUND(LN(p_retailprice), 6)            AS price_ln,
        CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_bucket,
        CAST(CEIL(p_retailprice / 100) AS BIGINT)  AS price_bucket_hi,
        p_partkey % 7                          AS key_mod
    FROM part
    WHERE p_retailprice > 0
    """,
    tags=("§2.8-math",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Integer-valued results (abs/pow-of-int/floor/ceil/mod)
    are exact; sqrt is IEEE-exact but ln rounds to 6dp for libm parity.
    The oracle CASTs FLOOR/CEIL to BIGINT — DuckDB returns DOUBLE for
    floor/ceil of a DOUBLE while Spark returns BIGINT, a dtype drift the
    driver's strict hash rejects even when values agree."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return part.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.pow("p_size", 2).alias("size_sq"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.floor(F.col("p_retailprice") / 100).alias("price_bucket"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_bucket_hi"),
        (F.col("p_partkey") % 7).alias("key_mod"),
    )


@register(
    "fn_array_vector",
    oracle="""
    SELECT
        vec_id,
        CAST(LEN(embedding) AS INT)  AS dim,
        embedding[1]                 AS first_component,
        ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm,
        ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
              x -> CAST(x AS DOUBLE)), 'sum'), 6)                     AS comp_sum,
        CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT)          AS n_positive
    FROM embeddings
    """,
    tags=("§2.8-array", "X1-prep"),
)
def fn_array_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order family over the embedding vectors (the X1
    building blocks): size, indexing, fold (dot-with-self), filter. All
    JVM-side higher-order functions — no UDF for vector math."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            6,
        ).alias("sq_norm"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")),
            6,
        ).alias("comp_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT
        event_id,
        json_extract_string(props, '$.k')                  AS k_text,
        CAST(json_extract_string(props, '$.k') AS INT)     AS k_int,
        json_extract_string(props, '$.missing') IS NULL    AS missing_is_null,
        array_to_string(list_sort(json_keys(props)), '|')  AS prop_keys,
        CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
    FROM events
    """,
    tags=("§2.8-json", "§2.8-map", "P1"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + map family over the semi-structured ``events.props`` column —
    schema-on-read decode (path extraction via get_json_object AND typed
    decode via ``from_json`` into a map, then map_keys/value access), the
    engine-side version of the reference's consumer-side payload
    deserialization (P1). The key list serializes to a sorted delimited
    string because the driver's canonicalizer can't hash list cells."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_text"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        F.concat_ws("|", F.sort_array(F.map_keys(m))).alias("prop_keys"),
        (m["k"] * 2).alias("k_doubled"),
    )


@register(
    "fn_conditional_null",
    oracle="""
    SELECT
        s_suppkey,
        COALESCE(NULLIF(s_name, ''), 'unknown')     AS name_or_unknown,
        CASE WHEN s_acctbal < 0 THEN 'debt'
             WHEN s_acctbal = 0 THEN 'zero'
             ELSE 'credit' END                      AS balance_class,
        IFNULL(NULLIF(s_nationkey, 0), -1)          AS nation_or_neg1,
        s_acctbal IS NOT NULL                       AS has_balance
    FROM supplier
    """,
    tags=("§2.8-conditional",),
)
def fn_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null-handling family: COALESCE, NULLIF, CASE, IFNULL."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_or_unknown"
        ),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") == 0, "zero")
        .otherwise("credit")
        .alias("balance_class"),
        F.ifnull(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_or_neg1"
        ),
        F.col("s_acctbal").isNotNull().alias("has_balance"),
    )


@register(
    "fn_datetime_arith",
    oracle="""
    SELECT
        event_id,
        CAST(QUARTER(ts) AS INT)        AS q,
        CAST(DAYOFYEAR(ts) AS INT)      AS doy,
        CAST(WEEKOFYEAR(ts) AS INT)     AS iso_week,
        CAST(HOUR(ts) AS INT)           AS hr,
        CAST(MINUTE(ts) AS INT)         AS mi,
        CAST(ts AS TIMESTAMP) + INTERVAL 7 DAY AS ts_plus_week,
        CAST(LAST_DAY(CAST(ts AS DATE)) AS TIMESTAMP) AS month_end
    FROM events
    """,
    tags=("§2.8-datetime",),
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time arithmetic family: extraction (quarter/doy/ISO week/
    hour/minute), interval addition, month-end — on microsecond event
    timestamps."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("iso_week"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("ts_plus_week"),
        F.last_day("ts").cast("timestamp").alias("month_end"),
    )


@register(
    "fn_posexplode",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 10
    )
    SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, list_extract(toks, u.i) AS tok
    FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)
    """,
    tags=("§2.8-array",),
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with position (§2.8): posexplode — the oracle
    builds ordinals via a lateral UNNEST(range(...)) (DuckDB lacks WITH
    ORDINALITY; Spark positions are 0-based so the oracle subtracts 1).
    The row-multiplying primitive under every tokenize/shingle pipeline."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@register(
    "fn_string_extended",
    oracle="""
    SELECT
        s_suppkey,
        LPAD(s_name, 20, '*')               AS name_lpad,
        RPAD(s_name, 20, '*')               AS name_rpad,
        TRANSLATE(s_name, '#0', '_O')       AS name_translated,
        REVERSE(s_name)                     AS name_reversed,
        REPEAT('-', CAST(s_nationkey AS INT) % 5) AS dashes,
        STARTS_WITH(s_name, 'Supplier')     AS is_supplier_prefixed,
        ENDS_WITH(s_name, '1')              AS ends_in_one,
        CONTAINS(s_name, '#')               AS has_hash,
        LEFT(s_name, 8)                     AS name_left,
        RIGHT(s_name, 3)                    AS name_right,
        SPLIT_PART(s_name, '#', 2)          AS after_hash
    FROM supplier
    """,
    tags=("§2.8-string",),
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family (§2.8): padding, translate, reverse, repeat,
    prefix/suffix/contains predicates, left/right slicing, split_part —
    all names shared verbatim by Spark and DuckDB."""
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.lpad("s_name", 20, "*").alias("name_lpad"),
        F.rpad("s_name", 20, "*").alias("name_rpad"),
        F.translate("s_name", "#0", "_O").alias("name_translated"),
        F.reverse("s_name").alias("name_reversed"),
        F.repeat(F.lit("-"), (F.col("s_nationkey") % 5).cast("int")).alias("dashes"),
        F.startswith(F.col("s_name"), F.lit("Supplier")).alias("is_supplier_prefixed"),
        F.endswith(F.col("s_name"), F.lit("1")).alias("ends_in_one"),
        F.contains(F.col("s_name"), F.lit("#")).alias("has_hash"),
        F.expr("LEFT(s_name, 8)").alias("name_left"),
        F.expr("RIGHT(s_name, 3)").alias("name_right"),
        F.split_part(F.col("s_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@register(
    "fn_safe_arithmetic",
    oracle="""
    SELECT
        event_id,
        value / NULLIF(TRY_CAST(json_extract_string(props, '$.k') AS INT), 0)
            AS value_per_k,
        TRY_CAST(event_type AS INT)          AS type_as_int,
        TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_safe
    FROM events
    """,
    tags=("§2.8-conditional",),
)
def fn_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (§2.8): division guarded by NULLIF (NULL, not
    an exception or Inf, on zero denominators) and TRY_CAST for
    unparseable strings — the null-on-error discipline a pipeline needs
    under ANSI mode where a single bad row would otherwise kill a 100 TB
    job."""
    events = load_table(spark, sf_dir, "events")
    # TRY_CAST here too: a plain cast of an unparseable k would throw under
    # default-on ANSI mode — the exact failure this query guards against
    k = F.expr("TRY_CAST(get_json_object(props, '$.k') AS INT)")
    return events.select(
        "event_id",
        # deliberately UN-rounded: identical double operands divide to
        # bit-identical quotients on both engines, while ROUND(q, 6) hits
        # exact half-boundaries whenever value (2dp) / 2^n terminates in a
        # "...5" digit just past the 6th place (observed at sf0.01)
        (F.col("value") / F.nullif(k, F.lit(0))).alias("value_per_k"),
        F.expr("TRY_CAST(event_type AS INT)").alias("type_as_int"),
        F.expr("TRY_CAST(get_json_object(props, '$.k') AS INT)").alias("k_safe"),
    )


@register(
    "fn_variant_semistructured",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT))
               AS distinct_k
    FROM events
    GROUP BY event_type
    """,
    tags=("P1",),
)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads via Spark 4's VARIANT type (P1 decode, the
    modern form): ``parse_json`` turns the JSON payload column into a
    binary variant ONCE at the scan edge, and every later access is a
    typed ``variant_get`` path lookup — at 100 TB this beats per-access
    string re-parsing (``get_json_object``) because the parse cost is
    paid once and the variant encoding is shredded/binary, and it beats
    rigid ``from_json`` structs when payload schemas drift (unknown keys
    keep riding along untyped). The oracle reads the same numbers with
    DuckDB's JSON path functions — typed extraction must agree exactly
    with the string-parse route."""
    events = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.countDistinct(k).alias("distinct_k"),
    )
