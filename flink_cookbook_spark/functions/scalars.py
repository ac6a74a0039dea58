"""Scalar function packs: string, date/time, math, JSON, conditional.

The reference's scalar surface is tiny (json parse/serialize, casts,
sqrt, abs, min/max clamp, round, format — SURVEY.md section 2.1 scalar
table); this module provides the full engine-scope packs over the fixture
tables. All are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no UDFs anywhere in the scalar path.

Portability notes encoded in the oracles:
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is 0=Sunday.
- Spark ``%`` keeps the dividend sign (like DuckDB); ``pmod`` differs.
- JSON extraction: Spark ``get_json_object(col,'$.k')`` == DuckDB
  ``col->>'k'`` (json extension, autoloaded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack over customer names: case, substring, pad, trim,
    replace, concat, length, split-derived fields."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.size(F.split("c_name", "#")).alias("n_parts"),
        F.element_at(F.split("c_name", "#"), 1).alias("first_part"),
    )


register(
    "string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS segment_lower,
       CAST(length(c_name) AS INTEGER) AS name_len,
       substring(c_name, 1, 8) AS name_prefix,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       replace(c_name, '#', '-') AS name_dashed,
       concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
       trim('  x  ') AS trimmed,
       CAST(len(string_split(c_name, '#')) AS INTEGER) AS n_parts,
       string_split(c_name, '#')[1] AS first_part
FROM customer
""",
    tags=("scalar", "string"),
)(string_funcs)


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time pack over order dates: extraction, arithmetic,
    truncation, formatting."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_add(F.col("o_orderdate"), 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1999-01-01"), F.col("o_orderdate")).alias("days_to_1999"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    )


register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER)
         AS days_to_1999,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
FROM orders
""",
    tags=("scalar", "date"),
)(date_funcs)


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack over lineitem numerics: roots, powers, logs, rounding
    family, sign/abs, modular arithmetic, clamps (greatest/least — the
    reference's [0,100] clamp idiom, flinkarima.py:99)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        rnd(F.pow("l_discount", 2), 6).alias("disc_sq"),
        rnd(F.exp("l_discount"), 6).alias("disc_exp"),
        rnd(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        rnd(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        (F.col("l_linenumber") % 3).alias("line_mod3"),
        F.greatest(F.lit(0.0), F.least(F.lit(100.0), F.col("l_quantity"))).alias("qty_clamped"),
    )


register(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice) + 1e-6, 6) AS price_sqrt,
       round(pow(l_discount, 2) + 1e-6, 6) AS disc_sq,
       round(exp(l_discount) + 1e-6, 6) AS disc_exp,
       round(ln(l_extendedprice) + 1e-6, 6) AS price_ln,
       round(log10(l_extendedprice) + 1e-6, 6) AS price_log10,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       abs(l_quantity - 25) AS qty_dev,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
       l_linenumber % 3 AS line_mod3,
       greatest(0.0, least(100.0, l_quantity)) AS qty_clamped
FROM lineitem
""",
    tags=("scalar", "math"),
)(math_funcs)


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 twin — JSON path extraction from events.props (the reference
    parses JSON payloads per record, flinkarima.py:121-127; here it is a
    codegen'd expression, not Python)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(k.cast("int") > 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
    )


register(
    "json_funcs",
    oracle="""
SELECT event_id,
       props->>'$.k' AS k_str,
       CAST(props->>'$.k' AS INTEGER) AS k_int,
       CASE WHEN CAST(props->>'$.k' AS INTEGER) > 50 THEN 'high' ELSE 'low' END AS k_band
FROM events
""",
    tags=("scalar", "json", "P1"),
)(json_funcs)


def to_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 twin — row -> JSON string serialization (flinkarima.py:444-451
    serializes the window-agg rows). Assembled with format_string so the
    byte-exact output is engine-portable."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.format_string(
            '{"event_id":%d,"user_id":%d,"event_type":"%s"}',
            F.col("event_id"),
            F.col("user_id"),
            F.col("event_type"),
        ).alias("payload"),
    )


register(
    "to_json_serialize",
    oracle="""
SELECT event_id,
       printf('{"event_id":%d,"user_id":%d,"event_type":"%s"}',
              event_id, user_id, event_type) AS payload
FROM events
""",
    tags=("scalar", "json", "P2"),
)(to_json_serialize)


def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pack: CASE/coalesce/nullif/isnull over account
    balances — the null-handling surface."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        rnd(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_floor0"),
    )


register(
    "conditional_funcs",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
       c_acctbal IS NULL AS bal_is_null,
       round(greatest(c_acctbal, 0.0) + 1e-6, 2) AS bal_floor0
FROM customer
""",
    tags=("scalar", "conditional"),
)(conditional_funcs)


def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex pack: extract / replace / match over part names and types
    (patterns restricted to the dialect-portable subset)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([0-9]+)", 1).alias("first_number"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.col("p_brand").rlike("Brand#[0-9]+").alias("brand_wellformed"),
    )


register(
    "regex_funcs",
    oracle="""
SELECT p_partkey,
       coalesce(regexp_extract(p_name, '([0-9]+)', 1), '') AS first_number,
       regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_devoweled,
       regexp_matches(p_brand, 'Brand#[0-9]+') AS brand_wellformed
FROM part
""",
    tags=("scalar", "regex"),
)(regex_funcs)


def corrupt_json_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 corrupt-record semantics, driver-checked: every 7th event's
    JSON payload is deterministically truncated (always-invalid prefix),
    and the parse must yield NULL for those rows instead of failing the
    job — the PERMISSIVE contract SURVEY.md §1.3 commits to (the
    reference throws per-record on bad payloads; a 100 TB scan cannot).
    Spark's get_json_object returns NULL on malformed input; the DuckDB
    twin guards json_extract with json_valid to express the identical
    semantics."""
    ev = load(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 7 == 0, F.substring("props", 1, 5)
    ).otherwise(F.col("props"))
    k = F.get_json_object(corrupted, "$.k")
    return ev.select(
        "event_id",
        k.isNotNull().alias("parsed_ok"),
        k.cast("int").alias("k_int"),
    )


register(
    "corrupt_json_handling",
    oracle="""
WITH c AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 5) ELSE props END AS s
  FROM events
)
SELECT event_id,
       (CASE WHEN json_valid(s) THEN s->>'$.k' ELSE NULL END) IS NOT NULL AS parsed_ok,
       CAST(CASE WHEN json_valid(s) THEN s->>'$.k' ELSE NULL END AS INTEGER) AS k_int
FROM c
""",
    tags=("scalar", "json", "P1", "robustness"),
)(corrupt_json_handling)


def variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing through Spark 4's VARIANT type: build a
    nested JSON document per event (deterministic from row values), parse
    it once into a variant, then shred typed fields back out with
    ``variant_get`` path expressions — nested object, array index, and a
    typed leaf.

    VARIANT is Spark's scale answer to schema-on-read JSON: the parse
    happens once into a binary encoding, and every path access is a
    codegen'd traversal, not a repeated string parse. The oracle walks
    the same paths with DuckDB's JSON extraction over the identical
    document string.
    """
    ev = load(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta": {"user": '),
        F.col("user_id").cast("string"),
        F.lit(', "type": "'),
        F.col("event_type"),
        F.lit('"}, "vals": ['),
        F.col("value").cast("string"),
        F.lit(", "),
        (F.col("value") * 2).cast("string"),
        F.lit("], "),
        F.substring("props", 2, 2147483647),
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.meta.user", "bigint").alias("meta_user"),
        F.variant_get(v, "$.meta.type", "string").alias("meta_type"),
        rnd(F.variant_get(v, "$.vals[1]", "double")).alias("val_doubled"),
        F.variant_get(v, "$.k", "int").alias("k_int"),
    )


register(
    "variant_shred",
    oracle="""
WITH docs AS (
  SELECT event_id,
         '{"meta": {"user": ' || CAST(user_id AS VARCHAR)
         || ', "type": "' || event_type
         || '"}, "vals": [' || CAST(value AS VARCHAR)
         || ', ' || CAST(value * 2 AS VARCHAR) || '], '
         || substring(props, 2) AS doc
  FROM events)
SELECT event_id,
       CAST(doc->>'$.meta.user' AS BIGINT) AS meta_user,
       doc->>'$.meta.type' AS meta_type,
       round(CAST(doc->>'$.vals[1]' AS DOUBLE) + 1e-6, 4) AS val_doubled,
       CAST(doc->>'$.k' AS INTEGER) AS k_int
FROM docs
""",
    tags=("scalar", "json", "variant", "semi-structured"),
)(variant_shred)


def json_keys_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema discovery: top-level JSON key frequency in
    the ``props`` payload — the first question against an uncontrolled
    event payload ("what fields actually arrive, and how often?"), the
    scan a VARIANT shredder (``variant_shred``) is configured from.

    Map-only explode of ``json_object_keys`` + one combinable hash
    aggregate; key cardinality (the output) is schema-sized, so the
    shuffle is trivially small at any event volume.
    """
    ev = load(spark, sf_dir, "events")
    n_rows = ev.agg(F.count("*").alias("n_rows"))
    return (
        ev.select(F.explode(F.json_object_keys("props")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n_present"))
        .crossJoin(F.broadcast(n_rows))
        .select(
            "key",
            "n_present",
            rnd(F.col("n_present") / F.col("n_rows"), 6).alias("presence_ratio"),
        )
    )


register(
    "json_keys_profile",
    oracle="""
WITH keys AS (
  SELECT unnest(json_keys(props)) AS key FROM events
),
n AS (SELECT count(*) AS n_rows FROM events)
SELECT key, count(*) AS n_present,
       round(count(*) * 1.0 / max(n.n_rows) + 1e-6, 6) AS presence_ratio
FROM keys CROSS JOIN n
GROUP BY key
""",
    tags=("json", "profiling", "schema"),
)(json_keys_profile)


def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe (``try_``) function family: the null-on-error
    arithmetic/cast surface a pipeline needs once ANSI mode is on
    (Spark 4 default) — a bad row yields NULL instead of killing a
    100 TB job. Exercised: try_divide (div-by-zero), try_cast (malformed
    string -> numeric), try_element_at (out-of-bounds), plus the
    aggregate null-accounting a data-quality report would run.

    Zero-shuffle map + one combinable aggregate; DuckDB twin uses
    TRY_CAST / NULLIF / guarded list indexing (same semantics by
    construction).
    """
    ev = load(spark, sf_dir, "events")
    row = ev.select(
        "event_type",
        "value",
        F.expr("try_divide(value, cast(event_id % 3 as double))").alias("div3"),
        F.expr("try_cast(event_type AS DOUBLE)").alias("bad_num"),
        F.expr("try_cast(get_json_object(props, '$.k') AS INT)").alias("k_int"),
        F.expr("try_element_at(split(event_type, '_'), 5)").alias("oob"),
    )
    return row.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("div3").isNull().cast("long")).alias("n_div_null"),
        rnd(F.sum("div3"), 4).alias("sum_div3"),
        F.sum(F.col("bad_num").isNull().cast("long")).alias("n_bad_num"),
        F.sum("k_int").alias("sum_k"),
        F.sum(F.col("oob").isNull().cast("long")).alias("n_oob_null"),
    )


register(
    "try_funcs",
    oracle="""
WITH row_vals AS (
  SELECT event_type, value,
         value / nullif(CAST(event_id % 3 AS DOUBLE), 0.0) AS div3,
         TRY_CAST(event_type AS DOUBLE) AS bad_num,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
         string_split(event_type, '_')[5] AS oob
  FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN div3 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
       round(sum(div3) + 1e-6, 4) AS sum_div3,
       CAST(sum(CASE WHEN bad_num IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_num,
       CAST(sum(k_int) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN oob IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oob_null
FROM row_vals
GROUP BY event_type
""",
    tags=("functions", "ansi", "try"),
)(try_funcs)


def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function pack: scalar shifts/masks/popcount over event
    ids plus the three bitwise AGGREGATES (bit_and / bit_or / bit_xor)
    per event type — the flag-field algebra permission systems and
    bitmap encodings run at scan speed. All codegen'd; one combinable
    aggregate.
    """
    ev = load(spark, sf_dir, "events")
    masked = ev.select(
        "event_type",
        F.col("event_id"),
        (F.col("event_id") % 256).alias("flags"),
    )
    return masked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.bit_count("flags")).alias("total_bits_set"),
        F.sum(F.shiftleft(F.col("flags") % 8, 2)).alias("sum_shifted"),
        F.sum((F.col("flags").bitwiseAND(F.lit(0x0F)))).alias("sum_low_nibble"),
        F.bit_and("flags").alias("flags_and"),
        F.bit_or("flags").alias("flags_or"),
        F.bit_xor("flags").alias("flags_xor"),
    )


register(
    "bit_funcs",
    oracle="""
WITH masked AS (
  SELECT event_type, event_id, event_id % 256 AS flags FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(bit_count(flags)) AS BIGINT) AS total_bits_set,
       CAST(sum((flags % 8) << 2) AS BIGINT) AS sum_shifted,
       CAST(sum(flags & 15) AS BIGINT) AS sum_low_nibble,
       CAST(bit_and(flags) AS BIGINT) AS flags_and,
       CAST(bit_or(flags) AS BIGINT) AS flags_or,
       CAST(bit_xor(flags) AS BIGINT) AS flags_xor
FROM masked
GROUP BY event_type
""",
    tags=("functions", "bitwise"),
)(bit_funcs)
