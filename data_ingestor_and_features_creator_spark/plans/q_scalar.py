"""Scalar function layer (SURVEY.md §2.8): string / regexp / date /
math / array / higher-order / json / map / null functions.

Dialect drift handled explicitly (SURVEY.md §7 risk 5):
- DuckDB ``regexp_replace`` is first-match by default → pass ``'g'``;
- DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday → +1 in SQL;
- epoch seconds via integer ``epoch_us // 1e6`` (exact floor on both);
- array math casts float32 → double *before* any arithmetic, and folds
  left-to-right on both engines (F.aggregate ↔ list_reduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import r6, r6_sql
from .registry import query


@query("str_funcs", oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_up,
       lower(p_type) AS type_lo,
       substring(p_name, 1, 8) AS name_head,
       length(p_name) AS name_len,
       concat(p_brand, '#', p_type) AS brand_type,
       trim('  pad  ') AS trimmed,
       (p_name LIKE '%green%') AS is_green
FROM part
""")
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.col("p_name").like("%green%").alias("is_green"),
    )


@query("str_regexp", oracle="""
SELECT doc_id,
       regexp_extract(text, '^([a-z]+)', 1) AS first_token,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head,
       len(string_split(text, ' ')) AS n_tokens
FROM documents WHERE doc_id < 100
""")
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_token"),
        F.regexp_replace("text", r"[aeiou]", "_").alias("devoweled_head"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


@query("date_funcs", oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       dayofweek(o_orderdate) + 1 AS dow,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
       epoch_us(o_orderdate) // 1000000 AS epoch_s
FROM orders
""")
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_eoy"),
        (F.unix_micros("o_orderdate") / F.lit(1000000)).cast("long").alias("epoch_s"),
    )


@query("math_funcs", oracle=f"""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * l_discount, 4) AS disc_amt,
       abs(l_quantity - 25.0) AS qty_dev,
       {r6_sql('sqrt(l_extendedprice)')} AS price_sqrt,
       {r6_sql('ln(l_extendedprice)')} AS price_ln,
       {r6_sql('log10(l_extendedprice)')} AS price_log10,
       {r6_sql('exp(l_discount)')} AS disc_exp,
       {r6_sql('pow(l_tax, 2.0)')} AS tax_sq,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
""")
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        # 2dp×2dp product is an exact 4-dp decimal: round at 4dp sits ON
        # the grid (no half-boundary); rounding it to 2dp would land on
        # exact .xx5 halves where Spark/DuckDB double-rounding disagrees.
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_amt"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        r6(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        r6(F.log("l_extendedprice")).alias("price_ln"),
        r6(F.log10("l_extendedprice")).alias("price_log10"),
        r6(F.exp("l_discount")).alias("disc_exp"),
        r6(F.pow("l_tax", F.lit(2.0))).alias("tax_sq"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query("array_funcs", oracle="""
SELECT doc_id, token
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 50)
""")
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode — the long-format bridge for text analysis."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query("array_higher_order", oracle=f"""
SELECT vec_id,
       len(embedding) AS dim,
       {r6_sql("list_reduce(list_transform(embedding,"
               " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)")}
         AS self_dot,
       {r6_sql("sqrt(list_reduce(list_transform(embedding,"
               " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))")}
         AS l2_norm
FROM embeddings
""")
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-element lambda math (SURVEY.md §2.8): dot products and norms
    stay JVM-side via transform/aggregate — no Python UDF. Float32
    elements are cast to double *before* multiplication; both engines
    fold left-to-right, so the sums agree bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    self_dot = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        r6(self_dot).alias("self_dot"),
        r6(F.sqrt(self_dot)).alias("l2_norm"),
    )


@query("json_funcs", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.missing') AS missing_field,
       (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
FROM events
""")
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        (k > 50).alias("k_high"),
    )


@query("map_funcs", oracle="""
SELECT event_id,
       'value,k' AS keys_csv,
       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val,
       2 AS map_size
FROM events
""")
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + access (SURVEY.md §2.8). DuckDB has no
    stable MapType twin, so the oracle checks the map's OBSERVABLE
    outputs flattened to scalars (joined keys, element_at lookup,
    size) — the map machinery runs on the Spark side either way."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("value"), F.col("value"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("double"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.size(m).alias("map_size"),
    )


@query("null_funcs", oracle="""
SELECT event_id,
       coalesce(json_extract_string(props, '$.missing'), 'absent') AS with_default,
       nullif(event_type, 'click') AS type_or_null,
       (CASE WHEN value > 100 THEN NULL ELSE value END) IS NULL AS capped_is_null,
       ifnull(CASE WHEN value > 100 THEN NULL ELSE value END, -1.0) AS capped_filled
FROM events
""")
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    capped = F.when(F.col("value") > 100, F.lit(None)).otherwise(F.col("value"))
    return ev.select(
        "event_id",
        F.coalesce(F.get_json_object("props", "$.missing"), F.lit("absent"))
        .alias("with_default"),
        F.nullif("event_type", F.lit("click")).alias("type_or_null"),
        capped.isNull().alias("capped_is_null"),
        F.coalesce(capped, F.lit(-1.0)).alias("capped_filled"),
    )


@query("bitwise_edit_funcs", oracle="""
SELECT doc_id,
       doc_id & 255 AS low_byte,
       doc_id | 4096 AS with_flag,
       xor(doc_id, 21845) AS toggled,
       CAST(bit_count(CAST(doc_id AS BIGINT)) AS INTEGER) AS popcount,
       doc_id << 2 AS shifted_l,
       doc_id >> 1 AS shifted_r,
       levenshtein(substr(text, 1, 12), substr(text, 3, 12)) AS edit_dist
FROM documents
""")
def bitwise_edit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (the SimHash/banding building blocks as a
    user-facing surface) + Levenshtein edit distance (the
    short-string near-dup verifier for id/title fields where shingle
    Jaccard is overkill). All JVM built-ins on both engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("doc_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("doc_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("doc_id").bitwiseXOR(F.lit(21845)).alias("toggled"),
        F.bit_count("doc_id").alias("popcount"),
        F.shiftleft("doc_id", 2).alias("shifted_l"),
        F.shiftright("doc_id", 1).alias("shifted_r"),
        F.levenshtein(F.substring("text", 1, 12),
                      F.substring("text", 3, 12)).alias("edit_dist"),
    )
