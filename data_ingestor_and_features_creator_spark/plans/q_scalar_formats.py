"""Scalar-function surface and format/SQL-statement ops (split out of
q_round4b in round 5): text/jsonl scans, date/tz and string/array
function families, NaN/rounding convention pins, AES round trip, and
the SQL-statement surface (INSERT DML, join hints, PIVOT/UNPIVOT)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query


# ---------------------------------------------------------------------------
# Text-lines source (spark.read.text)
# ---------------------------------------------------------------------------

import os as _os

_DERIVED = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))),
    "testdata_derived",
)
_DOCS_TXT = _os.path.join(_DERIVED, "docs_sample.txt")


@query("scan_text_lines", oracle=f"""
SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM read_csv('{_DOCS_TXT}', delim=chr(9), header=false, quote='',
              columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR'}})
""")
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXT-LINES source (§2.1 family, completing the format set next
    to parquet/csv/json/orc/xml/binary): `spark.read.text` — the
    line-per-record reader every crawl/log pipeline starts from —
    with record parsing (id TAB text) done as codegen expressions
    AFTER the scan, the split-the-line-yourself contract raw text
    implies. At 100 TB text files split by line ranges across tasks
    exactly like any other splittable source. The committed
    tab-separated sample mirrors the sf0.001 documents table.
    Malformed-line behavior: a line with no TAB is DROPPED (the
    instr guard below), and the id parse is try_cast so a non-numeric
    head yields NULL instead of an ANSI fault — raw crawl text always
    contains garbage lines and a scan op must not abort on them."""
    lines = spark.read.text(_DOCS_TXT)
    tab = F.instr("value", "\t")
    return (lines.filter(tab > 0)
        .select(
            F.expr("try_cast(substring_index(value, '\t', 1) AS LONG)")
             .alias("doc_id"),
            F.expr("substring(value, instr(value, '\t') + 1)")
             .alias("text"))
        .withColumn("n_chars", F.length("text").cast("long")))


# ---------------------------------------------------------------------------
# Timezone-aware day bucketing (UTC vs local-civil-day divergence)
# ---------------------------------------------------------------------------

_TZ = "America/New_York"


@query("date_tz_bucket", oracle=f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS utc_day,
       CAST(CAST(timezone('{_TZ}', timezone('UTC', ts)) AS DATE) AS VARCHAR) AS local_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN CAST(ts AS DATE)
                      <> CAST(timezone('{_TZ}', timezone('UTC', ts)) AS DATE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_shifted
FROM events
GROUP BY 1, 2
""")
def date_tz_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMEZONE-AWARE DAY BUCKETING: the same instants bucketed by UTC
    calendar day AND by {tz} civil day, with the count of events whose
    day label DIFFERS — the late-evening rows every UTC-bucketed
    dashboard silently misfiles (and the DST boundary moves twice a
    year). Spark: `convert_timezone` (session tz is pinned UTC by
    session.py, so naive ts ≡ UTC instant); DuckDB: the double
    conversion `timezone(tz, timezone('UTC', ts))` — naive-as-UTC →
    instant → tz-local — which is session-TimeZone independent
    (single-argument timezone() goes the OTHER direction). Both resolve through the IANA tzdata — the oracle proves
    the two engines' tz databases agree on every fixture instant,
    which is exactly the review question this op exists to answer.
    One scan, one grouped agg; the tz conversion is a pure per-row
    expression (no shuffle implications at any scale).""".format(tz=_TZ)
    ev = load_table(spark, sf_dir, "events")
    local = F.convert_timezone(F.lit("UTC"), F.lit(_TZ), F.col("ts"))
    utc_day = F.col("ts").cast("date")
    local_day = local.cast("date")
    return (ev.groupBy(utc_day.cast("string").alias("utc_day"),
                       local_day.cast("string").alias("local_day"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.when(utc_day != local_day, 1).otherwise(0))
                    .alias("n_shifted")))


# ---------------------------------------------------------------------------
# JSONL source with corrupt-record tolerance (PERMISSIVE mode)
# ---------------------------------------------------------------------------

_EVENTS_JSONL = _os.path.join(_DERIVED, "events_sample.jsonl")


@query("scan_jsonl_corrupt", oracle=f"""
WITH raw AS (
  SELECT * FROM read_json('{_EVENTS_JSONL}',
    format='newline_delimited', ignore_errors=true,
    columns={{'event_id': 'BIGINT', 'user_id': 'BIGINT',
              'event_type': 'VARCHAR', 'value': 'DOUBLE'}})),
parsed AS (SELECT * FROM raw WHERE event_type IS NOT NULL)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_ok,
       CAST((SELECT COUNT(*) FROM raw)
            - (SELECT COUNT(*) FROM parsed) AS BIGINT) AS n_corrupt
FROM parsed GROUP BY event_type
""")
def scan_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL SOURCE WITH CORRUPT-RECORD TOLERANCE: real feeds carry
    malformed lines, and the production posture is PERMISSIVE — parse
    what parses, ROUTE the rest to `_corrupt_record`, and ACCOUNT for
    it (silently dropping is how pipelines lose data without noticing;
    DROPMALFORMED is exactly that). The committed fixture plants 4
    corrupt lines in 200; the op emits per-type counts of good rows
    plus the corrupt total carried on every row — the oracle twin
    derives the same count from DuckDB's ignore_errors behavior
    (NULL-filled salvage rows — no corrupt-record column there, which
    is the point: the number is engine-independent). At scale the JSON parse is per-line
    splittable like any text source."""
    schema = ("event_id long, user_id long, event_type string, "
              "value double, _corrupt_record string")
    raw = (spark.read.schema(schema)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt_record")
                .json(_EVENTS_JSONL)
                .cache())
    bad = raw.filter(F.col("_corrupt_record").isNotNull()) \
             .agg(F.count(F.lit(1)).alias("n_corrupt"))
    ok = (raw.filter(F.col("_corrupt_record").isNull())
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_ok")))
    return (ok.crossJoin(F.broadcast(bad))
              .select("event_type", "n_ok", "n_corrupt"))


# ---------------------------------------------------------------------------
# Boolean aggregate family (every / any / count_if)
# ---------------------------------------------------------------------------

@query("agg_boolean_funcs", oracle="""
SELECT event_type,
       COALESCE(bool_and(value > 10.0), false) AS all_over_10,
       COALESCE(bool_or(value > 400.0), false) AS any_over_400,
       CAST(count_if(value > 100.0) AS BIGINT) AS n_over_100,
       CAST(count_if(value IS NULL OR isnan(value)) AS BIGINT) AS n_missing
FROM events GROUP BY event_type
""")
def agg_boolean_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOLEAN AGGREGATE family — every/bool_and, any/bool_or,
    count_if — completing §2.4 next to the numeric aggregates: the
    assertion-style rollups data-quality checks are written in
    ("every reading positive?", "any outlier?", "how many missing?").
    NULL semantics pinned: bool_and/bool_or over an all-NULL group
    yields NULL on both engines → COALESCE false (registry house rule
    for nullable booleans); NaN counts as missing explicitly since
    NaN > x is false, not NULL, in both engines. Single hash
    aggregate, map-side partials, JVM-only."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return (ev.groupBy("event_type")
              .agg(F.coalesce(F.every(v > 10.0), F.lit(False))
                    .alias("all_over_10"),
                   F.coalesce(F.some(v > 400.0), F.lit(False))
                    .alias("any_over_400"),
                   F.count_if(v > 100.0).alias("n_over_100"),
                   F.count_if(v.isNull() | F.isnan(v)).alias("n_missing")))


# ---------------------------------------------------------------------------
# SQL DML surface: CREATE TABLE / INSERT INTO / INSERT OVERWRITE
# ---------------------------------------------------------------------------

from .registry import scratch_dir as _scratch_dir


@query("sql_insert_dml", oracle=f"""
WITH base AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('value')} AS total
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type),
extra AS (
  SELECT 'synthetic' AS event_type, CAST(1 AS BIGINT) AS n,
         CAST(42.5 AS DOUBLE) AS total)
SELECT * FROM base UNION ALL SELECT * FROM extra
""")
def sql_insert_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML ROUND TRIP — CREATE TABLE (parquet, external location)
    → INSERT INTO … SELECT (the aggregate) → a second INSERT INTO
    (literal VALUES row) → read back: the statement surface an
    engine's SQL users actually type, distinct from the DataFrame
    writer API the sink_* ops exercise. INSERT INTO appends files
    atomically per statement; the oracle reproduces the final table
    state as agg UNION literal. The scratch location is session-
    scoped (house rule from the round-3 tmp-leak fix); the table is
    DROPped and re-CREATEd per invocation so reruns are idempotent."""
    loc = _scratch_dir("sql_dml_tbl")
    spark.sql("DROP TABLE IF EXISTS dml_event_stats")
    spark.sql(f"""
        CREATE TABLE dml_event_stats
        (event_type STRING, n BIGINT, total DOUBLE)
        USING parquet LOCATION '{loc}'""")
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__dml_events")
    spark.sql(f"""
        INSERT INTO dml_event_stats
        SELECT event_type, COUNT(*) AS n,
               {{dsum}} AS total
        FROM __dml_events
        WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY event_type""".format(
        dsum="CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)"))
    spark.sql("INSERT INTO dml_event_stats "
              "VALUES ('synthetic', 1, 42.5)")
    return spark.table("dml_event_stats")


# ---------------------------------------------------------------------------
# SQL join hints (BROADCAST / MERGE) honored by the planner
# ---------------------------------------------------------------------------

@query("sql_join_hints", oracle=f"""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
       {dsum_sql('c_acctbal')} AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL JOIN HINTS: the /*+ BROADCAST(dim) */ hint spelled in SQL
    text — the tuning surface SQL users reach for when the planner's
    statistics mis-size a side (DataFrame users call F.broadcast; both
    land on the same ResolvedHint node). The hint is semantically
    neutral — the oracle is the plain join — and the plan-shape test
    asserts the hint actually produced a BroadcastHashJoin, which is
    the point: hints must be HONORED, not parsed and dropped."""
    load_table(spark, sf_dir, "customer") \
        .createOrReplaceTempView("__hint_customer")
    load_table(spark, sf_dir, "nation") \
        .createOrReplaceTempView("__hint_nation")
    return spark.sql("""
        SELECT /*+ BROADCAST(n) */ n_name,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,12))) AS DOUBLE)
                 AS total_bal
        FROM __hint_customer c JOIN __hint_nation n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name""")


# ---------------------------------------------------------------------------
# SQL-standard LISTAGG (ordered string aggregation) + GROUP BY ALL
# ---------------------------------------------------------------------------

@query("agg_listagg_ordered", oracle="""
SELECT event_type,
       string_agg(DISTINCT CAST(user_id % 10 AS VARCHAR), ','
                  ORDER BY CAST(user_id % 10 AS VARCHAR)) AS cohorts,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""")
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard LISTAGG WITHIN GROUP (ORDER BY …) — ordered,
    DISTINCT string aggregation (Spark 4's listagg ≡ DuckDB's
    string_agg ORDER BY): the report-formatting aggregate analysts
    reach for constantly, and a determinism trap — WITHOUT the WITHIN
    GROUP order the concatenation is partition-order-dependent and
    can never hash-match, which is why the house rule is 'no unordered
    listagg, ever' (agg_collect pins the same rule for array_agg).
    Also exercises GROUP BY ALL, the Spark-4 dialect sugar. The
    DISTINCT cohort domain is 10 strings/group — the result stays
    row-sized however large the input."""
    load_table(spark, sf_dir, "events") \
        .createOrReplaceTempView("__listagg_events")
    return spark.sql("""
        SELECT event_type,
               listagg(DISTINCT CAST(user_id % 10 AS STRING), ',')
                 WITHIN GROUP (ORDER BY CAST(user_id % 10 AS STRING))
                 AS cohorts,
               COUNT(*) AS n
        FROM __listagg_events GROUP BY ALL""")


# ---------------------------------------------------------------------------
# SQL PIVOT / UNPIVOT dialect round trip
# ---------------------------------------------------------------------------

@query("sql_pivot_unpivot", oracle=f"""
WITH base AS (
  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INTEGER) % 4
           AS hour_band, value
  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
SELECT event_type,
       CAST(hour_band AS INTEGER) AS hour_band,
       {dsum_sql('value')} AS total
FROM base
WHERE hour_band IN (0, 1, 2, 3)
GROUP BY event_type, hour_band
""")
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT → UNPIVOT ROUND TRIP — the DIALECT forms (distinct
    from the DataFrame API ops agg_pivot / unpivot_melt): PIVOT turns
    the hour-band dimension into 4 columns (one hash aggregate with
    the pivot values compiled into conditional aggregates — no extra
    shuffle vs GROUP BY), UNPIVOT folds them back to long form via an
    Expand node. The round trip must land exactly on the plain
    GROUP BY result — which is the oracle — proving the two dialect
    constructs are lossless inverses (NULL cells from empty
    combinations are dropped by UNPIVOT's default INCLUDE NULLS=off,
    matching the GROUP BY's absent groups)."""
    load_table(spark, sf_dir, "events") \
        .createOrReplaceTempView("__pivot_events")
    return spark.sql("""
        WITH base AS (
          SELECT event_type, CAST(hour(ts) AS INT) % 4 AS hour_band,
                 value
          FROM __pivot_events
          WHERE value IS NOT NULL AND NOT isnan(value)),
        p AS (
          SELECT * FROM base
          PIVOT (CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                 FOR hour_band IN (0 AS h0, 1 AS h1, 2 AS h2, 3 AS h3))),
        u AS (
          SELECT event_type, band, total
          FROM p UNPIVOT (total FOR band IN (h0, h1, h2, h3)))
        SELECT event_type,
               CAST(substring(band, 2) AS INT) AS hour_band, total
        FROM u""")


# ---------------------------------------------------------------------------
# AES column encryption round trip (governance surface)
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"  # demo key: 16-byte AES-128


@query("crypto_aes_roundtrip", oracle="""
SELECT event_id, CAST(user_id AS VARCHAR) AS plain
FROM events WHERE event_id < 1000
""")
def crypto_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES COLUMN ENCRYPTION round trip — the governance surface for
    at-rest column protection: aes_encrypt the user id (ECB mode —
    chosen here because it is DETERMINISTIC, which is what makes the
    round trip oracle-checkable; production uses GCM, whose random IV
    is exactly why ciphertext columns can never be hash-compared),
    then aes_decrypt back and return the plaintext. The oracle is the
    identity projection — decrypt(encrypt(x)) ≡ x is the whole
    contract. DuckDB has no AES, which is fine: the ciphertext never
    appears in a compared column."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    enc = F.expr(f"aes_encrypt(CAST(user_id AS STRING), '{_AES_KEY}', 'ECB')")
    dec = F.expr(f"CAST(aes_decrypt(cipher, '{_AES_KEY}', 'ECB') AS STRING)")
    return (ev.select("event_id", enc.alias("cipher"))
              .select("event_id", dec.alias("plain")))


# ---------------------------------------------------------------------------
# Bitwise aggregate family
# ---------------------------------------------------------------------------

@query("agg_bitwise_funcs", oracle="""
SELECT event_type,
       CAST(bit_and(user_id) AS BIGINT) AS band,
       CAST(bit_or(user_id) AS BIGINT) AS bor,
       CAST(bit_xor(user_id) AS BIGINT) AS bxor
FROM events GROUP BY event_type
""")
def agg_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITWISE AGGREGATES (bit_and / bit_or / bit_xor) per group —
    integer-exact, order-independent reductions (each is a
    commutative monoid, so map-side partials are trivially correct):
    the flag-mask rollups permission and feature-flag systems run,
    and the parity check (bit_xor) that detects single-row
    divergence between replicas. Completes §2.4's integer-exact
    corner next to the bitmap distinct ops."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
              .agg(F.bit_and("user_id").alias("band"),
                   F.bit_or("user_id").alias("bor"),
                   F.bit_xor("user_id").alias("bxor")))


# ---------------------------------------------------------------------------
# Date-part scalar completion (quarter/week/daynames/make_date)
# ---------------------------------------------------------------------------

@query("date_parts_funcs", oracle="""
SELECT event_id,
       CAST(quarter(ts) AS INTEGER) AS q,
       CAST(weekofyear(ts) AS INTEGER) AS iso_week,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       substr(dayname(ts), 1, 3) AS day_abbrev,
       substr(monthname(ts), 1, 3) AS month_abbrev,
       CAST(make_date(CAST(EXTRACT(YEAR FROM ts) AS INTEGER),
                      CAST(EXTRACT(MONTH FROM ts) AS INTEGER),
                      CAST(EXTRACT(DAY FROM ts) AS INTEGER)) AS DATE)
         AS rebuilt_date
FROM events WHERE event_id < 2000
""")
def date_parts_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-PART scalar completion next to date_funcs: quarter,
    ISO weekofyear, dayofyear, day/month names, and a
    make_date(extract…) rebuild proving constructor/extractor are
    inverses. Cross-engine naming pinned the cheap way: Spark's
    dayname/monthname return 3-letter abbreviations, DuckDB full
    names — the oracle takes substr(…, 1, 3), which is the honest
    note that LOCALE-DEPENDENT name functions need normalization
    before any cross-system comparison (same class of trap as
    dayofweek numbering, handled in agg_chi2_independence). Pure
    per-row expressions."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("doy"),
        F.expr("dayname(ts)").alias("day_abbrev"),
        F.expr("monthname(ts)").alias("month_abbrev"),
        F.make_date(F.year("ts"), F.month("ts"), F.dayofmonth("ts"))
         .alias("rebuilt_date"))


# ---------------------------------------------------------------------------
# String pad/format scalar completion
# ---------------------------------------------------------------------------

@query("str_pad_format_funcs", oracle="""
SELECT doc_id,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       printf('%s|%04d|%s', source, CAST(doc_id AS INTEGER),
              lang) AS record_key,
       repeat(lang, 2) AS lang2,
       reverse(source) AS rsource,
       left(text, 5) AS head5,
       right(text, 5) AS tail5,
       translate(lang, 'en', 'EN') AS lang_up
FROM documents
""")
def str_pad_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING PAD/FORMAT scalar completion next to str_funcs:
    lpad-zero-fill (the fixed-width key every legacy interchange
    format wants), printf-style format_string (Spark) ≡ printf
    (DuckDB) composite keys, repeat/reverse, left/right head-tail
    slicing, and translate character mapping. All pure codegen
    per-row expressions; the printf twin pins that %04d zero-padding
    semantics agree cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.format_string("%s|%04d|%s", F.col("source"),
                        F.col("doc_id").cast("int"), F.col("lang"))
         .alias("record_key"),
        F.repeat("lang", 2).alias("lang2"),
        F.reverse("source").alias("rsource"),
        F.expr("left(text, 5)").alias("head5"),
        F.expr("right(text, 5)").alias("tail5"),
        F.translate("lang", "en", "EN").alias("lang_up"))


# ---------------------------------------------------------------------------
# Array set-operation scalar family
# ---------------------------------------------------------------------------

@query("array_set_funcs", oracle="""
WITH t AS (
  SELECT event_id,
         list_transform(generate_series(1, 1 + CAST(user_id % 4 AS INT)),
                        x -> CAST(x AS BIGINT)) AS a,
         list_transform(generate_series(CAST(user_id % 3 AS INT), 4),
                        x -> CAST(x AS BIGINT)) AS b
  FROM events WHERE event_id < 3000)
SELECT event_id,
       COALESCE(array_to_string(list_sort(list_distinct(list_filter(a,
           x -> list_contains(b, x)))), ','), '') AS inter,
       COALESCE(array_to_string(list_sort(list_distinct(
           list_concat(a, b))), ','), '') AS uni,
       COALESCE(array_to_string(list_sort(list_distinct(list_filter(a,
           x -> NOT list_contains(b, x)))), ','), '') AS diff,
       list_has_any(a, b) AS overlaps,
       CAST(COALESCE(list_position(b, 2), 0) AS INTEGER) AS pos2
FROM t
""")
def array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY SET-OPERATION family — array_intersect / union / except,
    arrays_overlap, array_position — completing §2.8's array corner
    (array_funcs covers construction/slicing, array_higher_order the
    lambdas). The cross-engine trap this op pins: Spark's set ops
    preserve FIRST-ARRAY encounter order while DuckDB's list_intersect
    returns arbitrary order — any cross-system comparison (and any
    deterministic downstream consumer) must SORT set-semantic results,
    so both sides emit sorted+distinct arrays, and the oracle builds
    the set ops from list_filter/list_contains primitives. Position is
    1-based on both engines (0 = absent via COALESCE). The sorted
    arrays are SERIALIZED to ',' CSV strings on both sides: the driver
    canonicalizer pandas-sorts every output column, and raw list cells
    are unhashable there (round-6 driver ERR) — house rule: no
    hash-checked query may emit raw array/map columns. Empty-list
    corner: Spark array_join([]) = '' but DuckDB array_to_string([]) =
    NULL, so the oracle COALESCEs to ''."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    a = F.sequence(F.lit(1).cast("long"),
                   (1 + F.col("user_id") % 4).cast("long"))
    b = F.sequence((F.col("user_id") % 3).cast("long"),
                   F.lit(4).cast("long"))
    t = ev.select("event_id", a.alias("a"), b.alias("b"))
    return t.select(
        "event_id",
        F.array_join(F.sort_array(F.array_distinct(
            F.array_intersect("a", "b"))), ",").alias("inter"),
        F.array_join(F.sort_array(F.array_distinct(
            F.array_union("a", "b"))), ",").alias("uni"),
        F.array_join(F.sort_array(F.array_distinct(
            F.array_except("a", "b"))), ",").alias("diff"),
        F.arrays_overlap("a", "b").alias("overlaps"),
        F.coalesce(F.array_position("b", 2), F.lit(0)).cast("int")
         .alias("pos2"))


# ---------------------------------------------------------------------------
# explode_outer / posexplode_outer NULL semantics
# ---------------------------------------------------------------------------

@query("explode_outer_semantics", oracle="""
WITH t AS (
  SELECT event_id,
         CASE WHEN user_id % 3 = 0 THEN NULL
              WHEN user_id % 3 = 1 THEN []
              ELSE [CAST(user_id AS BIGINT), CAST(user_id + 1 AS BIGINT)]
         END AS xs
  FROM events WHERE event_id < 2000),
expl AS (
  SELECT event_id,
         CAST(unnest(generate_series(0, len(xs) - 1)) AS INTEGER) AS pos,
         xs
  FROM t),
kept AS (
  SELECT event_id, CAST(NULL AS INTEGER) AS pos,
         CAST(NULL AS BIGINT) AS val
  FROM t WHERE xs IS NULL OR len(xs) = 0)
SELECT event_id, pos, CAST(xs[pos + 1] AS BIGINT) AS val FROM expl
UNION ALL SELECT * FROM kept
""")
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer / posexplode_outer NULL SEMANTICS — the corner
    that silently loses rows in ETL: plain explode DROPS records whose
    array is NULL or EMPTY, outer explode keeps them with NULL
    element/position. The fixture mixes all three shapes (null / [] /
    2 elements by user cohort); the oracle reproduces the contract
    as exploded-rows UNION the kept null/empty records (DuckDB has no
    outer unnest — the union IS its definition). Row count = kept-null rows + Σ array sizes,
    which only the OUTER variant gets right."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    xs = (F.when(F.col("user_id") % 3 == 0, F.lit(None))
           .when(F.col("user_id") % 3 == 1,
                 F.array().cast("array<long>"))
           .otherwise(F.array(F.col("user_id"),
                              F.col("user_id") + 1)))
    t = ev.select("event_id", xs.alias("xs"))
    return t.select("event_id",
                    F.posexplode_outer("xs").alias("pos", "val"))


# ---------------------------------------------------------------------------
# String record parsing: from_csv + str_to_map
# ---------------------------------------------------------------------------

@query("str_parse_record_funcs", oracle="""
SELECT event_id,
       user_id AS csv_uid,
       event_type AS csv_type,
       CAST(user_id AS VARCHAR) AS m_uid,
       event_type AS m_type
FROM events WHERE event_id < 2000
""")
def str_parse_record_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING RECORD PARSING — from_csv (typed CSV-in-a-string, the
    schema-on-read path for delimited log LINES inside a column,
    sibling of scan_json's from_json) and str_to_map (the 'k:v|k:v'
    config/tag blob every legacy event pipeline carries). The records
    are synthesized from typed columns and parsed BACK — identity
    round trips, so the oracle is the plain projection and any parser
    asymmetry (quoting, type coercion, delimiter handling) breaks the
    hash. Both parsers are codegen expressions — schema-on-read
    without leaving the JVM."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    csv_rec = F.concat_ws(",", F.col("user_id").cast("string"),
                          F.col("event_type"))
    map_rec = F.concat(F.lit("uid:"), F.col("user_id").cast("string"),
                       F.lit("|type:"), F.col("event_type"))
    t = ev.select("event_id", csv_rec.alias("csv_rec"),
                  map_rec.alias("map_rec"))
    parsed = t.select(
        "event_id",
        F.from_csv("csv_rec", F.lit("uid BIGINT, et STRING"))
         .alias("c"),
        F.expr("str_to_map(map_rec, '\\\\|', ':')").alias("m"))
    return parsed.select(
        "event_id",
        F.col("c.uid").alias("csv_uid"),
        F.col("c.et").alias("csv_type"),
        F.element_at("m", "uid").alias("m_uid"),
        F.element_at("m", "type").alias("m_type"))


# ---------------------------------------------------------------------------
# Rounding-convention semantics (ROUND half-away vs BROUND half-even)
# ---------------------------------------------------------------------------

@query("scalar_rounding_conventions", oracle="""
WITH t AS (
  SELECT event_id,
         CAST(user_id % 19 AS DOUBLE) - 9.0 + 0.5 AS x
  FROM events WHERE event_id < 2000)
SELECT event_id, x,
       CAST(round(x) AS BIGINT) AS half_away,
       CAST(CASE WHEN x - floor(x) = 0.5 THEN 2.0 * round(x / 2.0)
                 ELSE round(x) END AS BIGINT) AS half_even
FROM t
""")
def scalar_rounding_conventions(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """ROUNDING CONVENTIONS pinned as an operator: every value here is
    an exact half-integer — the worst case the house rules exist for —
    and the op emits BOTH conventions side by side: ROUND (HALF_UP,
    away from zero — identical in Spark and DuckDB for doubles) and
    BROUND (banker's HALF_EVEN — no DuckDB builtin, emulated in the
    oracle as 2·round(x/2) on exact halves, which lands on the nearest
    EVEN integer). This is the executable documentation of why r6
    exists and why fixed-fold-order results are emitted unrounded:
    on a .5 boundary the two conventions differ by a full unit.
    Both convention columns are emitted as BIGINT — they are exact
    integers by construction, and the DOUBLE form can carry −0.0
    (DuckDB's 2·round(−0.25) = −0.0 vs Spark bround's BigDecimal +0.0,
    the round-6 driver HASH FAIL): house rule — a hash-checked DOUBLE
    must never be able to carry −0.0; normalize with `+ 0.0` or emit
    an integer type."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    x = (F.col("user_id") % 19).cast("double") - 9.0 + 0.5
    t = ev.select("event_id", x.alias("x"))
    return t.select("event_id", "x",
                    F.round("x").cast("long").alias("half_away"),
                    F.bround("x").cast("long").alias("half_even"))


# ---------------------------------------------------------------------------
# NaN semantics (ordering, aggregation, nanvl escape)
# ---------------------------------------------------------------------------

@query("scalar_nan_semantics", oracle="""
SELECT event_type,
       CAST(count_if(isnan(value)) AS BIGINT) AS n_nan,
       CAST(isnan(MAX(value)) AS BOOLEAN) AS max_is_nan,
       MAX(CASE WHEN isnan(value) THEN NULL ELSE value END)
         AS max_clean,
       MIN(value) AS min_plain
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""")
def scalar_nan_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN SEMANTICS pinned as an operator — the float edge that
    silently corrupts extremes: BOTH engines order NaN GREATER than
    every number (so a single NaN poisons MAX, proven by the
    max_is_nan flag being true wherever the group has one), while MIN
    stays clean; the escape hatch is nanvl→NULL (aggregates skip
    NULL, never NaN) — Spark's nanvl(value, NULL) ≡ the oracle's CASE
    isnan. The op is why every float aggregate in this repo filters
    `~isnan` explicitly rather than trusting the aggregate to cope."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    return (ev.groupBy("event_type")
              .agg(F.count_if(F.isnan("value")).alias("n_nan"),
                   F.isnan(F.max("value")).alias("max_is_nan"),
                   F.max(F.nanvl("value", F.lit(None).cast("double")))
                    .alias("max_clean"),
                   F.min("value").alias("min_plain")))
