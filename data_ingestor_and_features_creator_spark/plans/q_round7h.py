"""Round-7h operator additions: PII scrubbing audit, fixed-width
ingest, pinball (quantile) loss, and Cochran's Q.

Provenance (SURVEY.md §0 applies — empty reference checkout): PII
regex scrubbing is the standard C4/CCNet-style cleaning step [PK];
fixed-width records are the classic mainframe/financial interchange
layout [PK]; pinball loss is the quantile-regression scoring rule
(Koenker [PK]); Cochran's Q is the k-treatment extension of McNemar
[PK].

Float discipline: pinball losses are full-precision doubles
string-routed through DECIMAL with means emitted UNROUNDED; Cochran's
Q is exact-integer arithmetic into one unrounded quotient; the PII
and fixed-width ops are string/integer exact. Regex note: patterns
are restricted to the syntax subset where Java regex (Spark) and RE2
(DuckDB) agree — no backrefs, no lookaround, explicit char classes.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_str, dsum_str_sql
from .registry import query, scratch_dir

_EMAIL = "[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\\.[A-Za-z][A-Za-z]+"
_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


# ---------------------------------------------------------------------------
# PII scrub audit (emails + phone numbers)
# ---------------------------------------------------------------------------

@query("audit_pii_scrub_regex", oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' or 555-' || lpad(CAST(doc_id % 1000
                           AS VARCHAR), 3, '0') || '-4567'
                      ELSE '' END AS text
  FROM documents),
s AS (
  SELECT doc_id, source,
         CAST(length(regexp_extract_all(text, '{_EMAIL}'))
              AS BIGINT) AS n_emails,
         CAST(length(regexp_extract_all(text, '{_PHONE}'))
              AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(text, '{_EMAIL}', '<EMAIL>',
                        'g'), '{_PHONE}', '<PHONE>', 'g') AS clean
  FROM d)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       CAST(SUM(CASE WHEN regexp_matches(clean, '{_EMAIL}')
                     OR regexp_matches(clean, '{_PHONE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_leaks,
       CAST(SUM(length(clean)) AS BIGINT) AS clean_chars
FROM s GROUP BY source
""")
def audit_pii_scrub_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII SCRUB AUDIT [PK — the C4/CCNet-style cleaning step every
    LLM corpus runs]: detect and redact emails and NANP phone numbers,
    then PROVE the redaction complete — n_leaks counts documents
    where a PII pattern still matches AFTER scrubbing, and must be 0;
    per-source detection totals and post-scrub char mass make the
    scrubber's effect oracle-observable. The fixture corpus carries
    no organic PII, so deterministic synthetic PII is INJECTED
    identically on both engines (an email per doc, a phone for every
    3rd) — the op verifies the SCRUBBER, not the corpus. Regex
    dialect note (the real cross-engine trap): Spark compiles Java
    regex, DuckDB RE2 — the patterns here stay inside their common
    subset (explicit classes, bounded repetition, no lookaround), the
    only spelling verified to count and replace identically. One
    zero-shuffle projection + a source-level aggregate; at 100 TB the
    scrub runs at ingest inside codegen."""
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" or 555-"),
                        F.lpad((F.col("doc_id") % 1000).cast("string"),
                               3, "0"),
                        F.lit("-4567"))).otherwise(F.lit("")))
    d = docs.select("doc_id", "source", injected.alias("text"))
    clean = F.regexp_replace(
        F.regexp_replace("text", _EMAIL, "<EMAIL>"),
        _PHONE, "<PHONE>")
    s = d.select(
        "source",
        F.size(F.expr(f"regexp_extract_all(text, '{_EMAIL}', 0)"))
        .cast("long").alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{_PHONE}', 0)"))
        .cast("long").alias("n_phones"),
        clean.alias("clean"))
    leak = F.when(F.col("clean").rlike(_EMAIL)
                  | F.col("clean").rlike(_PHONE), 1).otherwise(0)
    return (s.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_emails").alias("total_emails"),
                 F.sum("n_phones").alias("total_phones"),
                 F.sum(leak).alias("n_leaks"),
                 F.sum(F.length("clean")).alias("clean_chars")))


# ---------------------------------------------------------------------------
# Fixed-width record ingest (mainframe layout)
# ---------------------------------------------------------------------------

@query("scan_fixed_width", oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents_sum
FROM orders GROUP BY o_orderstatus
""")
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH RECORD round trip [PK — the mainframe/financial
    interchange layout Spark has no native reader for]: orders are
    serialized as 36-char records (orderkey 12, status 1, price 15 at
    2 dp, right-aligned space-padded — format_string), written
    through the TEXT sink, read back with spark.read.text, and parsed
    by POSITION (substring + trim + cast) — the whole reader is a
    zero-shuffle codegen projection, which is the point: fixed-width
    parsing at 100 TB is scan-speed, no delimiter scanning, no quote
    states. The oracle re-derives the expected aggregate from the
    SOURCE table, so any padding/parse/round-trip defect (truncated
    key, sign eaten by the pad, price losing cents) moves key_sum or
    cents_sum. Prices compare in integer CENTS — the fixture's 2-dp
    values are exact there; '%.2f' of a 2-dp double prints those
    digits on both the write and the re-derivation. The cents cast is
    ROUND-then-CAST on both engines: price·100 sits ~1e-10 off an
    integer, and a bare double→BIGINT cast TRUNCATES in Spark but
    ROUNDS in DuckDB (caught by this oracle on first run)."""
    orders = load_table(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("fixed_width"), "orders.txt")
    rec = F.format_string("%12d%1s%15.2f", F.col("o_orderkey"),
                          F.col("o_orderstatus"), F.col("o_totalprice"))
    orders.select(rec.alias("value")).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.trim(F.substring("value", 1, 12)).cast("bigint")
        .alias("o_orderkey"),
        F.substring("value", 13, 1).alias("status"),
        F.trim(F.substring("value", 14, 15)).cast("double")
        .alias("price"))
    return (parsed.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").alias("key_sum"),
                 F.sum(F.round(F.col("price") * 100, 0).cast("bigint"))
                 .alias("cents_sum")))


# ---------------------------------------------------------------------------
# Pinball (quantile) loss for a first-half quantile forecaster
# ---------------------------------------------------------------------------

@query("ml_pinball_loss", oracle=f"""
WITH f AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
           FROM events),
v AS (
  SELECT event_type, value,
         CASE WHEN epoch_us(ts) * 2 <= f.lo + f.hi THEN 1 ELSE 0 END
           AS first_half
  FROM events, f
  WHERE value IS NOT NULL AND NOT isnan(value)),
pred AS (
  SELECT event_type,
         quantile_cont(value, 0.1) AS p10,
         quantile_cont(value, 0.5) AS p50,
         quantile_cont(value, 0.9) AS p90
  FROM v WHERE first_half = 1 GROUP BY event_type),
ev AS (
  SELECT v.event_type, v.value, p.p10, p.p50, p.p90
  FROM v JOIN pred p ON v.event_type = p.event_type
  WHERE v.first_half = 0),
loss AS (
  SELECT event_type, q, CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_str_sql('l')} / COUNT(*) AS mean_pinball
  FROM (
    SELECT event_type, 0.1 AS q,
           GREATEST(0.1 * (value - p10), (0.1 - 1.0) * (value - p10))
             AS l FROM ev
    UNION ALL
    SELECT event_type, 0.5 AS q,
           GREATEST(0.5 * (value - p50), (0.5 - 1.0) * (value - p50))
             AS l FROM ev
    UNION ALL
    SELECT event_type, 0.9 AS q,
           GREATEST(0.9 * (value - p90), (0.9 - 1.0) * (value - p90))
             AS l FROM ev)
  GROUP BY event_type, q)
SELECT event_type, CAST(q AS DOUBLE) AS q, n, mean_pinball FROM loss
""")
def ml_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PINBALL (QUANTILE) LOSS [PK — Koenker's quantile-regression
    scoring rule, the proper score for quantile forecasts]: a p10/
    p50/p90 forecaster fit on the FIRST time half (exact interpolated
    quantiles — Spark percentile ≡ DuckDB quantile_cont) is scored on
    the SECOND half with L_q(y, ŷ) = max(q(y−ŷ), (q−1)(y−ŷ)) — the
    asymmetric loss a pinball-optimal forecast minimizes, which is
    how you detect a quantile model that is secretly predicting the
    mean. Temporal split at the integer-µs midpoint (leakage-safe by
    construction, the chronological-split discipline). Per-row losses
    are identical IEEE arithmetic on identical doubles; their means
    are string-routed DECIMAL ratios emitted UNROUNDED. Shape: one
    first-half quantile pass (per-group sort), broadcast of the tiny
    predictor table back onto the facts, one map-combined loss agg —
    the standard backtest topology at any scale."""
    ev = load_table(spark, sf_dir, "events")
    f_ = ev.agg(F.min(F.unix_micros("ts")).alias("lo"),
                F.max(F.unix_micros("ts")).alias("hi"))
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .crossJoin(F.broadcast(f_))
           .select("event_type", "value",
                   F.when(F.unix_micros("ts") * 2
                          <= F.col("lo") + F.col("hi"), 1).otherwise(0)
                   .alias("first_half")))
    pred = (v.filter(F.col("first_half") == 1)
             .groupBy("event_type")
             .agg(F.expr("percentile(value, 0.1)").alias("p10"),
                  F.expr("percentile(value, 0.5)").alias("p50"),
                  F.expr("percentile(value, 0.9)").alias("p90")))
    test = (v.filter(F.col("first_half") == 0)
             .join(F.broadcast(pred), "event_type"))
    parts = []
    for q, col in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
        diff = F.col("value") - F.col(col)
        loss = F.greatest(F.lit(q) * diff, F.lit(q - 1.0) * diff)
        parts.append(test.select("event_type", F.lit(q).alias("q"),
                                 loss.alias("l")))
    allq = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (allq.groupBy("event_type", "q")
            .agg(F.count(F.lit(1)).alias("n"),
                 (dsum_str("l") / F.count(F.lit(1)))
                 .alias("mean_pinball")))


# ---------------------------------------------------------------------------
# Cochran's Q across k correlated binary treatments
# ---------------------------------------------------------------------------

@query("agg_cochran_q", oracle="""
WITH x AS (
  SELECT user_id,
         MAX(CASE WHEN value > 40.0 THEN 1 ELSE 0 END) AS t1,
         MAX(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS t2,
         MAX(CASE WHEN value > 60.0 THEN 1 ELSE 0 END) AS t3
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(t1) AS BIGINT) AS c1,
         CAST(SUM(t2) AS BIGINT) AS c2,
         CAST(SUM(t3) AS BIGINT) AS c3,
         CAST(SUM(t1 + t2 + t3) AS BIGINT) AS rsum,
         CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS rsq
  FROM x)
SELECT n_blocks, c1, c2, c3,
       CASE WHEN 3 * rsum - rsq > 0 THEN
         2.0 * (3.0 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
                       + CAST(c3 AS DOUBLE) * c3)
                - CAST(rsum AS DOUBLE) * rsum)
         / (3.0 * rsum - rsq)
       END AS cochran_q
FROM s
""")
def agg_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN'S Q [PK — the k-treatment extension of McNemar]: do
    k = 3 binary rules (value thresholds 40/50/60, evaluated per-user
    as 'ever fired') succeed at the same rate across the SAME blocks?
    Q = k(k−1)(kΣC_j² − (ΣR_i)²) / (kΣR_i − ΣR_i²), χ²(k−1) under
    H0 — the screening test before pairwise McNemars, on correlated
    per-user outcomes where independent χ² is invalid. Every term is
    an exact integer aggregate (products ≤ 1e10 fit bigint exactly,
    carried through DOUBLE identically); Q is one exact-rational
    quotient emitted UNROUNDED; the degenerate all-equal-rows case
    (denominator 0) yields NULL. One user-level aggregate + one
    scalar reduction — two map-combined shuffles total."""
    ev = load_table(spark, sf_dir, "events")
    x = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .groupBy("user_id")
           .agg(*[F.max(F.when(F.col("value") > thr, 1).otherwise(0))
                  .alias(f"t{i + 1}")
                  for i, thr in enumerate((40.0, 50.0, 60.0))]))
    r = F.col("t1") + F.col("t2") + F.col("t3")
    s = x.agg(F.count(F.lit(1)).alias("n_blocks"),
              F.sum("t1").alias("c1"), F.sum("t2").alias("c2"),
              F.sum("t3").alias("c3"),
              F.sum(r).alias("rsum"),
              F.sum(r * r).alias("rsq"))
    c1d, c2d, c3d = (F.col(c).cast("double") for c in ("c1", "c2", "c3"))
    rsumd, rsqd = F.col("rsum").cast("double"), F.col("rsq").cast("double")
    q = (2.0 * (3.0 * (c1d * c1d + c2d * c2d + c3d * c3d)
                - rsumd * rsumd)
         / (3.0 * rsumd - rsqd))
    return s.select("n_blocks", "c1", "c2", "c3",
                    F.when(3 * F.col("rsum") - F.col("rsq") > 0, q)
                    .alias("cochran_q"))
