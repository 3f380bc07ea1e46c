"""Distributed digest-compare parity (tests/oracle_compare.py).

The digest path computes an order-insensitive per-row 64-bit digest
INSIDE each engine so a correctness check never routes a full result
through the driver (the time_bucket_gapfill 125.8M-row lesson,
BASELINE.md round-5 row). These tests pin the two things the path
depends on:

1. md5-lower-64 parity: Spark's conv(byte-swapped hex) reproduces
   DuckDB's md5_number_lower bit-for-bit (byte order is the easy
   thing to silently get wrong);
2. canonicalization parity per allowed type: the SQL-side canonical
   strings match between engines for every scalar type the house
   rules allow in results — ints, 6-dp doubles (incl NaN/±Inf/-0.0),
   decimals at full scale, dates, booleans, strings, NULLs;
and the two failure modes: a single perturbed cell flips the digest,
and unsupported (complex) types raise instead of degrading.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import (assert_same_digest, duck_digest,
                                  spark_digest)


def test_md5_lower64_parity(spark, duck):
    """Spark conv(byte-swapped md5 hex chars 17..32) == DuckDB
    md5_number_lower, across strings that exercise every byte value
    region (empty, ascii, unicode, separators)."""
    probes = ["", "abc", "hello\x1fworld", "ünïcödé £5 ☃",
              "0" * 100, "\x1f", "a" * 64]
    pairs = "||".join(f"substring(h, {i}, 2)" for i in range(31, 15, -2))
    for s in probes:
        got = spark.sql(
            "SELECT CAST(conv(upper(" + pairs + "), 16, 10) AS STRING) "
            "AS v FROM (SELECT md5(x) AS h FROM VALUES (:s) t(x))",
            args={"s": s}).collect()[0]["v"]
        want = duck.execute("SELECT CAST(md5_number_lower(?) AS VARCHAR)",
                            [s]).fetchone()[0]
        assert got == want, f"lo64 mismatch for {s!r}"


def test_scalar_type_canonicalization_parity(spark, duck):
    """One row per tricky value, every house-rule scalar type at once;
    the two digests agree iff every cell canonicalizes identically."""
    sdf = spark.sql("""
        SELECT * FROM VALUES
          (1L,  CAST(1.25 AS DOUBLE),        CAST('1.5' AS DECIMAL(38,12)),
           DATE'2024-01-31', TRUE,  'plain',        CAST(-7 AS INT)),
          (2L,  CAST(-0.0 AS DOUBLE),        CAST('-0.000001' AS DECIMAL(38,12)),
           DATE'1970-01-01', FALSE, 'ünïcödé £5',   CAST(0 AS INT)),
          (3L,  CAST('NaN' AS DOUBLE),       CAST('12345678901234567890.123456789012' AS DECIMAL(38,12)),
           NULL,             NULL,  NULL,           NULL),
          (4L,  CAST('Infinity' AS DOUBLE),  NULL,
           DATE'9999-12-31', TRUE,  '<NULL>',       CAST(2147483647 AS INT)),
          (5L,  CAST('-Infinity' AS DOUBLE), CAST('0' AS DECIMAL(38,12)),
           DATE'2024-02-29', FALSE, '',             CAST(-2147483648 AS INT)),
          (6L,  NULL,                        CAST('0.000001' AS DECIMAL(38,12)),
           DATE'2024-06-15', TRUE,  'tab\there',    CAST(42 AS INT))
        t(k, d, dec, dt, b, s, i)
    """)
    oracle = """
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(1.25 AS DOUBLE), CAST('1.5' AS DECIMAL(38,12)),
           DATE'2024-01-31', TRUE, 'plain', CAST(-7 AS INTEGER)),
          (2, CAST(-0.0 AS DOUBLE), CAST('-0.000001' AS DECIMAL(38,12)),
           DATE'1970-01-01', FALSE, 'ünïcödé £5', 0),
          (3, 'nan'::DOUBLE, CAST('12345678901234567890.123456789012' AS DECIMAL(38,12)),
           NULL, NULL, NULL, NULL),
          (4, 'infinity'::DOUBLE, NULL,
           DATE'9999-12-31', TRUE, '<NULL>', 2147483647),
          (5, '-infinity'::DOUBLE, CAST('0' AS DECIMAL(38,12)),
           DATE'2024-02-29', FALSE, '', -2147483648),
          (6, NULL, CAST('0.000001' AS DECIMAL(38,12)),
           DATE'2024-06-15', TRUE, 'tab' || chr(9) || 'here', 42)
        ) t(k, d, dec, dt, b, s, i)
    """
    n = assert_same_digest("scalar_parity", sdf, duck, oracle)
    assert n == 6


def test_digest_is_order_insensitive(spark, duck):
    sdf = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"))
    # oracle emits the same multiset in a scrambled order
    oracle = ("SELECT range AS id, range % 7 AS g FROM range(1000) "
              "ORDER BY md5(CAST(range AS VARCHAR))")
    assert_same_digest("order_insensitive", sdf, duck, oracle) == 1000


def test_single_cell_perturbation_flips_digest(spark, duck):
    sdf = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v"))
    bad = ("SELECT range AS id, CASE WHEN range = 617 THEN range * 2 + 1 "
           "ELSE range * 2 END AS v FROM range(1000)")
    with pytest.raises(AssertionError, match="digest mismatch"):
        assert_same_digest("perturbed", sdf, duck, bad)


def test_row_count_mismatch_detected(spark, duck):
    sdf = spark.range(1000).select("id")
    with pytest.raises(AssertionError, match="row count"):
        assert_same_digest("short", sdf, duck,
                           "SELECT range AS id FROM range(999)")


def test_unsupported_complex_type_raises(spark, duck):
    sdf = spark.range(3).select(F.array(F.col("id")).alias("a"))
    with pytest.raises(ValueError, match="unsupported Spark type"):
        spark_digest(sdf)
    with pytest.raises(ValueError, match="unsupported DuckDB type"):
        duck_digest(duck, "SELECT [1, 2] AS a")


def test_empty_result_digests_agree(spark, duck):
    sdf = spark.range(10).filter("id < 0").select("id")
    assert assert_same_digest(
        "empty", sdf, duck, "SELECT range AS id FROM range(10) "
        "WHERE range < 0") == 0


def test_registered_query_end_to_end(spark, duck, sf_dir):
    """The actual target workload: time_bucket_gapfill's Spark plan vs
    its registered oracle through the digest path at sf0.001 (the same
    code path tools/check_subset.py --digest uses at the 30x grid)."""
    import __spark_entry__ as e

    qs, orc = e.queries(), e.oracle_sql()
    sdf = qs["time_bucket_gapfill"](spark, sf_dir)
    n = assert_same_digest("time_bucket_gapfill", sdf, duck,
                           orc["time_bucket_gapfill"])
    assert n > 0


def test_formatter_tie_divergence_pins_the_preround_rule(spark, duck):
    """WHY the digest path requires 6-dp-PRE-ROUNDED floats (round 6,
    found via win_vwap at the 6M-row blow-up): for the SAME double,
    Java's %.6f rounds the shortest decimal repr half-up while C's
    printf rounds the exact binary expansion — 5e-7 (shortest repr a
    7th-digit tie; exact expansion just below it) formats as 0.000001
    in Spark but 0.000000 in DuckDB. This test pins the divergence so
    the precondition can't be 'simplified' away: if either engine
    changes formatter semantics, this fails and the digest rules must
    be re-audited. Unrounded-emitting ops verify on the pandas path."""
    s = spark.sql(
        "SELECT format_string('%.6f', CAST('5e-7' AS DOUBLE)) AS f"
    ).collect()[0]["f"]
    d = duck.execute("SELECT printf('%.6f', '5e-7'::DOUBLE)").fetchone()[0]
    assert s == "0.000001"   # Java: shortest-repr tie, HALF_UP
    assert d == "0.000000"   # C: exact expansion below the tie
    assert f"{5e-7:.6f}" == "0.000000"  # Python sides with C
