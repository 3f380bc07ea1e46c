"""Pins for the round-5 DECIMAL-typed output path (functions/exact.py
scale note): decimals beyond double precision must compare by exact
digits, while everything else keeps the driver-faithful float64
degradation. These are the invariants that make the 22/22 sf1-ish
TPC-H gate trustworthy."""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest

from .oracle_compare import duck_fetch, norm_cell


def test_norm_cell_decimal_beyond_double_is_digit_exact():
    # 22 significant digits — a double cannot hold this; the two cells
    # differ only past digit 16, and MUST normalize differently.
    a = Decimal("12345678901.234567000001")
    b = Decimal("12345678901.234567000002")
    assert norm_cell(a) != norm_cell(b)
    assert norm_cell(a) == "12345678901.234567000001"


def test_norm_cell_decimal_scale_insensitive():
    # Equal values at different declared scales normalize identically.
    assert norm_cell(Decimal("12345678901234567.890000")) == norm_cell(
        Decimal("12345678901234567.89"))


def test_norm_cell_small_decimal_matches_float_pipeline():
    # A decimal that fits a double takes the float path, so a DECIMAL
    # on one engine can still match a float64 on the other (the mixed
    # case every double-typed oracle relies on).
    assert norm_cell(Decimal("5.00")) == norm_cell(5.0)
    assert norm_cell(Decimal("123.456789")) == norm_cell(123.456789)


def test_duck_fetch_keeps_decimal_exact_and_degrades_hugeint():
    con = duckdb.connect()
    sql = ("SELECT CAST('12345678901.234567000001' AS DECIMAL(38,12)) AS d,"
           " SUM(x) AS h FROM (SELECT CAST(3 AS INTEGER) AS x) GROUP BY ALL")
    pdf = duck_fetch(con, sql)
    # scale>0 decimal survives as exact Decimal …
    assert pdf["d"].iloc[0] == Decimal("12345678901.234567000001")
    assert isinstance(pdf["d"].iloc[0], Decimal)
    # … while the HUGEINT image (decimal128(38,0)) degrades to float64
    # exactly like the driver's .df() path.
    assert pdf["h"].dtype.kind == "f"


def test_duck_fetch_plain_query_uses_df_path():
    con = duckdb.connect()
    pdf = duck_fetch(con, "SELECT SUM(x) AS h FROM (SELECT 3 AS x)")
    assert pdf["h"].dtype.kind == "f"  # HUGEINT → float64 via .df()


@pytest.mark.usefixtures()
def test_tpch_q1_output_is_fixed_point_string(spark, sf_dir):
    """Round 8 (driver red r7): the four exact sums leave the query as
    FIXED-POINT STRINGS — digit-exact like the round-5 decimal form,
    but representation-stable through the driver's divergent fetch
    paths (Spark toPandas keeps Decimal, DuckDB .df() degrades to
    float64). Every cell must parse back to a 12-dp decimal exactly —
    i.e. the string IS the full fixed-point print, not scientific
    notation or a truncated float repr."""
    from data_ingestor_and_features_creator_spark import plans

    plans.load_all()
    df = plans.queries()["sql_tpch_q1"](spark, sf_dir)
    types = dict(df.dtypes)
    cols = ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge")
    for c in cols:
        assert types[c] == "string", (c, types[c])
    for row in df.collect():
        for c in cols:
            v = row[c]
            assert "E" not in v and "e" not in v, (c, v)
            frac = v.split(".")[1]
            assert len(frac) == 12, (c, v)
            Decimal(v)  # parses exactly


def test_money_columns_are_exact_2dp(duck):
    """PRECONDITION PIN for the integer-cents exact-sum path (round 8:
    sql_tpch_q1, join_star_multi, join_dpp_partitioned): every money
    column those ops ROUND(x·100)→BIGINT must be an exactly
    representable 2-dp value — then the scaled double is within one
    ulp of an integer, never near a .5 boundary, and Spark's and
    DuckDB's different ROUND/CAST conventions cannot split. A future
    fixture generation that breaks 2-dp-ness fails HERE loudly instead
    of as a silent oracle drift."""
    for table, col in (("lineitem", "l_quantity"),
                       ("lineitem", "l_extendedprice"),
                       ("lineitem", "l_discount"),
                       ("lineitem", "l_tax"),
                       ("orders", "o_totalprice")):
        bad = duck.execute(
            f"SELECT COUNT(*) FROM {table} "
            f"WHERE CAST(ROUND({col} * 100) AS BIGINT) / 100.0 <> {col}"
        ).fetchone()[0]
        assert bad == 0, (table, col, bad)


def test_string_routed_cast_agrees_in_domain(spark, duck):
    """The dsum_dec STRING-routed per-row cast (functions/exact.py)
    must agree between Spark (Java 17 Double.toString) and DuckDB
    (Ryu-style shortest repr) across the per-row domain the bound
    documents (~[1e-11, 1e16]) — probed with deterministic
    fixture-magnitude and adversarial values. Outside the domain the
    KNOWN divergences are pinned (legacy toString's non-minimal
    digits at ≥1e17; sub-quantum rounding below 1e-12) so a JDK or
    DuckDB upgrade that moves the boundary fails loudly here."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    in_domain = ([rng.uniform(0.0001, 200000.0) for _ in range(2500)]
                 + [rng.uniform(0.9, 1.1) * 10 ** rng.randint(-6, 9)
                    for _ in range(2494)]
                 + [0.001, 0.3, 0.1 + 0.2, 123456789.123456789,
                    42034.26, 0.9999999999999999])
    out_domain = [2e23, 1e23]  # legacy-toString non-minimal digits
    vals = in_domain + out_domain
    df = spark.createDataFrame(list(enumerate(vals)), "i long, x double")
    got = {r["i"]: r["d"] for r in df.select(
        "i", F.col("x").cast("string").cast("decimal(38,12)").alias("d")
    ).collect()}
    mismatch = []
    for i, v in enumerate(vals):
        dd = duck.execute(
            "SELECT CAST(CAST(CAST(? AS DOUBLE) AS STRING)"
            " AS DECIMAL(38,12))", [v]).fetchone()[0]
        if dd != got[i]:
            mismatch.append(v)
    assert all(v >= 1e17 for v in mismatch), mismatch[:5]
    assert set(mismatch) == set(out_domain)  # boundary pinned
