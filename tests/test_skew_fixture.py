"""Skewed-key blow-up gate (VERDICT r5 ask 6).

``testdata_derived/skew`` (tools/gen_derived.py --skew) plants ONE hot
key holding 20% of the rows in each fact: user_id 9999999 in the 1M-row
events blow-up, o_custkey 424242 in the 1.5M-row orders blow-up. This
module proves the three skew valves the 100 TB design names on data
that actually has the pathology:

1. the pre-flight audit (audit_join_key_skew) FLAGS the hot key,
2. the salting ops' equal-results contract holds under real skew
   (oracle-green on the skewed fixture),
3. AQE's runtime skew-join split FIRES on an SMJ keyed by the hot key
   (plan evidence: skewed AQEShuffleRead in the final adaptive plan),
4. a window family op stays oracle-correct with one 200k-row fat
   partition (the degenerate shape salting exists to avoid is still
   CORRECT when it happens).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import assert_same_result, duck_fetch

SKEW_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_derived", "skew")

needs_skew = pytest.mark.skipif(
    not os.path.isdir(SKEW_DIR),
    reason="generated fixture missing — run tools/gen_derived.py --skew")

HOT_USER = 9999999
HOT_CUST = 424242


@pytest.fixture(scope="module")
def skew_duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SKEW_DIR}/{t}.parquet'")
    yield con
    con.close()


def _oracle_check(name, spark, con):
    import __spark_entry__ as e

    qs, orc = e.queries(), e.oracle_sql()
    sdf = qs[name](spark, SKEW_DIR)
    spdf = sdf.toPandas()
    dpdf = duck_fetch(con, orc[name])
    assert_same_result(
        name, list(spdf.columns),
        list(spdf.itertuples(index=False, name=None)),
        list(dpdf.columns),
        list(dpdf.itertuples(index=False, name=None)))
    return spdf


@needs_skew
def test_fixture_has_the_planted_skew(skew_duck):
    share_u, share_c = skew_duck.execute(
        f"SELECT (SELECT count(*) FILTER (user_id = {HOT_USER}) * 1.0 "
        f"        / count(*) FROM events), "
        f"       (SELECT count(*) FILTER (o_custkey = {HOT_CUST}) * 1.0 "
        f"        / count(*) FROM orders)").fetchone()
    assert share_u >= 0.15 and share_c >= 0.15, (share_u, share_c)


@needs_skew
def test_skew_audit_flags_the_hot_key(spark, skew_duck):
    """audit_join_key_skew must surface o_custkey 424242 as rank-1 with
    ~20% of all rows and a max/median ratio in the tens of thousands —
    the 'don't shuffle on this key unguarded' verdict."""
    pdf = _oracle_check("audit_join_key_skew", spark, skew_duck)
    top = pdf.sort_values("rk").iloc[0]
    assert int(top["hot_key"]) == HOT_CUST
    assert int(top["cnt"]) >= 0.15 * int(top["n_rows"])
    assert int(top["max_cnt"]) >= 1000 * int(top["median_cnt"])


@needs_skew
def test_salted_ops_equal_results_under_skew(spark, skew_duck):
    """The salting contract — bit-identical results to the plain
    shuffle — proven on data where the salt actually matters."""
    _oracle_check("agg_salted_skew", spark, skew_duck)
    _oracle_check("join_salted_skew", spark, skew_duck)


@needs_skew
def test_window_family_correct_on_fat_partition(spark, skew_duck):
    """One user holds 200k rows: the per-user window sort runs as a
    single fat partition and must still be oracle-exact."""
    _oracle_check("win_anomaly_zscore", spark, skew_duck)


# Round-7 extension (VERDICT r6 ask 8): every round-6/7 window op
# whose FRAME the hot key changes (trailing bands, cumulative
# detectors, per-key regressions — a 200k-row partition exercises
# frame eviction, running sums, and rank paths the uniform fixtures
# never stress) must stay oracle-exact on the planted-skew data.
SKEW_WINDOW_IDS = [
    "win_donchian_channel", "win_kaufman_er", "win_rolling_iqr_anomaly",
    "agg_page_hinkley_drift", "ts_adf_stat", "ab_sequential_sprt",
    "win_bollinger_bands", "win_decay_score", "win_cusum_drift",
    "win_rolling_skew_kurt",
    # round 10: the new frame op under the fat partition, plus
    # hrv_sampen whose in-plan input cap EXISTS because of this
    # fixture's 200k-beat hot record
    "win_rolling_sharpe", "hrv_sampen", "ts_pacf_durbin_levinson",
    # round 11 session 2: the rank family under the hot-key value
    # skew, and the LOF whose duplicate-cluster regularizer exists
    # because this fixture's 10x replication put exact copies at
    # every daily point
    "stat_brunner_munzel", "stat_anderson_darling_2samp",
    "stat_wasserstein_1d", "stat_cramer_von_mises_2samp",
    "stat_ansari_bradley", "ml_lof_daily", "ml_conformal_split_interval",
    # round 11 session 3: per-user window ops under the 200k-row fat
    # partition, the rank/window stats over the hot-key value skew,
    # and the power-degenerate spectral guard this fixture exposed
    "win_rolling_sortino", "win_adx_dmi", "win_macd",
    "stat_fligner_killeen", "agg_huber_m_location",
    "ts_spectral_entropy", "stat_changepoint_cusum_mean",
]


@needs_skew
@pytest.mark.parametrize("name", SKEW_WINDOW_IDS)
def test_round7_window_ops_correct_under_skew(name, spark, skew_duck):
    _oracle_check(name, spark, skew_duck)


@needs_skew
def test_aqe_skew_join_split_fires(spark):
    """A merge join of the hot-custkey orders against the customer
    table: the hot key's shuffle partition is ~20% of the bytes, and
    with skew thresholds scaled to the fixture AQE must SPLIT it — the
    final adaptive plan shows SortMergeJoin(skew=true) over a skewed
    AQEShuffleRead. Two constraints this test pins, both 100 TB design
    facts:
    - thresholds: production defaults need a 256 MB partition; the
      fixture is ~30 MB total, so they are lowered runtime-side — the
      MECHANISM is what's pinned, the defaults differ in constants;
    - shape: OptimizeSkewedJoin only matches Sort DIRECTLY over the
      shuffle stage on both sides. A pre-join aggregate (groupBy
      below the join) interposes a HashAggregate and the rule skips
      — verified while building this test. Where the skewed side must
      be pre-aggregated, AQE won't save you; that regime is exactly
      what join_salted_skew/agg_salted_skew exist for."""
    from data_ingestor_and_features_creator_spark.catalog import load_table

    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "100k")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        od = load_table(spark, SKEW_DIR, "orders")
        cu = load_table(spark, SKEW_DIR, "customer")
        joined = (od.join(cu.hint("merge"),
                          od.o_custkey == cu.c_custkey)
                    .groupBy("o_orderstatus")
                    .agg(F.count(F.lit(1)).alias("n")))
        rows = joined.collect()
        assert sum(int(r["n"]) for r in rows) > 1_000_000  # hot rows kept
        final = joined._jdf.queryExecution().executedPlan().toString()
        # SortMergeJoin(skew=true) is the authoritative marker that the
        # split ran (the AQEShuffleRead detail line prints only under
        # some partition layouts — session-dependent).
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            conf.set(k, v)
