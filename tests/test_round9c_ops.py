"""Known-answer and invariant tests for the round-9c batch (learning
curve, M4, grid DBSCAN, JS divergence, Welch ANOVA, retention
half-life, rolling beta, rolling distinct users)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark.catalog import load_table
from data_ingestor_and_features_creator_spark.plans import q_round9c


def _with_events(monkeypatch, df):
    monkeypatch.setattr(q_round9c, "load_table", lambda s, d, n: df)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_m4_picks_and_tiebreaks(spark, monkeypatch):
    """Planted bucket: first/last by time, min/max by value; the
    duplicated minimum must resolve to the EARLIEST occurrence and
    the duplicated maximum to the LATEST (struct-order tiebreak)."""
    rows = [
        (1, "2024-02-01 00:00:00", 1, "click", 5.0),
        (1, "2024-02-01 01:00:00", 2, "click", 1.0),   # min, earliest
        (1, "2024-02-01 02:00:00", 3, "click", 9.0),
        (1, "2024-02-01 03:00:00", 4, "click", 1.0),   # min, later
        (1, "2024-02-01 04:00:00", 5, "click", 9.0),   # max, latest
        (1, "2024-02-01 05:00:00", 6, "click", 7.0),
    ]
    _with_events(monkeypatch, _ev(spark, rows))
    r = q_round9c.time_downsample_m4(spark, "ignored").collect()
    assert len(r) == 1
    row = r[0]
    assert row["n"] == 6
    assert row["v_first"] == 5.0 and row["v_last"] == 7.0
    assert row["v_min"] == 1.0 and row["v_max"] == 9.0
    import datetime as dt
    assert row["ts_min_us"] == int(dt.datetime(
        2024, 2, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert row["ts_max_us"] == int(dt.datetime(
        2024, 2, 1, 4, tzinfo=dt.timezone.utc).timestamp() * 1e6)


def test_learning_curve_nesting_invariants(spark, sf_dir):
    """Train sizes grow with the fraction, the test split is fixed
    (n_scored + n_unseen constant), errors are finite and the 100%
    slice MSE matches a direct computation."""
    rows = sorted(q_round9c.ml_learning_curve(spark, sf_dir).collect(),
                  key=lambda r: r["frac_pct"])
    assert [r["frac_pct"] for r in rows] == [10, 25, 50, 100]
    trains = [r["n_train"] for r in rows]
    assert trains == sorted(trains)
    tests = {r["n_scored"] + r["n_unseen"] for r in rows}
    assert len(tests) == 1
    for r in rows:
        assert r["mse"] >= 0 and r["mae"] >= 0
    # direct 100%-slice check
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value")
                  & F.col("user_id").isNotNull())
          .select("event_type", "value",
                  (((F.col("user_id") % 1000003) * F.lit(2654435761))
                   % 1000003 % 100).alias("h")))
    pdf = ev.toPandas()
    tr = pdf[pdf.h < 80].groupby("event_type")["value"].mean()
    te = pdf[pdf.h >= 80]
    pred = te.event_type.map(tr)
    mse = float(((te.value - pred) ** 2).mean())
    assert rows[-1]["mse"] == pytest.approx(mse, rel=1e-9)


def test_grid_dbscan_finds_planted_blobs(spark, sf_dir):
    """The five planted 2-cell blobs at y=50 must each surface as a
    cluster with the exact bounding box; planted clusters dominate
    the point mass."""
    rows = q_round9c.geo_grid_dbscan(spark, sf_dir).collect()
    planted = {(r["x_min"], r["x_max"]): r for r in rows
               if r["y_min"] == 50 and r["y_max"] == 50}
    for k in range(5):
        box = (100 + 3 * k, 101 + 3 * k)
        assert box in planted, (box, sorted(planted))
        assert planted[box]["n_cells"] == 2
    assert len(rows) >= 5


def test_js_divergence_bounded_and_symmetric_form(spark, sf_dir):
    """JS = Σ contributions must lie in [0, ln 2 + ε]; each
    contribution must match the direct formula with 9-dp-pinned
    logs."""
    rows = q_round9c.stat_js_divergence(spark, sf_dir).collect()
    total = sum(r["js_contrib"] for r in rows)
    assert -1e-9 <= total <= math.log(2) + 1e-6
    for r in rows:
        p, q = r["p"], r["q"]
        m = (p + q) / 2
        ln = lambda x: round(math.log(x), 9)  # noqa: E731
        want = 0.5 * p * (ln(p) - ln(m)) + 0.5 * q * (ln(q) - ln(m))
        assert r["js_contrib"] == pytest.approx(want, abs=2e-6)


def test_welch_anova_matches_numpy(spark, sf_dir):
    """W and df2 must match an independent numpy evaluation of
    Welch's formulas on the same groups."""
    pdf = (load_table(spark, sf_dir, "events")
           .filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", "value").toPandas())
    groups = [g["value"].to_numpy() for _, g in pdf.groupby("event_type")
              if len(g) > 1 and g["value"].var(ddof=1) > 0]
    n = np.array([len(g) for g in groups], dtype=float)
    mean = np.array([g.mean() for g in groups])
    var = np.array([g.var(ddof=1) for g in groups])
    w = n / var
    k = len(groups)
    xw = (w * mean).sum() / w.sum()
    lam = (((1 - w / w.sum()) ** 2) / (n - 1)).sum()
    w_stat = ((w * (mean - xw) ** 2).sum() / (k - 1)) / (
        1 + 2 * (k - 2) * lam / (k * k - 1))
    df2 = (k * k - 1) / (3 * lam)
    r = q_round9c.stat_welch_anova(spark, sf_dir).collect()[0]
    assert r["k"] == k
    assert r["w_stat"] == pytest.approx(w_stat, rel=1e-6)
    assert r["df2"] == pytest.approx(df2, rel=1e-6)


def test_half_life_planted_cohort(spark, monkeypatch):
    """4 users start on day 0; 2 remain on day 1 (2·2 ≤ 4 → half-life
    1); a fully-churned gap age must also trigger (user absent rows
    count as inactive)."""
    rows = []
    for u in range(1, 5):
        rows.append((u, "2024-04-01 10:00:00", u, "click", 1.0))
    for u in (1, 2):
        rows.append((u, "2024-04-02 10:00:00", 10 + u, "click", 1.0))
    # keep the span alive to day 3 via a second cohort
    rows.append((9, "2024-04-04 10:00:00", 99, "click", 1.0))
    _with_events(monkeypatch, _ev(spark, rows))
    out = {str(r["cohort"]): r for r in
           q_round9c.agg_retention_half_life(spark, "x").collect()}
    r = out["2024-04-01"]
    assert r["cohort_size"] == 4
    assert r["half_life_days"] == 1


def test_rolling_beta_proportional_market(spark, monkeypatch):
    """If every type's daily series is identical, the market is 5×
    each series, so the rolling OLS slope must be exactly 1/5 once
    the frame fills."""
    rows = []
    types = ["a", "b", "c", "d", "e"]
    for d in range(20):
        for i, t in enumerate(types):
            rows.append((1, f"2024-05-{d + 1:02d} 10:00:00",
                         d * 5 + i, t, 10.0 + d * 0.37))
    _with_events(monkeypatch, _ev(spark, rows))
    out = q_round9c.win_rolling_beta(spark, "x").collect()
    filled = [r for r in out if r["beta"] is not None]
    assert filled
    for r in filled:
        assert r["beta"] == pytest.approx(0.2, abs=1e-9)


def test_rolling_distinct_users_bruteforce(spark, sf_dir):
    """Rolling 7-day distinct vs a pandas brute force."""
    pdf = (load_table(spark, sf_dir, "events")
           .filter(F.col("user_id").isNotNull())
           .select("user_id", F.to_date("ts").alias("day"))
           .distinct().toPandas())
    got = {str(r["day"]): r for r in
           q_round9c.win_rolling_distinct_users(spark, sf_dir).collect()}
    import datetime as dt
    days = sorted(pdf.day.unique())
    assert len(got) == len(days)
    for d in days:
        lo = d - dt.timedelta(days=6)
        win = pdf[(pdf.day >= lo) & (pdf.day <= d)]
        assert got[str(d)]["wau"] == win.user_id.nunique()
        assert got[str(d)]["dau"] == pdf[pdf.day == d].user_id.nunique()


def test_except_intersect_identities(spark, sf_dir):
    """Set-op algebra on the registered result: except ∪ intersect =
    distinct(open); multiset counts dominate their distinct twins."""
    from data_ingestor_and_features_creator_spark.plans.q_round9d import (
        sql_except_intersect)
    rows = q = sql_except_intersect(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r["op"], {})[r["o_custkey"]] = r["multiplicity"]
    exc, inter = set(by.get("except", {})), set(by.get("intersect", {}))
    exc_all = by.get("except_all", {})
    int_all = by.get("intersect_all", {})
    assert not (exc & inter)
    assert set(exc_all) >= exc
    assert set(int_all) == inter  # intersect-all keys = intersect keys
    for k in inter:
        assert int_all[k] >= 1
    for r in rows:
        assert r["multiplicity"] >= 1


def test_funnel_ttc_brute_force(spark, sf_dir):
    """p50/p90 delays must equal numpy rank picks over the per-user
    first-signup→first-subsequent-purchase delays."""
    import datetime as dt  # noqa: F401
    from data_ingestor_and_features_creator_spark.plans.q_round9d import (
        funnel_time_to_convert)
    pdf = (load_table(spark, sf_dir, "events")
           .filter(F.col("user_id").isNotNull()
                   & F.col("event_type").isin("signup", "purchase"))
           .select("user_id", "event_type",
                   F.unix_micros("ts").alias("us")).toPandas())
    delays = []
    n_signup = 0
    for uid, g in pdf.groupby("user_id"):
        s = g[g.event_type == "signup"].us
        if s.empty:
            continue
        n_signup += 1
        s0 = s.min()
        p = g[(g.event_type == "purchase") & (g.us >= s0)].us
        if not p.empty:
            delays.append(int(p.min() - s0))
    delays.sort()
    r = funnel_time_to_convert(spark, sf_dir).collect()[0]
    assert r["n_signup_users"] == n_signup
    assert r["n_converted"] == len(delays)
    if delays:
        assert r["p50_delay_us"] == delays[
            int(np.ceil(0.5 * len(delays))) - 1]
        assert r["p90_delay_us"] == delays[
            int(np.ceil(0.9 * len(delays))) - 1]


def test_cochran_armitage_trend_matches_numpy(spark, sf_dir):
    """z² must match the direct Cochran-Armitage formula computed by
    numpy from the same dose table."""
    from data_ingestor_and_features_creator_spark.plans.q_round9e import (
        stat_cochran_armitage_trend)
    pdf = (load_table(spark, sf_dir, "events")
           .select((F.hour("ts").cast("long") / 6).cast("long")
                   .alias("dose"),
                   F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0).alias("hit")).toPandas())
    g = pdf.groupby("dose").agg(n=("hit", "size"), r=("hit", "sum"))
    n = g.n.to_numpy(float)
    r = g.r.to_numpy(float)
    d = g.index.to_numpy(float)
    big_n, big_r = n.sum(), r.sum()
    t = (r * d).sum() - big_r * (n * d).sum() / big_n
    p = big_r / big_n
    var = p * (1 - p) * ((n * d * d).sum() - (n * d).sum() ** 2 / big_n)
    row = stat_cochran_armitage_trend(spark, sf_dir).collect()[0]
    assert row["z_squared"] == pytest.approx(t * t / var, rel=1e-9)


def test_bayes_beta_binomial_identities(spark, sf_dir):
    """Posterior parameters must satisfy the conjugate identities and
    shrink the MLE toward the uniform prior mean 1/2."""
    from data_ingestor_and_features_creator_spark.plans.q_round9e import (
        ab_bayes_beta_binomial)
    rows = ab_bayes_beta_binomial(spark, sf_dir).collect()
    assert {r["variant"] for r in rows} == {"treatment", "control"}
    for r in rows:
        assert r["alpha_post"] == 1 + r["x"]
        assert r["beta_post"] == 1 + r["n"] - r["x"]
        assert r["alpha_post"] + r["beta_post"] == r["n"] + 2
        mle = r["x"] / r["n"]
        assert abs(r["post_mean"] - 0.5) <= abs(mle - 0.5) + 1e-12
        assert (r["shrinkage"] > 0) == (mle < 0.5)


def test_schema_contract_green_on_fixture(spark, sf_dir):
    from data_ingestor_and_features_creator_spark.plans.q_round9e import (
        audit_schema_contract)
    rows = audit_schema_contract(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["type_ok"], r
        assert r["within_budget"], r


def test_capture_recapture_identities(spark, sf_dir):
    from data_ingestor_and_features_creator_spark.plans.q_round9e import (
        stat_capture_recapture)
    r = stat_capture_recapture(spark, sf_dir).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    assert r["n1"] + r["n2"] - r["m"] == r["observed"]
    want = (r["n1"] + 1) * (r["n2"] + 1) // (r["m"] + 1) - 1
    assert r["n_hat_chapman"] == want
    assert r["estimate_ge_observed"]


def test_ccf_lag0_is_pearson_and_symmetric_pairs(spark, sf_dir):
    """CCF at lag 0 must equal numpy's Pearson r of the two daily
    series; n_pairs must be symmetric in |lag|."""
    from data_ingestor_and_features_creator_spark.plans.q_round9f import (
        ts_cross_correlation_lags)
    rows = {r["lag"]: r for r in
            ts_cross_correlation_lags(spark, sf_dir).collect()}
    d = (load_table(spark, sf_dir, "events")
         .groupBy(F.to_date("ts").alias("day"))
         .agg(F.count_if(F.col("event_type") == "click").alias("x"),
              F.count_if(F.col("event_type") == "purchase").alias("y"))
         .orderBy("day").toPandas())
    r0 = float(np.corrcoef(d.x, d.y)[0, 1])
    assert rows[0]["ccf"] == pytest.approx(r0, rel=1e-9)
    for k in range(1, 6):
        assert rows[k]["n_pairs"] == rows[-k]["n_pairs"]


def test_mh_odds_ratio_matches_numpy(spark, sf_dir):
    from data_ingestor_and_features_creator_spark.plans.q_round9f import (
        stat_odds_ratio_mh)
    pdf = (load_table(spark, sf_dir, "events")
           .filter(F.col("user_id").isNotNull())
           .select((F.hour("ts").cast("long") / 6).cast("long")
                   .alias("st"),
                   (((F.col("user_id") % 1000003) * F.lit(2654435761))
                    % 1000003 % 2 == 0).alias("t"),
                   (F.col("event_type") == "purchase").alias("h"))
           .toPandas())
    num = den = 0.0
    for _, g in pdf.groupby("st"):
        n = len(g)
        a = int((g.t & g.h).sum())
        b = int((g.t & ~g.h).sum())
        c = int((~g.t & g.h).sum())
        d = int((~g.t & ~g.h).sum())
        num += a * d / n
        den += b * c / n
    r = stat_odds_ratio_mh(spark, sf_dir).collect()[0]
    assert r["or_mh"] == pytest.approx(num / den, rel=1e-9)


def test_gumbel_moments_match_numpy(spark, sf_dir):
    from data_ingestor_and_features_creator_spark.plans.q_round9f import (
        agg_gumbel_block_maxima)
    mx = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value"))
          .groupBy(F.to_date("ts").alias("day"))
          .agg(F.max("value").alias("m")).toPandas().m.to_numpy())
    mean, sd = float(mx.mean()), float(mx.std(ddof=1))
    beta = sd * 0.779696801
    mu = mean - 0.577215665 * beta
    r = agg_gumbel_block_maxima(spark, sf_dir).collect()[0]
    assert r["n_blocks"] == len(mx)
    assert r["mean_max"] == pytest.approx(mean, rel=1e-9)
    assert r["gumbel_beta"] == pytest.approx(beta, rel=1e-9)
    assert r["gumbel_mu"] == pytest.approx(mu, rel=1e-9)


def test_theil_and_hhi_match_numpy(spark, sf_dir):
    """Theil T and HHI must match direct numpy computations over the
    same per-user cent totals (with 9-dp-pinned logs for Theil)."""
    from data_ingestor_and_features_creator_spark.plans.q_round9g import (
        agg_herfindahl_index, agg_theil_index)
    pdf = (load_table(spark, sf_dir, "events")
           .filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & F.col("user_id").isNotNull())
           .select("event_type", "user_id",
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents")).toPandas())
    per = pdf.groupby(["event_type", "user_id"]).cents.sum().reset_index()
    theil = {r["event_type"]: r for r in
             agg_theil_index(spark, sf_dir).collect()}
    hhi = {r["event_type"]: r for r in
           agg_herfindahl_index(spark, sf_dir).collect()}
    for et, g in per.groupby("event_type"):
        x = g.cents.to_numpy(float)
        shares = x / x.sum()
        want_hhi = float((shares ** 2).sum())
        assert hhi[et]["hhi"] == pytest.approx(want_hhi, rel=1e-9)
        assert hhi[et]["n_users"] == len(x)
        xp = x[x > 0]
        r = xp * len(xp) / xp.sum()
        want_t = float((r * np.round(np.log(r), 9)).sum() / len(xp))
        assert theil[et]["theil_t"] == pytest.approx(want_t, rel=1e-9)
        assert theil[et]["theil_t"] >= -1e-12  # T >= 0
