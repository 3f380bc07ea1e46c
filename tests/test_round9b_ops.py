"""Known-answer and invariant tests for the round-9b batch (Pettitt,
VIF, DiD, IPTW subclassification, LTV triangle, Granger-lite, Hampel,
quarantine/DLQ). Planted constructions verify the math itself; the
fixture invariants verify the wiring; the DuckDB oracle gate
(tools/check_subset.py, all five fixtures) verifies cross-engine
agreement."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark.plans import (
    q_round9b)
from data_ingestor_and_features_creator_spark.catalog import load_table


def _with_events(monkeypatch, df):
    monkeypatch.setattr(
        q_round9b, "load_table", lambda s, d, n: df)


def test_pettitt_finds_planted_step(spark, monkeypatch):
    """A clean level shift after day k in an n-day series gives
    |U_t| maximal at the shift with K = 2·k(n−k) ... for distinct
    values U_k = k(n−k) per the rank closed form — the test pins the
    closed form and the argmax day."""
    n, k = 20, 10
    rows = []
    for d in range(n):
        v = 1.0 + d * 0.01 if d < k else 100.0 + d * 0.01
        rows.append((1, f"2024-02-{d + 1:02d} 12:00:00", d, "click", v))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _with_events(monkeypatch, df)
    out = q_round9b.stat_changepoint_pettitt(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    # first k days hold ranks 1..k: U_k = k(k+1) - k(n+1) = -k(n-k)
    assert r["k_stat"] == k * (n - k)
    assert r["n_days"] == n
    assert str(r["cp_day"]) == f"2024-02-{k:02d}"


def test_hampel_flags_planted_spike(spark, monkeypatch):
    """One spike inside a gently varying series is the only flag."""
    rows = []
    for i in range(40):
        v = 10.0 + (i % 3) * 0.01 if i != 17 else 500.0
        rows.append((1, f"2024-02-01 00:{i:02d}:00", i, "click", v))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _with_events(monkeypatch, df)
    out = q_round9b.win_hampel_filter(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0]["n"] == 40
    assert out[0]["n_flagged"] == 1


def test_did_hand_computed(spark, monkeypatch):
    """2×2 cells with known means: effect = (8−4) − (3−2) = 3. The
    synthetic users are chosen so the Knuth gate splits them as
    intended (checked inside the test, not assumed)."""
    from data_ingestor_and_features_creator_spark.plans.q_round9b import (
        _treat)
    probe = spark.createDataFrame(
        [(i,) for i in range(40)], "user_id long")
    split = {r["user_id"]: r["t"] for r in
             probe.select("user_id", _treat(F.col("user_id"))
                          .alias("t")).collect()}
    treated = [u for u, t in split.items() if t][:2]
    control = [u for u, t in split.items() if not t][:2]
    assert len(treated) == 2 and len(control) == 2
    rows = []
    # pre-period day 1, post-period day 9 (midpoint of 1..9 span = 4)
    for u in treated:
        rows.append((u, "2024-03-01 10:00:00", 1, "click", 4.0))
        rows.append((u, "2024-03-09 10:00:00", 2, "click", 8.0))
    for u in control:
        rows.append((u, "2024-03-01 10:00:00", 3, "click", 2.0))
        rows.append((u, "2024-03-09 10:00:00", 4, "click", 3.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _with_events(monkeypatch, df)
    r = q_round9b.causal_did_estimator(spark, "ignored").collect()[0]
    assert r["mean_treat_pre"] == pytest.approx(4.0)
    assert r["mean_treat_post"] == pytest.approx(8.0)
    assert r["mean_ctrl_pre"] == pytest.approx(2.0)
    assert r["mean_ctrl_post"] == pytest.approx(3.0)
    assert r["did_effect"] == pytest.approx(3.0)


def test_vif_matches_numpy_inverse(spark, sf_dir):
    """VIF must equal the diagonal of the inverse correlation matrix
    computed by numpy from the same raw features."""
    rows = (load_table(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .select("event_type", "value",
                    F.hour("ts").cast("double").alias("h"),
                    (F.datediff(F.col("ts").cast("date"),
                                F.lit("1970-01-01")) % 7)
                    .cast("double").alias("d"))
            .collect())
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append(
            (r["value"], r["h"], r["d"]))
    got = {}
    for r in q_round9b.feature_vif(spark, sf_dir).collect():
        got[(r["event_type"], r["feature"])] = r["vif"]
    for et, pts in by.items():
        x = np.array(pts)
        corr = np.corrcoef(x, rowvar=False)
        inv = np.linalg.inv(corr)
        for i, feat in enumerate(("value", "hour", "dow")):
            assert got[(et, feat)] == pytest.approx(inv[i, i], rel=1e-4)


def test_granger_matches_numpy_lstsq(spark, sf_dir):
    """Closed-form betas and SSRs must match numpy least squares on
    the identical daily series."""
    d = (load_table(spark, sf_dir, "events")
         .groupBy(F.to_date("ts").alias("day"))
         .agg(F.count_if(F.col("event_type") == "click").alias("x"),
              F.count_if(F.col("event_type") == "purchase").alias("y"))
         .orderBy("day").collect())
    y = np.array([r["y"] for r in d], dtype=float)
    x = np.array([r["x"] for r in d], dtype=float)
    yy, y1, x1 = y[1:], y[:-1], x[:-1]
    af = np.column_stack([np.ones_like(y1), y1, x1])
    bf, *_ = np.linalg.lstsq(af, yy, rcond=None)
    ssr_f = float(((yy - af @ bf) ** 2).sum())
    ar = np.column_stack([np.ones_like(y1), y1])
    br, *_ = np.linalg.lstsq(ar, yy, rcond=None)
    ssr_r = float(((yy - ar @ br) ** 2).sum())
    r = q_round9b.ts_granger_lite(spark, sf_dir).collect()[0]
    assert r["n"] == len(yy)
    assert r["beta_x_lag"] == pytest.approx(bf[2], rel=1e-9, abs=1e-12)
    assert r["ssr_full"] == pytest.approx(ssr_f, rel=1e-9)
    assert r["ssr_restricted"] == pytest.approx(ssr_r, rel=1e-9)
    f_np = (ssr_r - ssr_f) / (ssr_f / (len(yy) - 3))
    assert r["f_stat"] == pytest.approx(f_np, rel=1e-6)


def test_ltv_triangle_conserves_revenue(spark, sf_dir):
    """The triangle partitions total order revenue: the last-age
    cumulative per cohort sums to the grand total; cohort sizes
    partition the customer base."""
    rows = q_round9b.ltv_cohort_triangle(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    total_cents = orders.agg(F.sum(
        F.round(F.col("o_totalprice") * 100).cast("long"))).first()[0]
    n_cust = orders.select("o_custkey").distinct().count()
    last = {}
    sizes = {}
    for r in rows:
        key = r["cohort"]
        if key not in last or r["age"] > last[key][0]:
            last[key] = (r["age"], r["cum_rev_cents"])
        sizes[key] = r["cohort_size"]
        assert r["cum_rev_cents"] >= r["rev_cents"]
        assert r["active_customers"] <= r["cohort_size"]
    assert sum(v for _, v in last.values()) == total_cents
    assert sum(sizes.values()) == n_cust


def test_iptw_contribs_and_dlq_partition(spark, sf_dir):
    """IPTW: stratum shares n/N sum to 1 and p_treat ∈ [0,1].
    DLQ: _valid + _quarantined == _total and every overlapping rule
    count is ≤ _quarantined's upper bound (Σ rules ≥ _quarantined)."""
    strata = q_round9b.causal_iptw_subclass(spark, sf_dir).collect()
    big_n = sum(r["n"] for r in strata)
    assert big_n > 0
    for r in strata:
        assert 0.0 <= r["p_treat"] <= 1.0
        assert r["n_treat"] + r["n_ctrl"] == r["n"]
    dlq = {r["rule"]: r["n"] for r in
           q_round9b.dq_quarantine_dlq(spark, sf_dir).collect()}
    assert dlq["_valid"] + dlq["_quarantined"] == dlq["_total"]
    rule_sum = sum(v for k, v in dlq.items() if not k.startswith("_"))
    assert rule_sum >= dlq["_quarantined"]
