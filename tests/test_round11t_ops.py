"""Known-answer tests for the round-11 batch-T operators
(q_round11t): AR(1) half-life, Bartlett's test, L-moments, spline
basis — replayed with independent numpy implementations (L-moments
via the direct combinatorial b_r formula)."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def test_ar1_halflife_vs_numpy(spark, sf_dir, duck):
    daily = duck.execute("""
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS x
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    rows = {r["event_type"]: r for r in
            QUERIES["ts_ar1_halflife"](spark, sf_dir).collect()}
    for t, g in daily.groupby("event_type"):
        x = g.sort_values("d")["x"].to_numpy()
        phi = np.polyfit(x[:-1], x[1:], 1)[0]
        r = rows[t]
        assert r["n"] == len(x) - 1
        assert abs(r["phi"] - phi) < 1e-5
        if 0 < phi < 1:
            assert abs(r["half_life_days"]
                       - math.log(2) / (-math.log(phi))) < 1e-3
        else:
            assert r["half_life_days"] is None


def test_bartlett_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)""").df()
    ns, vs = [], []
    for _, g in df.groupby("event_type"):
        x = g["value"].to_numpy()
        ns.append(len(x))
        vs.append(x.var(ddof=1))
    ns = np.array(ns)
    vs = np.array(vs)
    k = len(ns)
    nt = int(ns.sum())
    sp2 = ((ns - 1) * vs).sum() / (nt - k)
    num = (nt - k) * math.log(sp2) - ((ns - 1) * np.log(vs)).sum()
    c = 1 + ((1 / (ns - 1)).sum() - 1 / (nt - k)) / (3 * (k - 1))
    row = QUERIES["stat_bartlett_test"](spark, sf_dir).collect()[0]
    assert (row["k"], row["n"]) == (k, nt)
    assert abs(row["num"] - num) < 1e-3
    assert abs(row["c_factor"] - c) < 1e-6
    assert abs(row["bartlett_stat"] - num / c) < 1e-3


def test_l_moments_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT l_returnflag AS grp, l_extendedprice AS x
        FROM lineitem""").df()
    rows = {r["grp"]: r for r in
            QUERIES["agg_l_moments"](spark, sf_dir).collect()}
    for grp, g in df.groupby("grp"):
        x = np.sort(g["x"].to_numpy())
        n = len(x)
        i = np.arange(1, n + 1)
        b0 = x.mean()
        b1 = (x * (i - 1) / (n - 1)).sum() / n
        b2 = (x * (i - 1) * (i - 2) / ((n - 1) * (n - 2))).sum() / n
        b3 = (x * (i - 1) * (i - 2) * (i - 3)
              / ((n - 1) * (n - 2) * (n - 3))).sum() / n
        l1, l2 = b0, 2 * b1 - b0
        l3 = 6 * b2 - 6 * b1 + b0
        l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
        r = rows[grp]
        assert r["n"] == n
        assert abs(r["l1"] - l1) < 1e-4
        assert abs(r["l2"] - l2) < 1e-4
        assert abs(r["t3"] - l3 / l2) < 1e-5
        assert abs(r["t4"] - l4 / l2) < 1e-5
        # L-moment sanity: l2 > 0, |t3|,|t4| < 1
        assert r["l2"] > 0 and abs(r["t3"]) < 1 and abs(r["t4"]) < 1


def test_spline_basis_vs_numpy(spark, sf_dir, duck):
    df = duck.execute(
        "SELECT c_custkey, c_acctbal AS x FROM customer"
        " ORDER BY c_custkey").df()
    ks = (-3000.0, 0.0, 3000.0, 6000.0)
    km, km1 = ks[-1], ks[-2]

    def dk(x, k):
        return (np.maximum(x - k, 0.0) ** 3
                - np.maximum(x - km, 0.0) ** 3) / (km - k)

    x = df["x"].to_numpy()
    n1 = (dk(x, ks[0]) - dk(x, km1)) / 1e6
    n2 = (dk(x, ks[1]) - dk(x, km1)) / 1e6
    rows = QUERIES["feature_spline_basis"](spark, sf_dir).collect()
    assert len(rows) == len(df)
    got = {r["c_custkey"]: r for r in rows}
    for idx, key in enumerate(df["c_custkey"]):
        r = got[key]
        assert abs(r["b_n1"] - n1[idx]) < 1e-5
        assert abs(r["b_n2"] - n2[idx]) < 1e-5
        assert abs(r["b_lin"] - x[idx]) < 1e-6
