"""Known-answer tests for the round-11 batch-P operators
(q_round11p): Tweedie deviance, Fieller ratio CI, ANCOVA adjusted
means, rolling Sortino — replayed with independent numpy/pandas
reimplementations."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def test_tweedie_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT l_returnflag AS grp, l_quantity AS y
        FROM lineitem""").df()
    rows = {r["grp"]: r for r in
            QUERIES["ml_tweedie_deviance"](spark, sf_dir).collect()}
    p = 1.5
    for grp, g in df.groupby("grp"):
        y = g["y"].to_numpy()
        mu = y.mean()
        d = 2 * (y ** (2 - p) / ((1 - p) * (2 - p))
                 - y * mu ** (1 - p) / (1 - p)
                 + mu ** (2 - p) / (2 - p))
        r = rows[grp]
        assert r["n"] == len(y)
        assert abs(r["mu_hat"] - mu) < 1e-5
        assert abs(r["mean_tweedie_deviance"] - d.mean()) < 1e-4


def test_fieller_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT l_returnflag AS grp, l_extendedprice AS y,
               l_quantity AS x FROM lineitem""").df()
    rows = {r["grp"]: r for r in
            QUERIES["agg_fieller_ratio_ci"](spark, sf_dir).collect()}
    z = 1.96
    for grp, g in df.groupby("grp"):
        y = g["y"].to_numpy()
        x = g["x"].to_numpy()
        n = len(y)
        my, mx = y.mean(), x.mean()
        vy = y.var(ddof=1) / n
        vx = x.var(ddof=1) / n
        cxy = np.cov(y, x, ddof=1)[0, 1] / n
        ratio = my / mx
        gg = 1 - z * z * vx / (mx * mx)
        disc = math.sqrt(vy * mx * mx - 2 * ratio * cxy * mx * mx
                         + ratio * ratio * vx * mx * mx
                         - z * z * (vy * vx - cxy * cxy))
        center = ratio - z * z * cxy / (mx * mx)
        lo = (center - z / (mx * mx) * disc) / gg
        hi = (center + z / (mx * mx) * disc) / gg
        r = rows[grp]
        assert r["n"] == n
        assert abs(r["ratio"] - ratio) < 1e-6
        assert abs(r["g"] - gg) < 1e-6
        assert abs(r["lo95"] - lo) < 1e-5
        assert abs(r["hi95"] - hi) < 1e-5
        assert r["lo95"] < r["ratio"] < r["hi95"]


def test_ancova_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT o.o_orderpriority AS grp, c.c_acctbal AS x,
               o.o_totalprice AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """).df()
    wxy = wxx = 0.0
    for _, g in df.groupby("grp"):
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        wxy += ((x - x.mean()) * (y - y.mean())).sum()
        wxx += ((x - x.mean()) ** 2).sum()
    b = wxy / wxx
    xbar = df["x"].mean()
    rows = {r["grp"]: r for r in
            QUERIES["stat_ancova_adjusted_means"](spark, sf_dir)
            .collect()}
    for grp, g in df.groupby("grp"):
        r = rows[grp]
        assert r["n"] == len(g)
        assert abs(r["common_slope"] - b) < 1e-6
        adj = g["y"].mean() - b * (g["x"].mean() - xbar)
        assert abs(r["raw_mean"] - g["y"].mean()) < 1e-4
        assert abs(r["adjusted_mean"] - adj) < 1e-4


def test_sortino_vs_pandas(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT user_id, event_id, ts, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
        ORDER BY user_id, ts, event_id""").df()
    rows = {(r["user_id"], r["event_id"]): r for r in
            QUERIES["win_rolling_sortino"](spark, sf_dir).collect()}
    n_checked = 0
    for uid, g in df.groupby("user_id"):
        v = g["value"].to_numpy()
        eids = g["event_id"].to_numpy()
        rets = v[1:] - v[:-1]
        for i in range(19, len(rets)):
            w = rets[i - 19:i + 1]
            mean_ret = w.mean()
            dvar = (w[w < 0] ** 2).sum() / 20
            r = rows.get((uid, eids[i + 1]))
            assert r is not None
            assert abs(r["mean_ret"] - mean_ret) < 1e-5
            assert abs(r["downside_dev"] - math.sqrt(dvar)) < 1e-5
            if dvar > 0:
                assert abs(r["sortino"]
                           - mean_ret / math.sqrt(dvar)) < 1e-4
            n_checked += 1
    assert n_checked > 0
