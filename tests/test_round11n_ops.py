"""Known-answer tests for the round-11 batch-N operators
(q_round11n): Breusch-Pagan, Chow, weighted kappa, jackknife ratio
variance — replayed with independent numpy/pandas reimplementations
(the jackknife additionally via the LITERAL delete-1 loop, proving
the closed form)."""

from __future__ import annotations

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def _spend(duck):
    return duck.execute("""
        SELECT c.c_acctbal AS x, COALESCE(o.tot, 0.0) AS y
        FROM customer c
        LEFT JOIN (SELECT o_custkey, SUM(o_totalprice) AS tot
                   FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey""").df()


def test_breusch_pagan_vs_numpy(spark, sf_dir, duck):
    df = _spend(duck)
    x, y = df["x"].to_numpy(), df["y"].to_numpy()
    b, a = np.polyfit(x, y, 1)
    e = y - (a + b * x)
    u = (e / 1000.0) ** 2
    r = np.corrcoef(x, u)[0, 1]
    row = QUERIES["stat_breusch_pagan"](spark, sf_dir).collect()[0]
    assert row["n"] == len(x)
    assert abs(row["aux_r2"] - r * r) < 1e-5
    assert abs(row["bp_lm"] - len(x) * r * r) < 1e-2


def test_chow_vs_numpy(spark, sf_dir, duck):
    daily = duck.execute("""
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS y
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    import pandas as pd
    brk = pd.Timestamp(2024, 1, 16)
    rows = {r["event_type"]: r for r in
            QUERIES["stat_chow_test"](spark, sf_dir).collect()}
    for t, g in daily.groupby("event_type"):
        g = g.sort_values("d")
        y = g["y"].to_numpy()
        tt = np.arange(1, len(y) + 1, dtype=float)
        seg = (g["d"] >= brk).to_numpy()

        def rss(xx, yy):
            if len(xx) < 3:
                return 0.0
            b, a = np.polyfit(xx, yy, 1)
            return float(((yy - a - b * xx) ** 2).sum())

        rss_p = rss(tt, y)
        rss_12 = rss(tt[~seg], y[~seg]) + rss(tt[seg], y[seg])
        n = len(y)
        f = ((rss_p - rss_12) / 2.0) / (rss_12 / (n - 4))
        r = rows[t]
        assert r["n"] == n
        assert abs(r["rss_pooled"] - rss_p) < 1e-3
        assert abs(r["rss_split"] - rss_12) < 1e-3
        assert abs(r["chow_f"] - f) < 1e-3


def test_weighted_kappa_vs_python(spark, sf_dir, duck):
    df = duck.execute("""
        WITH v AS (
          SELECT l_orderkey AS item, l_returnflag AS cat,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey,
                              l_extendedprice, l_returnflag) AS rn
          FROM lineitem)
        SELECT item,
               MAX(CASE WHEN rn = 1 THEN cat END) AS c1,
               MAX(CASE WHEN rn = 2 THEN cat END) AS c2
        FROM v WHERE rn <= 2 GROUP BY item HAVING COUNT(*) = 2""").df()
    cats = sorted(set(df["c1"]) | set(df["c2"]))
    k = len(cats)
    ci = {c: i for i, c in enumerate(cats)}
    i = df["c1"].map(ci).to_numpy()
    j = df["c2"].map(ci).to_numpy()
    n = len(df)
    w = lambda a, b: (a - b) ** 2 / (k - 1) ** 2
    d_o = float(np.mean(w(i, j)))
    m1 = np.bincount(i, minlength=k)
    m2 = np.bincount(j, minlength=k)
    d_e = sum(m1[a] * m2[b] * w(a, b)
              for a in range(k) for b in range(k)) / (n * n)
    row = QUERIES["ml_weighted_kappa"](spark, sf_dir).collect()[0]
    assert (row["n"], row["k"]) == (n, k)
    assert abs(row["d_o"] - d_o) < 1e-5
    assert abs(row["d_e"] - d_e) < 1e-5
    assert abs(row["kappa_w"] - (1 - d_o / d_e)) < 1e-4


def test_jackknife_vs_literal_delete1(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT l_returnflag AS grp, l_extendedprice AS y,
               l_quantity AS x FROM lineitem""").df()
    rows = {r["grp"]: r for r in
            QUERIES["agg_jackknife_ratio_variance"](
                spark, sf_dir).collect()}
    for grp, g in df.groupby("grp"):
        y = g["y"].to_numpy()
        x = g["x"].to_numpy()
        n = len(y)
        thetas = np.array([(y.sum() - y[idx]) / (x.sum() - x[idx])
                           for idx in range(n)])
        var_j = (n - 1) / n * ((thetas - thetas.mean()) ** 2).sum()
        r = rows[grp]
        assert r["n"] == n
        assert abs(r["ratio"] - y.sum() / x.sum()) < 1e-6
        assert abs(r["var_jack"] - var_j) < 1e-5
        assert abs(r["se_jack"] - var_j ** 0.5) < 1e-5
