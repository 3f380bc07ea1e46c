"""Known-answer tests for the round-11 batch-K operators
(q_round11k): RDD local-linear, t-closeness, KPSS, spectral entropy —
each replayed with an independent numpy/pandas reimplementation."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def test_rdd_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT c.c_acctbal AS x, COALESCE(o.tot, 0.0) AS y
        FROM customer c
        LEFT JOIN (SELECT o_custkey, SUM(o_totalprice) AS tot
                   FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
        WHERE ABS(c.c_acctbal) <= 3000""").df()
    row = QUERIES["causal_rdd_local_linear"](spark, sf_dir).collect()[0]
    for side, (nk, ak, bk) in ((df["x"] < 0, ("n_l", "intercept_l",
                                              "slope_l")),
                               (df["x"] >= 0, ("n_r", "intercept_r",
                                               "slope_r"))):
        x = df.loc[side, "x"].to_numpy()
        y = df.loc[side, "y"].to_numpy()
        b, a = np.polyfit(x, y, 1)
        assert row[nk] == len(x)
        assert abs(row[ak] - a) < 1e-3
        assert abs(row[bk] - b) < 1e-4
    assert abs(row["rdd_effect"]
               - (row["intercept_r"] - row["intercept_l"])) < 2e-6


def test_t_closeness_vs_pandas(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
        FROM customer""").df()
    bands = np.sort(df["band"].unique())
    m = len(bands)
    q = (df["band"].value_counts(normalize=True)
         .reindex(bands, fill_value=0.0).to_numpy())
    rows = {(r["c_nationkey"], r["c_mktsegment"]): r for r in
            QUERIES["audit_t_closeness"](spark, sf_dir).collect()}
    assert len(rows) == df.groupby(
        ["c_nationkey", "c_mktsegment"]).ngroups
    for key, g in df.groupby(["c_nationkey", "c_mktsegment"]):
        p = (g["band"].value_counts(normalize=True)
             .reindex(bands, fill_value=0.0).to_numpy())
        emd = float(np.abs(np.cumsum(p - q)[:-1]).sum()) / (m - 1)
        r = rows[key]
        assert r["n"] == len(g)
        assert abs(r["emd"] - emd) < 1e-5
        assert r["t_ok"] == (emd <= 0.2 or abs(emd - 0.2) < 1e-12)


def _daily(duck):
    df = duck.execute("""
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS x
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    return {t: g.sort_values("d")["x"].to_numpy()
            for t, g in df.groupby("event_type")}


def test_kpss_vs_numpy(spark, sf_dir, duck):
    series = _daily(duck)
    rows = {r["event_type"]: r for r in
            QUERIES["ts_kpss_stat"](spark, sf_dir).collect()}
    for t, x in series.items():
        n = len(x)
        e = x - x.mean()
        st = np.cumsum(e)
        eta = float((st ** 2).sum()) / (n * n)
        l = int(math.floor(4.0 * (n / 100.0) ** 0.25))
        s2 = float((e ** 2).sum()) / n
        for j in range(1, l + 1):
            gj = float((e[j:] * e[:-j]).sum()) / n
            s2 += 2.0 * (1.0 - j / (l + 1.0)) * gj
        r = rows[t]
        assert (r["n"], r["l"]) == (n, l)
        assert abs(r["eta"] - eta) < 1e-4
        assert abs(r["s2"] - s2) < 1e-4
        assert abs(r["kpss"] - eta / s2) < 1e-4


def test_spectral_entropy_vs_numpy(spark, sf_dir, duck):
    series = _daily(duck)
    rows = {r["event_type"]: r for r in
            QUERIES["ts_spectral_entropy"](spark, sf_dir).collect()}
    assert len(rows) == len(series)
    for t, x in series.items():
        n = len(x)
        e = x - x.mean()
        tt = np.arange(1, n + 1)
        p = np.array([
            (e * np.round(np.cos(2 * math.pi * k * tt / n), 9)).sum()
            ** 2
            + (e * np.round(np.sin(2 * math.pi * k * tt / n), 9)).sum()
            ** 2
            for k in range(1, 9)])
        r = rows[t]
        if p.sum() <= 1e-12:
            assert r["spec_entropy"] is None
            continue
        pk = p / p.sum()
        h = float(-(pk[pk > 0] * np.log(pk[pk > 0])).sum())
        assert abs(r["spec_entropy"] - h) < 1e-4
        assert abs(r["spec_entropy_norm"] - h / math.log(8)) < 1e-4
        assert r["peak_k"] == int(np.argmax(p)) + 1
