"""Known-answer tests for the round-11 batch-R operators
(q_round11r): Engle-Granger, DerSimonian-Laird, Cronbach's alpha,
permutation importance — replayed with independent numpy/pandas
reimplementations."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def _daily(duck):
    df = duck.execute("""
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS x
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    return df


def test_engle_granger_vs_numpy(spark, sf_dir, duck):
    df = _daily(duck)
    a = df[df["event_type"] == "click"].set_index("d")["x"]
    b = df[df["event_type"] == "view"].set_index("d")["x"]
    common = a.index.intersection(b.index).sort_values()
    y = a[common].to_numpy()
    x = b[common].to_numpy()
    bb, aa = np.polyfit(x, y, 1)
    e = y - (aa + bb * x)
    e1 = e[:-1]
    de = e[1:] - e[:-1]
    rho = (e1 * de).sum() / (e1 * e1).sum()
    m = len(e1)
    s2 = ((de - rho * e1) ** 2).sum() / (m - 1)
    t = rho / math.sqrt(s2 / (e1 * e1).sum())
    row = QUERIES["ts_cointegration_engle"](spark, sf_dir).collect()[0]
    assert row["n"] == len(y)
    assert abs(row["alpha"] - aa) < 1e-4
    assert abs(row["beta"] - bb) < 1e-5
    assert abs(row["rho"] - rho) < 1e-5
    assert abs(row["adf_t"] - t) < 1e-4


def test_dersimonian_laird_vs_numpy(spark, sf_dir, duck):
    df = _daily(duck)
    thetas, vs = [], []
    for _, g in df.groupby("event_type"):
        late = g[g["d"].dt.day >= 16]["x"].to_numpy()
        early = g[g["d"].dt.day < 16]["x"].to_numpy()
        thetas.append(late.mean() - early.mean())
        vs.append(late.var(ddof=1) / len(late)
                  + early.var(ddof=1) / len(early))
    th = np.array(thetas)
    v = np.array(vs)
    w = 1 / v
    tf = (w * th).sum() / w.sum()
    q = (w * (th - tf) ** 2).sum()
    k = len(th)
    tau2 = max(0.0, (q - (k - 1)) / (w.sum() - (w ** 2).sum()
                                     / w.sum()))
    wr = 1 / (v + tau2)
    tr = (wr * th).sum() / wr.sum()
    row = QUERIES["stat_meta_dersimonian_laird"](
        spark, sf_dir).collect()[0]
    assert row["k"] == k
    assert abs(row["theta_fixed"] - tf) < 1e-5
    assert abs(row["se_fixed"] - 1 / math.sqrt(w.sum())) < 1e-5
    assert abs(row["q_stat"] - q) < 1e-3
    assert abs(row["tau2"] - tau2) < 1e-5
    assert abs(row["theta_random"] - tr) < 1e-5
    assert abs(row["se_random"] - 1 / math.sqrt(wr.sum())) < 1e-5


def test_cronbach_vs_numpy(spark, sf_dir, duck):
    um = duck.execute("""
        SELECT user_id, event_type, AVG(value) AS mv
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2""").df()
    k = um["event_type"].nunique()
    types = sorted(um["event_type"].unique())
    mats = []
    for _, g in um.groupby("user_id"):
        if len(g) == k:
            mats.append(g.set_index("event_type")["mv"]
                         .reindex(types).to_numpy())
    X = np.array(mats)
    svi = X.var(axis=0, ddof=1).sum()
    vt = X.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - svi / vt)
    row = QUERIES["stat_cronbach_alpha"](spark, sf_dir).collect()[0]
    assert (row["b"], row["k"]) == (len(X), k)
    assert abs(row["sum_item_var"] - svi) < 1e-4
    assert abs(row["total_var"] - vt) < 1e-4
    assert abs(row["cronbach_alpha"] - alpha) < 1e-4


def test_permutation_importance_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT c.c_custkey AS id, c.c_acctbal AS x,
               COALESCE(o.tot, 0.0) AS y
        FROM customer c
        LEFT JOIN (SELECT o_custkey, SUM(o_totalprice) AS tot
                   FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey ORDER BY id""").df()
    ids = df["id"].to_numpy()
    x = df["x"].to_numpy()
    y = df["y"].to_numpy()
    b, a = np.polyfit(x, y, 1)
    sst = ((y - y.mean()) ** 2).sum()
    r2_base = 1 - ((y - a - b * x) ** 2).sum() / sst
    A = int(0.6180339887498949 * (1 << 26)) | 1
    M = 1 << 26
    xp = np.empty_like(x)
    for bk in range(64):
        mask = ids % 64 == bk
        sub_ids = ids[mask]
        sub_x = x[mask]
        order_key = np.lexsort((sub_ids, (sub_ids % M) * A % M))
        # ordered side: by id (already sorted); shuffled side: by hash
        xp[mask] = sub_x[order_key]
    r2_perm = 1 - ((y - a - b * xp) ** 2).sum() / sst
    row = QUERIES["ml_permutation_importance"](
        spark, sf_dir).collect()[0]
    assert row["n"] == len(y)
    assert abs(row["r2_base"] - r2_base) < 1e-5
    assert abs(row["r2_perm"] - r2_perm) < 1e-5
    assert abs(row["importance"] - (r2_base - r2_perm)) < 1e-5
