"""Known-answer tests for the round-11 batch-S operators
(q_round11s): modularity, conductance, MACD, Rényi collision entropy
— replayed with independent python/numpy reimplementations (MACD via
a literal per-row kernel dot product; modularity/conductance from an
adjacency dict)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def _graph(duck):
    edges = duck.execute("""
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey""").df()
    brand = dict(duck.execute(
        "SELECT p_partkey, p_brand FROM part").fetchall())
    pairs = list(zip(edges["a"].tolist(), edges["b"].tolist()))
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    return pairs, brand, deg


def test_modularity_and_conductance_vs_python(spark, sf_dir, duck):
    pairs, brand, deg = _graph(duck)
    m = len(pairs)
    vol = defaultdict(int)
    nn = defaultdict(set)
    ec = defaultdict(int)
    for n, d in deg.items():
        vol[brand[n]] += d
        nn[brand[n]].add(n)
    for a, b in pairs:
        if brand[a] == brand[b]:
            ec[brand[a]] += 1
    q = sum(ec.get(c, 0) / m - (vol[c] / (2 * m)) ** 2 for c in vol)
    row = QUERIES["graph_modularity_score"](spark, sf_dir).collect()[0]
    assert (row["m"], row["k"]) == (m, len(vol))
    assert abs(row["modularity"] - q) < 1e-5
    rows = {r["brand"]: r for r in
            QUERIES["graph_community_conductance"](spark, sf_dir)
            .collect()}
    assert set(rows) == set(vol)
    for c in vol:
        cut = vol[c] - 2 * ec.get(c, 0)
        den = min(vol[c], 2 * m - vol[c])
        r = rows[c]
        assert (r["n_nodes"], r["vol"], r["cut"]) == (
            len(nn[c]), vol[c], cut)
        if den > 0:
            assert abs(r["conductance"] - cut / den) < 1e-6
        else:
            assert r["conductance"] is None


def test_macd_vs_numpy(spark, sf_dir, duck):
    hourly = duck.execute("""
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
               AVG(value) AS x
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    def w(n, lags):
        a = 2.0 / (n + 1)
        return np.array([a * (1 - a) ** j for j in range(lags)])
    w12, w26, w9 = w(12, 64), w(26, 64), w(9, 24)
    rows = {(r["event_type"], r["h"]): r for r in
            QUERIES["win_macd"](spark, sf_dir).collect()}
    n_checked = 0
    for t, g in hourly.groupby("event_type"):
        x = g.sort_values("h")["x"].to_numpy()
        hs = g.sort_values("h")["h"].to_numpy()
        macd = np.full(len(x), np.nan)
        for i in range(len(x)):
            lo = max(0, i - 63)
            seg = x[lo:i + 1][::-1]
            macd[i] = (seg * w12[:len(seg)]).sum() \
                - (seg * w26[:len(seg)]).sum()
        for i in range(88, len(x)):
            seg = macd[max(0, i - 23):i + 1][::-1]
            sig = (seg * w9[:len(seg)]).sum()
            r = rows.get((t, int(hs[i])))
            assert r is not None
            assert abs(r["macd"] - macd[i]) < 1e-4
            assert abs(r["signal"] - sig) < 1e-4
            assert abs(r["histogram"] - (macd[i] - sig)) < 1e-4
            n_checked += 1
    assert n_checked > 0


def test_renyi_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2""").df()
    rows = {r["event_type"]: r for r in
            QUERIES["agg_renyi_collision_entropy"](spark, sf_dir)
            .collect()}
    for t, g in df.groupby("event_type"):
        n = g["n"].to_numpy().astype(float)
        p = n / n.sum()
        h2 = -math.log((p ** 2).sum())
        r = rows[t]
        assert r["n_users"] == len(n)
        assert abs(r["renyi2"] - h2) < 1e-5
        assert abs(r["max_ent"] - math.log(len(n))) < 1e-6
        assert abs(r["renyi2_norm"] - h2 / math.log(len(n))) < 1e-5
