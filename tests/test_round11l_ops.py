"""Known-answer tests for the round-11 batch-L operators
(q_round11l): HITS, Quade, Krippendorff's alpha, Huber location —
each replayed with an independent python/numpy reimplementation
(HITS replays the exact integer fixed-point algorithm; Huber replays
the clipped-mean iteration in numpy)."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def test_hits_vs_python_fixed_point(spark, sf_dir, duck):
    edges = duck.execute("""
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """).df()
    custs = duck.execute(
        "SELECT c_custkey FROM customer").df()["c_custkey"].tolist()
    supps = duck.execute(
        "SELECT s_suppkey FROM supplier").df()["s_suppkey"].tolist()
    pairs = list(zip(edges["c"].tolist(), edges["s"].tolist()))
    h = {c: 1_000_000 for c in {c for c, _ in pairs}}
    a = {}
    for _ in range(2):
        raw_a = {}
        for c, s in pairs:
            if c in h:
                raw_a[s] = raw_a.get(s, 0) + h[c]
        tot = sum(raw_a.values())
        a = {s: v * 1_000_000 // tot for s, v in raw_a.items()}
        raw_h = {}
        for c, s in pairs:
            if s in a:
                raw_h[c] = raw_h.get(c, 0) + a[s]
        tot = sum(raw_h.values())
        h = {c: v * 1_000_000 // tot for c, v in raw_h.items()}
    got = {(r["node_id"], r["kind"]): r["score_u"]
           for r in QUERIES["graph_hits"](spark, sf_dir).collect()}
    assert len(got) == len(custs) + len(supps)
    for c in custs:
        assert got[(c * 2, "hub")] == h.get(c, 0)
    for s in supps:
        assert got[(s * 2 + 1, "auth")] == a.get(s, 0)


def _blocks(duck):
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
    return np.array(mats), k


def _rankdata(v):
    order = np.argsort(v, kind="stable")
    r = np.empty(len(v))
    i = 0
    sv = v[order]
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        r[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return r


def test_quade_vs_python(spark, sf_dir, duck):
    mats, k = _blocks(duck)
    b = len(mats)
    rij = np.array([_rankdata(row) for row in mats])
    rng = mats.max(axis=1) - mats.min(axis=1)
    q = _rankdata(rng)
    s = q[:, None] * (rij - (k + 1) / 2.0)
    a2 = float((s ** 2).sum())
    b2 = float((s.sum(axis=0) ** 2).sum()) / b
    f = (b - 1) * b2 / (a2 - b2)
    row = QUERIES["stat_quade_test"](spark, sf_dir).collect()[0]
    assert (row["b"], row["k"]) == (b, k)
    assert abs(row["a_stat"] - a2) < 1e-3
    assert abs(row["b_stat"] - b2) < 1e-3
    assert abs(row["f_stat"] - f) < 1e-4


def test_krippendorff_vs_python(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT l_orderkey AS item, l_returnflag AS cat
        FROM (SELECT l_orderkey, l_returnflag,
                     ROW_NUMBER() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_suppkey,
                                l_extendedprice, l_returnflag) AS rn
              FROM lineitem) WHERE rn <= 4""").df()
    counts = df.groupby("item").size()
    items = counts[counts == 4].index
    sub = df[df["item"].isin(items)]
    nij = sub.groupby(["item", "cat"]).size()
    m, n_items = 4, len(items)
    do = float((nij * (m - nij)).sum()) / (n_items * m * (m - 1))
    nc = nij.groupby("cat").sum()
    n = int(nc.sum())
    de = float((nc * (n - nc)).sum()) / (n * (n - 1))
    row = QUERIES["ml_krippendorff_alpha"](spark, sf_dir).collect()[0]
    assert (row["n_items"], row["n_raters"]) == (n_items, m)
    assert abs(row["d_o"] - do) < 1e-5
    assert abs(row["d_e"] - de) < 1e-5
    assert abs(row["alpha"] - (1 - do / de)) < 1e-4


def test_huber_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)""").df()
    rows = {r["event_type"]: r for r in
            QUERIES["agg_huber_m_location"](spark, sf_dir).collect()}
    for t, g in df.groupby("event_type"):
        x = g["value"].to_numpy()
        srt = np.sort(x)
        med = srt[math.ceil(len(x) / 2.0) - 1]
        av = np.sort(np.abs(x - med))
        mad = av[math.ceil(len(x) / 2.0) - 1]
        s = 1.4826 * mad
        mu = med
        for _ in range(3):
            mu = np.clip(x, mu - 1.345 * s, mu + 1.345 * s).mean()
        r = rows[t]
        assert abs(r["median_start"] - med) < 1e-6
        assert abs(r["scale_mad"] - s) < 1e-6
        assert abs(r["huber_mu"] - mu) < 1e-4
