"""Known-answer tests for the round-11 batch-Q operators
(q_round11q): skyline, source-overlap matrix, hash-uniformity KS,
CUSUM changepoint — replayed with independent python/numpy
reimplementations (the skyline via the LITERAL pairwise dominance
check, proving the window reformulation)."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def test_skyline_vs_pairwise_dominance(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT p_brand, p_partkey, p_retailprice AS price,
               p_size AS psize FROM part""").df()
    got = {(r["p_brand"], r["p_partkey"])
           for r in QUERIES["sort_skyline_pareto"](spark, sf_dir)
           .collect()}
    expect = set()
    for brand, g in df.groupby("p_brand"):
        rows = list(g[["p_partkey", "price", "psize"]]
                    .itertuples(index=False))
        for k, pr, sz in rows:
            dominated = any(
                (pr2 < pr or (pr2 == pr and k2 < k)) and sz2 >= sz
                for k2, pr2, sz2 in rows if k2 != k)
            if not dominated:
                expect.add((brand, k))
    assert got == expect


def test_overlap_matrix_vs_python(spark, sf_dir, duck):
    df = duck.execute(
        "SELECT source, text FROM documents").df()
    grams = defaultdict(set)
    for _, row in df.iterrows():
        toks = [t for t in re.split(r"[ \t\r\n]+", row["text"]) if t]
        for i in range(len(toks) - 4):
            grams[row["source"]].add(" ".join(toks[i:i + 5]))
    rows = {(r["src_a"], r["src_b"]): r for r in
            QUERIES["data_source_overlap_matrix"](spark, sf_dir)
            .collect()}
    srcs = sorted(grams)
    n_pairs_with_overlap = 0
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            inter = len(grams[a] & grams[b])
            if inter == 0:
                assert (a, b) not in rows
                continue
            n_pairs_with_overlap += 1
            r = rows[(a, b)]
            assert (r["grams_a"], r["grams_b"]) == (
                len(grams[a]), len(grams[b]))
            assert r["n_common"] == inter
            assert abs(r["containment"]
                       - inter / min(len(grams[a]),
                                     len(grams[b]))) < 1e-6
            assert abs(r["jaccard"]
                       - inter / len(grams[a] | grams[b])) < 1e-6
    assert n_pairs_with_overlap == len(rows)


def test_hash_uniformity_vs_numpy(spark, sf_dir, duck):
    ids = duck.execute(
        "SELECT event_id FROM events").df()["event_id"].to_numpy()
    A = int(0.6180339887498949 * (1 << 26)) | 1
    M = 1 << 26
    u = np.sort(((ids % M) * A % M) / M)
    n = len(u)
    i = np.arange(1, n + 1)
    # two-sided step bounds on the sorted sample, equivalent to the
    # distinct-cells formulation when ties collapse
    dplus = np.abs(i / n - u)
    dminus = np.abs(u - (i - 1) / n)
    # collapse ties: engine computes at distinct values with the
    # cumulative count — recompute that way
    vals, counts = np.unique(u, return_counts=True)
    cum = np.cumsum(counts)
    d = np.maximum(np.abs(cum / n - vals),
                   np.abs(vals - (cum - 1) / n)).max()
    row = QUERIES["audit_hash_uniformity_ks"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["ks_d"] - d) < 1e-6
    assert abs(row["ks_stat"] - math.sqrt(n) * d) < 1e-4
    del dplus, dminus


def test_cusum_vs_numpy(spark, sf_dir, duck):
    daily = duck.execute("""
        SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS x
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    rows = {r["event_type"]: r for r in
            QUERIES["stat_changepoint_cusum_mean"](spark, sf_dir)
            .collect()}
    for t, g in daily.groupby("event_type"):
        x = g.sort_values("d")["x"].to_numpy()
        n = len(x)
        e = x - x.mean()
        st = np.cumsum(e)[:-1]
        sd = math.sqrt((x ** 2).mean() - x.mean() ** 2)
        q = np.abs(st) / (sd * math.sqrt(n))
        t_hat = int(np.argmax(q)) + 1
        r = rows[t]
        assert r["n"] == n
        assert r["t_hat"] == t_hat
        assert abs(r["cusum_stat"] - q[t_hat - 1]) < 1e-5
