"""Known-answer / property tests for the round-11 operator batches
(q_round11b graph family, q_round11c rank stats + eval + audit) — the
DuckDB oracle gate covers the cross-engine hash contract; these pin
the MATH against independent numpy reimplementations and pin the
structural invariants the oracle can't see (convergence margins,
component laws, core properties).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


# ---------------------------------------------------------------------------
# Graph family: structural laws
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def graph_frames(spark, sf_dir):
    from data_ingestor_and_features_creator_spark.plans.q_round11b import (
        _copurchase_edges)
    e = _copurchase_edges(spark, sf_dir).cache()
    edges = [(r["a"], r["b"]) for r in e.collect()]
    return e, edges


def _py_components(edges):
    """Union-find reference."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_vs_union_find(spark, sf_dir, graph_frames):
    """Every emitted (node, component) label equals the min-reachable
    node id computed by an independent union-find."""
    _, edges = graph_frames
    ref = _py_components(edges)
    # union-find parent compression leaves root = min id only if we
    # normalize: recompute min per component
    comp_members: dict = {}
    for n, r in ref.items():
        comp_members.setdefault(r, []).append(n)
    canon = {}
    for members in comp_members.values():
        m = min(members)
        for n in members:
            canon[n] = m
    got = {r["node"]: r["component"]
           for r in QUERIES["graph_connected_components"](
               spark, sf_dir).collect()}
    assert got == canon


def test_kcore_properties(spark, sf_dir, graph_frames):
    """The emitted 3-core (a) has every member's in-core degree >= 3,
    (b) is a fixpoint (recomputing degrees over the member set peels
    nobody), and (c) matches an independent python peel to exhaustion
    — i.e. the bounded-round budget converged on this fixture."""
    _, edges = graph_frames
    rows = QUERIES["graph_kcore"](spark, sf_dir).collect()
    got = {r["node"]: r["core_deg"] for r in rows}
    assert all(d >= 3 for d in got.values())
    # python peel to exhaustion (no round budget)
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < 3}
        if not drop:
            break
        alive -= drop
    ref = {n: len(adj[n] & alive) for n in alive}
    assert got == ref


def test_label_propagation_three_rounds_reference(spark, sf_dir,
                                                  graph_frames):
    """Sync LPA with min-tie-break replayed in python for exactly 3
    rounds must reproduce the registered labels."""
    _, edges = graph_frames
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n in adj:
            counts: dict = {}
            for v in adj[n]:
                counts[lab[v]] = counts.get(lab[v], 0) + 1
            best = min(counts, key=lambda c: (-counts[c], c))
            new[n] = best
        lab = new
    got = {r["node"]: r["label"]
           for r in QUERIES["graph_label_propagation"](
               spark, sf_dir).collect()}
    assert got == lab


def test_local_clustering_bounds_and_reference(spark, sf_dir,
                                               graph_frames):
    """lcc in [0, 1]; spot-verify tri/deg/lcc for every emitted node
    against the adjacency sets."""
    _, edges = graph_frames
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in QUERIES["graph_local_clustering"](spark, sf_dir).collect():
        n, deg, tri, lcc = r["node"], r["deg"], r["tri"], r["lcc"]
        assert deg == len(adj[n])
        nbrs = sorted(adj[n])
        t = sum(1 for i in range(len(nbrs)) for j in range(i + 1, len(nbrs))
                if nbrs[j] in adj[nbrs[i]])
        assert tri == t
        assert abs(lcc - 2.0 * t / (deg * (deg - 1))) < 1e-12
        assert 0.0 <= lcc <= 1.0


def test_adamic_adar_reference(spark, sf_dir, graph_frames):
    """Recompute the AA score for every emitted pair from adjacency
    sets; emitted pairs must be non-adjacent with >=1 common
    neighbor."""
    import math
    _, edges = graph_frames
    eset = set(edges)
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in QUERIES["graph_adamic_adar"](spark, sf_dir).collect():
        x, y = r["node_a"], r["node_b"]
        assert (x, y) not in eset and (y, x) not in eset
        common = adj[x] & adj[y]
        assert len(common) == r["common"] and common
        aa = sum(1.0 / math.log(len(adj[w])) for w in common)
        assert abs(r["aa"] - aa) < 1e-5


# ---------------------------------------------------------------------------
# Rank statistics: numpy references
# ---------------------------------------------------------------------------

def _midranks(a: np.ndarray) -> np.ndarray:
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a))
    sa = a[order]
    i, pos = 0, 1
    while i < len(a):
        j = i
        while j + 1 < len(a) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i:j + 1]] = (2 * pos + (j - i)) / 2.0
        pos += j - i + 1
        i = j + 1
    return ranks


@pytest.fixture(scope="module")
def two_samples(duck):
    df = duck.execute(
        "SELECT event_type, value FROM events "
        "WHERE value IS NOT NULL AND NOT isnan(value)").df()
    x = df.loc[df.event_type == "click", "value"].to_numpy()
    y = df.loc[df.event_type != "click", "value"].to_numpy()
    return x, y


def test_brunner_munzel_vs_numpy(spark, sf_dir, two_samples):
    x, y = two_samples
    nx, ny = len(x), len(y)
    rc = _midranks(np.concatenate([x, y]))
    rcx, rcy = rc[:nx], rc[nx:]
    rx, ry = _midranks(x), _midranks(y)
    mx, my = rcx.mean(), rcy.mean()
    sx = ((rcx - rx - mx + (nx + 1) / 2) ** 2).sum() / (nx - 1)
    sy = ((rcy - ry - my + (ny + 1) / 2) ** 2).sum() / (ny - 1)
    w = nx * ny * (my - mx) / ((nx + ny) * np.sqrt(nx * sx + ny * sy))
    df_ = ((nx * sx + ny * sy) ** 2
           / ((nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1)))
    p = (my - mx) / (nx + ny) + 0.5
    row = QUERIES["stat_brunner_munzel"](spark, sf_dir).collect()[0]
    assert (row["nx"], row["ny"]) == (nx, ny)
    assert abs(row["p_hat"] - p) < 1e-5
    assert abs(row["w"] - w) < 1e-5
    assert abs(row["df"] - df_) < 1e-3


def test_anderson_darling_2samp_vs_numpy(spark, sf_dir, two_samples):
    x, y = two_samples
    comb = np.concatenate([x, y])
    zstar = np.sort(np.unique(comb))
    n = len(comb)
    lj = np.array([(comb == z).sum() for z in zstar], float)
    bj = lj.cumsum() - lj / 2
    a2 = 0.0
    for s in (x, y):
        fij = np.array([(s == z).sum() for z in zstar], float)
        mij = fij.cumsum() - fij / 2
        inner = (lj / n * (n * mij - len(s) * bj) ** 2
                 / (bj * (n - bj) - n * lj / 4))
        a2 += inner.sum() / len(s)
    a2 *= (n - 1) / n
    row = QUERIES["stat_anderson_darling_2samp"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n0"], row["l"]) == (len(x), len(y), len(zstar))
    assert abs(row["a2akn"] - a2) < 1e-5


# ---------------------------------------------------------------------------
# Eval + audit invariants
# ---------------------------------------------------------------------------

def test_topk_accuracy_monotone_and_bounded(spark, sf_dir):
    row = QUERIES["ml_topk_accuracy"](spark, sf_dir).collect()[0]
    assert row["n_users"] > 0
    assert 0.0 <= row["acc_at_1"] <= row["acc_at_3"] <= 1.0


def test_bleu_corpus_vs_python(spark, sf_dir, duck):
    """Corpus BLEU-2 recomputed in pure python from the same shift
    pairs (clipped counts via collections.Counter) must match."""
    import math
    from collections import Counter
    docs = duck.execute("SELECT doc_id, text FROM documents").df()
    c_len = r_len = clip1 = nc1 = clip2 = nc2 = 0
    for t in docs["text"]:
        toks = [x for x in (t or "").split(" ") if x != ""]
        cand, ref = toks[1:41], toks[0:40]
        c_len += len(cand)
        r_len += len(ref)
        cc, rc = Counter(cand), Counter(ref)
        clip1 += sum(min(n, rc[g]) for g, n in cc.items())
        nc1 += sum(cc.values())
        cb = Counter(zip(cand, cand[1:]))
        rb = Counter(zip(ref, ref[1:]))
        clip2 += sum(min(n, rb[g]) for g, n in cb.items())
        nc2 += sum(cb.values())
    p1, p2 = clip1 / nc1, clip2 / nc2
    bp = 1.0 if c_len >= r_len else math.exp(1.0 - r_len / c_len)
    bleu = bp * math.exp(0.5 * (math.log(p1) + math.log(p2)))
    row = QUERIES["text_bleu_corpus"](spark, sf_dir).collect()[0]
    assert (row["c_len"], row["r_len"]) == (c_len, r_len)
    assert abs(row["p1"] - p1) < 1e-5 and abs(row["p2"] - p2) < 1e-5
    assert abs(row["bp"] - bp) < 1e-5 and abs(row["bleu2"] - bleu) < 1e-5


def test_matrix_profile_vs_numpy(spark, sf_dir, duck):
    """Matrix profile (m=7, exclusion 4) recomputed in numpy from the
    same daily series; the registered top-10 discords must equal the
    reference top-10 under the same rounded-score ordering."""
    daily = duck.execute("""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               AVG(value) AS v
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    m, excl = 7, 4
    prof = {}
    for et, g in daily.groupby("event_type"):
        v = g.sort_values("d")["v"].to_numpy()
        n = len(v)
        ns = n - m + 1
        if ns < excl + 1:
            continue
        wins = np.lib.stride_tricks.sliding_window_view(v, m)
        mus = wins.mean(axis=1)
        sds = np.sqrt(np.maximum((wins ** 2).mean(axis=1) - mus ** 2, 0))
        for s in range(ns):
            if sds[s] <= 0:
                continue
            best = None
            for t in range(ns):
                if abs(t - s) < excl or sds[t] <= 0:
                    continue
                rho = ((wins[s] * wins[t]).mean() - mus[s] * mus[t]) \
                    / (sds[s] * sds[t])
                d = np.sqrt(max(2.0 * m * (1.0 - rho), 0.0))
                best = d if best is None else min(best, d)
            if best is not None:
                prof[(et, s + 1)] = round(best, 6)
    ref_top = sorted(prof.items(),
                     key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:10]
    got = [((r["event_type"], r["win_start"]), r["profile"])
           for r in QUERIES["ts_matrix_profile_discord"](
               spark, sf_dir).collect()]
    for (gk, gv), (rk, rv) in zip(got, ref_top):
        assert gk == rk and abs(gv - rv) < 1e-5, (gk, gv, rk, rv)


def test_shapley_attribution_efficiency_and_bruteforce(spark, sf_dir,
                                                       duck):
    """Exact Shapley must satisfy EFFICIENCY (Σφ = v(full) − v(∅))
    and match a brute-force python enumeration of the 16-coalition
    game."""
    import math
    from itertools import combinations
    j = duck.execute("""
        SELECT CAST(MAX(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                 + 2*MAX(CASE WHEN event_type='error' THEN 1 ELSE 0 END)
                 + 4*MAX(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)
                 + 8*MAX(CASE WHEN event_type='view' THEN 1 ELSE 0 END)
               AS INTEGER) AS mask,
               MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                 AS conv
        FROM events GROUP BY user_id,
             CAST(date_trunc('day', ts) AS DATE)""").df()
    stats = j.groupby("mask")["conv"].agg(["count", "sum"])
    v = {m: (stats.loc[m, "sum"] / stats.loc[m, "count"]
             if m in stats.index else 0.0) for m in range(16)}
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    n = 4
    phi = {}
    for name, b in bits.items():
        tot = 0.0
        others = [x for x in bits.values() if x != b]
        for size in range(n):
            for combo in combinations(others, size):
                s = sum(combo)
                w = (math.factorial(size) * math.factorial(n - size - 1)
                     / math.factorial(n))
                tot += w * (v[s | b] - v[s])
        phi[name] = tot
    got = {r["channel"]: r["phi"]
           for r in QUERIES["funnel_shapley_attribution"](
               spark, sf_dir).collect()}
    for k in bits:
        assert abs(got[k] - phi[k]) < 1e-5, (k, got[k], phi[k])
    assert abs(sum(got.values()) - (v[15] - v[0])) < 1e-4


def test_isotonic_calibration_vs_pava(spark, sf_dir):
    """The minimax fit must be monotone nondecreasing and equal the
    classical pool-adjacent-violators algorithm on the same bins."""
    rows = sorted(QUERIES["ml_isotonic_calibration"](
        spark, sf_dir).collect(), key=lambda r: r["bin"])
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    # PAVA on (rate, weight)
    blocks = [[r["raw_rate"] * r["n"], r["n"]] for r in rows]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and (out[-2][0] / out[-2][1]
                                > out[-1][0] / out[-1][1]):
            s, w = out.pop()
            out[-1][0] += s
            out[-1][1] += w
    fit = []
    for s, w in out:
        fit.extend([s / w] * 1)
    # expand blocks back to bins
    expanded = []
    bi = 0
    for s, w in out:
        cnt = 0
        while cnt < w:
            cnt += rows[bi]["n"]
            expanded.append(s / w)
            bi += 1
    assert len(expanded) == len(rows)
    for a, b in zip(iso, expanded):
        assert abs(a - b) < 2e-5, (iso, expanded)


def test_wasserstein_cvm_vs_numpy(spark, sf_dir, two_samples):
    x, y = two_samples
    n1, n0 = len(x), len(y)
    vals = np.sort(np.unique(np.concatenate([x, y])))
    f1 = np.searchsorted(np.sort(x), vals, side="right") / n1
    f0 = np.searchsorted(np.sort(y), vals, side="right") / n0
    w1 = float(np.sum(np.abs(f1 - f0)[:-1] * np.diff(vals)))
    row = QUERIES["stat_wasserstein_1d"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n0"]) == (n1, n0)
    assert abs(row["w1"] - w1) < 1e-4
    comb = np.concatenate([x, y])
    l = np.array([(comb == v).sum() for v in vals], float)
    nn = n1 + n0
    o2 = float(np.sum(l / nn * (f1 - f0) ** 2))
    t = n1 * n0 / nn * o2
    row = QUERIES["stat_cramer_von_mises_2samp"](spark, sf_dir).collect()[0]
    assert abs(row["omega2"] - o2) < 1e-5
    assert abs(row["t_stat"] - t) < 1e-4


def test_conformal_coverage_near_guarantee(spark, sf_dir):
    """Split conformal at alpha=0.1 guarantees E[coverage] >= 0.9;
    per-type finite-sample coverage must sit above 0.9 minus a
    binomial-noise allowance."""
    rows = QUERIES["ml_conformal_split_interval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 3-sigma binomial allowance at the observed n_test
        slack = 3.0 * (0.09 / max(r["n_test"], 1)) ** 0.5
        assert r["coverage"] >= 0.9 - slack, dict(r.asDict())
        assert r["q_alpha"] is not None and r["q_alpha"] >= 0


def test_lof_vs_numpy(spark, sf_dir, duck):
    """LOF k=5 recomputed in numpy (same z-scored daily grid, same
    deterministic kNN tie-break, same +1e-10 regularizer); the
    registered top-15 must match keys and values."""
    daily = duck.execute("""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               AVG(value) AS mv, COUNT(*) AS cnt
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2""").df()
    m1, s1 = daily["mv"].mean(), daily["mv"].std(ddof=1)
    m2, s2 = daily["cnt"].mean(), daily["cnt"].std(ddof=1)
    k = 5
    lofs = {}
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("d").reset_index(drop=True)
        z = np.stack([(g["mv"] - m1) / s1, (g["cnt"] - m2) / s2], axis=1)
        days = list(g["d"])
        n = len(g)
        dd = np.sqrt(((z[:, None, :] - z[None, :, :]) ** 2).sum(-1))
        knn = {}
        for i in range(n):
            order = sorted((dd[i, j], days[j], j)
                           for j in range(n) if j != i)[:k]
            knn[i] = [j for _, _, j in order]
        kdist = {i: max(dd[i, j] for j in knn[i]) for i in range(n)}
        lrd = {i: k / (sum(max(kdist[j], dd[i, j]) for j in knn[i])
                       + 1e-10) for i in range(n)}
        for i in range(n):
            lofs[(et, days[i])] = round(
                sum(lrd[j] for j in knn[i]) / (k * lrd[i]), 6)
    lofs = {(et, d.date() if hasattr(d, "date") else d): v
            for (et, d), v in lofs.items()}
    top = sorted(lofs.items(), key=lambda kv: (-kv[1], kv[0][0],
                                               str(kv[0][1])))[:15]
    got = [((r["event_type"], r["day"]), r["lof"])
           for r in QUERIES["ml_lof_daily"](spark, sf_dir).collect()]
    for (gk, gv), (rk, rv) in zip(got, top):
        assert gk == rk and abs(gv - rv) < 1e-5, (gk, gv, rk, rv)


def test_mood_median_vs_python(spark, sf_dir, two_samples, duck):
    """Mood chi-square recomputed in python from the same grand
    median (lower-median order statistic)."""
    ev = duck.execute("""SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)""").df()
    vals = np.sort(ev["value"].to_numpy())
    n = len(vals)
    md = vals[(n + 1) // 2 - 1] if n % 2 else vals[n // 2 - 1]
    # first value whose doubled cumulative count reaches n:
    # == index ceil(n/2) - 1 in the sorted array
    md = vals[int(np.ceil(n / 2)) - 1]
    chi2 = 0.0
    ta = (ev["value"] > md).sum()
    tb = n - ta
    for _, g in ev.groupby("event_type"):
        a = (g["value"] > md).sum()
        b = len(g) - a
        ea, eb = len(g) * ta / n, len(g) * tb / n
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    row = QUERIES["stat_mood_median_test"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["chi2"] - chi2) < 1e-4


def test_ansari_bradley_vs_python(spark, sf_dir, two_samples):
    """AB statistic with midrank tie handling recomputed in python:
    each observation scores the average of min(r, N+1-r) over its
    tied positions."""
    x, y = two_samples
    comb = np.concatenate([x, y])
    order = np.argsort(comb, kind="mergesort")
    n = len(comb)
    score = np.empty(n)
    sc = comb[order]
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sc[j + 1] == sc[i]:
            j += 1
        s = sum(min(r, n + 1 - r) for r in range(i + 1, j + 2))
        score[order[i:j + 1]] = s / (j - i + 1)
        i = j + 1
    ab = float(score[:len(x)].sum())
    row = QUERIES["stat_ansari_bradley"](spark, sf_dir).collect()[0]
    assert abs(row["ab_stat"] - ab) < 1e-4
    assert abs(row["ab_mean_score"] - ab / len(x)) < 1e-5


def test_assortativity_vs_numpy(spark, sf_dir, graph_frames):
    """Newman r recomputed from the edge list and degree map."""
    _, edges = graph_frames
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    j = np.array([deg[a] for a, b in edges], float)
    k = np.array([deg[b] for a, b in edges], float)
    m = len(edges)
    mh = 0.5 * (j + k).sum() / m
    num = (j * k).sum() / m - mh ** 2
    den = 0.5 * (j ** 2 + k ** 2).sum() / m - mh ** 2
    row = QUERIES["graph_assortativity"](spark, sf_dir).collect()[0]
    assert row["m"] == m
    assert abs(row["assortativity"] - num / den) < 1e-9


def test_delong_ci_vs_numpy(spark, sf_dir, duck):
    """DeLong AUC/SE recomputed in numpy from placements; the AUC
    must also equal ml_auc_roc's point estimate."""
    sc = duck.execute("""
        SELECT 0.02 + 0.96*(e.value - m.vmin)/(m.vmax - m.vmin) AS p,
               CASE WHEN e.event_type IN ('click','purchase')
                    THEN 1 ELSE 0 END AS y
        FROM events e, (SELECT MIN(value) AS vmin, MAX(value) AS vmax
                        FROM events WHERE value IS NOT NULL
                          AND NOT isnan(value)) m
        WHERE e.value IS NOT NULL AND NOT isnan(e.value)""").df()
    pos = np.sort(sc.loc[sc.y == 1, "p"].to_numpy())
    neg = np.sort(sc.loc[sc.y == 0, "p"].to_numpy())
    n1, n0 = len(pos), len(neg)
    v10 = ((np.searchsorted(neg, pos, "left")
            + np.searchsorted(neg, pos, "right")) / 2.0) / n0
    v01 = ((np.searchsorted(pos, neg, "left")
            + np.searchsorted(pos, neg, "right")) / 2.0) / n1
    auc = v10.mean()
    s10 = v10.var(ddof=1)
    s01 = v01.var(ddof=1)
    se = np.sqrt(s10 / n1 + s01 / n0)
    row = QUERIES["ml_auc_delong_ci"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n0"]) == (n1, n0)
    assert abs(row["auc"] - auc) < 1e-5
    assert abs(row["se"] - se) < 1e-5
    assert abs(row["lo95"] - (auc - 1.96 * se)) < 1e-4
    assert abs(row["hi95"] - (auc + 1.96 * se)) < 1e-4
    auc_roc = QUERIES["ml_auc_roc"](spark, sf_dir).collect()[0]
    got_auc = auc_roc[[c for c in auc_roc.asDict()
                       if "auc" in c.lower()][0]]
    assert abs(got_auc - row["auc"]) < 1e-5


def test_page_trend_vs_python(spark, sf_dir, duck):
    """Page L recomputed in python with midranks over complete
    blocks."""
    um = duck.execute("""
        SELECT user_id, event_type, AVG(value) AS mv
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2""").df()
    k = um["event_type"].nunique()
    types = sorted(um["event_type"].unique())
    jmap = {t: i + 1 for i, t in enumerate(types)}
    l_stat = 0.0
    b = 0
    for _, g in um.groupby("user_id"):
        if len(g) != k:
            continue
        b += 1
        mv = g.set_index("event_type")["mv"]
        vals = mv.to_numpy()
        for t in mv.index:
            r = (1 + (vals < mv[t]).sum()
                 + ((vals == mv[t]).sum() - 1) / 2.0)
            l_stat += jmap[t] * r
    mean_l = b * k * (k + 1) ** 2 / 4.0
    sd_l = (b * k * k * (k + 1) * (k * k - 1) / 144.0) ** 0.5
    row = QUERIES["stat_page_trend_test"](spark, sf_dir).collect()[0]
    assert (row["b"], row["k"]) == (b, k)
    assert abs(row["l_stat"] - l_stat) < 1e-4
    assert abs(row["z"] - (l_stat - mean_l) / sd_l) < 1e-4


def test_kcenter_coreset_vs_numpy(spark, sf_dir, duck):
    """Greedy farthest-point traversal replayed in numpy (same seed =
    min vec_id, same squared-Euclidean argmax, same tie-break)."""
    df = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").df()
    ids = df["vec_id"].to_numpy()
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    centers = [int(ids[0])]
    d2 = ((X - X[0]) ** 2).sum(axis=1)
    expect = [(1, centers[0], None)]
    for k in range(2, 6):
        best = np.lexsort((ids, -d2))[0]
        expect.append((k, int(ids[best]), round(float(d2[best]), 6)))
        nd = ((X - X[best]) ** 2).sum(axis=1)
        d2 = np.minimum(d2, nd)
    got = [(r["k"], r["center_id"],
            None if r["sel_d2"] is None else round(r["sel_d2"], 6))
           for r in sorted(QUERIES["data_coreset_kcenter"](
               spark, sf_dir).collect(), key=lambda r: r["k"])]
    for g, e in zip(got, expect):
        assert g[:2] == e[:2], (g, e)
        if e[2] is not None:
            assert abs(g[2] - e[2]) < 1e-4, (g, e)


def test_l_diversity_law(spark, sf_dir):
    """l_distinct <= n always; l3_ok is never NULL and equals the
    threshold predicate."""
    rows = QUERIES["audit_l_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["l_distinct"] <= r["n"]
        assert r["l3_ok"] is not None
        assert r["l3_ok"] == (r["l_distinct"] >= 3)
