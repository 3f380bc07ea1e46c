"""Known-answer tests for the round-11 batch-I operators
(q_round11i): Jonckheere-Terpstra, Fligner-Killeen, Hill tail index,
GPD peaks-over-threshold.  The DuckDB oracle gate covers the
cross-engine hash contract; these pin the MATH against independent
python/numpy reimplementations (and Acklam's Φ⁻¹ against an
erf-bisection inverse)."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def _samples(duck):
    um = duck.execute("""
        SELECT user_id, event_type, AVG(value) AS mv
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2""").df()
    types = sorted(um["event_type"].unique())
    return [um.loc[um["event_type"] == t, "mv"].to_numpy()
            for t in types]


def test_jonckheere_terpstra_vs_python(spark, sf_dir, duck):
    """J recomputed as the literal pairwise Mann-Whitney sweep."""
    groups = _samples(duck)
    j = 0.0
    for i in range(len(groups)):
        for jdx in range(i + 1, len(groups)):
            x, y = groups[i], groups[jdx]
            j += float((x[:, None] < y[None, :]).sum())
            j += 0.5 * float((x[:, None] == y[None, :]).sum())
    n = sum(len(g) for g in groups)
    sq2 = sum(len(g) ** 2 for g in groups)
    sq3 = sum(len(g) ** 2 * (2 * len(g) + 3) for g in groups)
    mean_j = (n * n - sq2) / 4.0
    sd_j = math.sqrt((n * n * (2 * n + 3) - sq3) / 72.0)
    row = QUERIES["stat_jonckheere_terpstra"](spark, sf_dir).collect()[0]
    assert (row["n"], row["k"]) == (n, len(groups))
    assert abs(row["j_stat"] - j) < 1e-4
    assert abs(row["z"] - (j - mean_j) / sd_j) < 1e-4


def _qnorm_ref(p: float) -> float:
    """Independent Φ⁻¹ via bisection on the erf-based CDF."""
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if 0.5 * (1.0 + math.erf(mid / math.sqrt(2.0))) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def test_acklam_qnorm_accuracy():
    """Acklam's rational Φ⁻¹ (the oracle-shared helper) agrees with an
    erf-bisection inverse to ~1e-8 across the whole open interval,
    including both tail branches."""
    from data_ingestor_and_features_creator_spark.plans.q_round11i import (
        _qnorm_sql)
    import duckdb
    ps = [1e-6, 0.001, 0.02, 0.0243, 0.05, 0.3, 0.5, 0.7, 0.9, 0.9757,
          0.99, 0.999, 1 - 1e-6]
    con = duckdb.connect()
    for p in ps:
        got = con.execute(
            f"SELECT {_qnorm_sql(f'CAST({p!r} AS DOUBLE)')}"
        ).fetchone()[0]
        assert abs(got - _qnorm_ref(p)) < 2e-8, p


def test_fligner_killeen_vs_python(spark, sf_dir, duck):
    """FK χ² recomputed with numpy midranks + erf-bisection normal
    scores (fully independent of the Acklam helper).  FK runs on RAW
    event values (not the per-user means JT uses)."""
    raw = duck.execute("""
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)""").df()
    types = sorted(raw["event_type"].unique())
    groups = [raw.loc[raw["event_type"] == t, "value"].to_numpy()
              for t in types]
    avs, gidx = [], []
    for gi, g in enumerate(groups):
        srt = np.sort(g)
        med = srt[math.ceil(len(g) / 2.0) - 1]
        for v in g:
            avs.append(abs(v - med))
            gidx.append(gi)
    avs = np.asarray(avs)
    gidx = np.asarray(gidx)
    order = np.argsort(avs, kind="stable")
    ranks = np.empty(len(avs))
    sorted_av = avs[order]
    i = 0
    while i < len(avs):
        jj = i
        while jj < len(avs) and sorted_av[jj] == sorted_av[i]:
            jj += 1
        ranks[order[i:jj]] = (i + jj + 1) / 2.0
        i = jj
    n = len(avs)
    a = np.array([_qnorm_ref(0.5 + r / (2.0 * (n + 1))) for r in ranks])
    abar = a.mean()
    num = sum(((a[gidx == gi]).sum() ** 2) / (gidx == gi).sum()
              for gi in range(len(groups))) - n * abar ** 2
    s2 = ((a - abar) ** 2).sum() / (n - 1)
    row = QUERIES["stat_fligner_killeen"](spark, sf_dir).collect()[0]
    assert (row["n"], row["k"]) == (n, len(groups))
    assert abs(row["fk_stat"] - num / s2) < 1e-3


def test_hill_tail_index_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT o_orderpriority AS grp, o_totalprice AS x
        FROM orders""").df()
    rows = {r["grp"]: r for r in
            QUERIES["agg_hill_tail_index"](spark, sf_dir).collect()}
    for grp, g in df.groupby("grp"):
        x = np.sort(g["x"].to_numpy())[::-1]
        n = len(x)
        k = max(10, int(math.floor(0.05 * n)))
        slog = float(np.log(x[:k] / x[k]).sum())
        r = rows[grp]
        assert (r["n"], r["k"]) == (n, k)
        assert abs(r["hill_alpha"] - k / slog) < 1e-4


def test_gpd_pot_vs_numpy(spark, sf_dir, duck):
    df = duck.execute("""
        SELECT l_returnflag AS grp, l_extendedprice AS x
        FROM lineitem""").df()
    rows = {r["grp"]: r for r in
            QUERIES["agg_gpd_pot_moments"](spark, sf_dir).collect()}
    for grp, g in df.groupby("grp"):
        x = np.sort(g["x"].to_numpy())
        n = len(x)
        u = x[math.ceil(0.95 * n) - 1]
        y = x[x > u] - u
        m, v = y.mean(), y.var(ddof=1)
        xi = 0.5 * (1.0 - m * m / v)
        beta = 0.5 * m * (m * m / v + 1.0)
        r = rows[grp]
        assert (r["n"], r["n_exc"]) == (n, len(y))
        assert abs(r["u"] - u) < 1e-6
        assert abs(r["xi"] - xi) < 1e-4
        assert abs(r["beta"] - beta) < 1e-3
