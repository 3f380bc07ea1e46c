"""Known-answer tests for the round-11 batch-M operators
(q_round11m): Murphy's Brier decomposition, ADX/DMI, Cuzick's trend
test, event-study effects — replayed with independent pandas/numpy
reimplementations.  Cuzick's null moments are additionally verified
against Monte-Carlo permutation moments (the formula itself is
checked, not just mirrored)."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()

_SCORED = """
    SELECT 0.02 + 0.96 * (e.value - m.vmin) / (m.vmax - m.vmin) AS p,
           CASE WHEN e.event_type IN ('click', 'purchase')
                THEN 1 ELSE 0 END AS y
    FROM events e, (SELECT MIN(value) AS vmin, MAX(value) AS vmax
                    FROM events
                    WHERE value IS NOT NULL AND NOT isnan(value)) m
    WHERE e.value IS NOT NULL AND NOT isnan(e.value)"""


def test_brier_decomposition_vs_pandas(spark, sf_dir, duck):
    df = duck.execute(_SCORED).df()
    df["bin"] = np.minimum((df["p"] * 10).astype(int), 9)
    n = len(df)
    obar = df["y"].mean()
    rel = res = 0.0
    for _, g in df.groupby("bin"):
        pb, ob = g["p"].mean(), g["y"].mean()
        rel += len(g) * (pb - ob) ** 2 / n
        res += len(g) * (ob - obar) ** 2 / n
    unc = obar * (1 - obar)
    bs = ((df["p"] - df["y"]) ** 2).mean()
    row = QUERIES["ml_brier_decomposition"](spark, sf_dir).collect()[0]
    assert abs(row["reliability"] - rel) < 1e-5
    assert abs(row["resolution"] - res) < 1e-5
    assert abs(row["uncertainty"] - unc) < 1e-5
    assert abs(row["brier_binned"] - (rel - res + unc)) < 1e-5
    assert abs(row["brier"] - bs) < 1e-5


def test_adx_vs_pandas(spark, sf_dir, duck):
    bars = duck.execute("""
        WITH ev AS (
          SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id, value
          FROM events WHERE value IS NOT NULL AND NOT isnan(value))
        SELECT hl.event_type, hl.d, hl.hi, hl.lo, c.cl
        FROM (SELECT event_type, d, MAX(value) hi, MIN(value) lo
              FROM ev GROUP BY 1,2) hl
        JOIN (SELECT event_type, d, value AS cl FROM (
                SELECT event_type, d, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type, d
                           ORDER BY ts DESC, event_id DESC) rn
                FROM ev) WHERE rn = 1) c USING (event_type, d)
        ORDER BY event_type, d""").df()
    got = {(r["event_type"], str(r["d"])): r for r in
           QUERIES["win_adx_dmi"](spark, sf_dir).collect()}
    n_checked = 0
    for t, g in bars.groupby("event_type"):
        hi = g["hi"].to_numpy()
        lo = g["lo"].to_numpy()
        cl = g["cl"].to_numpy()
        up = hi[1:] - hi[:-1]
        dn = lo[:-1] - lo[1:]
        tr = np.maximum.reduce([hi[1:] - lo[1:],
                                np.abs(hi[1:] - cl[:-1]),
                                np.abs(lo[1:] - cl[:-1])])
        pdm = np.where((up > dn) & (up > 0), up, 0.0)
        ndm = np.where((dn > up) & (dn > 0), dn, 0.0)
        days = g["d"].astype(str).to_numpy()[1:]
        dxs = {}
        for i in range(13, len(pdm)):
            s_tr = tr[i - 13:i + 1].sum()
            if s_tr <= 0:
                continue
            pdi = 100 * pdm[i - 13:i + 1].sum() / s_tr
            ndi = 100 * ndm[i - 13:i + 1].sum() / s_tr
            dx = (100 * abs(pdi - ndi) / (pdi + ndi)
                  if pdi + ndi > 0 else None)
            dxs[i] = (pdi, ndi, dx)
            if i >= 26 and all(j in dxs for j in range(i - 13, i + 1)):
                adx = np.mean([dxs[j][2] for j in
                               range(i - 13, i + 1)]) \
                    if all(dxs[j][2] is not None
                           for j in range(i - 13, i + 1)) else None
                r = got.get((t, days[i]))
                assert r is not None, (t, days[i])
                assert abs(r["plus_di"] - pdi) < 1e-4
                assert abs(r["minus_di"] - ndi) < 1e-4
                if dx is not None:
                    assert abs(r["dx"] - dx) < 1e-4
                if adx is not None:
                    assert abs(r["adx"] - adx) < 1e-3
                n_checked += 1
    assert n_checked > 0


def test_cuzick_vs_python_and_permutation(spark, sf_dir, duck):
    um = duck.execute("""
        SELECT user_id, event_type, AVG(value) AS mv
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2""").df()
    types = sorted(um["event_type"].unique())
    zmap = {t: i + 1 for i, t in enumerate(types)}
    z = um["event_type"].map(zmap).to_numpy()
    v = um["mv"].to_numpy()
    order = np.argsort(v, kind="stable")
    r = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        r[order[i:j]] = (i + j + 1) / 2.0
        i = j
    t_stat = float((z * r).sum())
    n = len(v)
    sz1 = int(z.sum())
    sz2 = int((z ** 2).sum())
    et = (n + 1) / 2.0 * sz1
    vt = (n + 1) / 12.0 * (n * sz2 - sz1 * sz1)
    row = QUERIES["stat_cuzick_trend"](spark, sf_dir).collect()[0]
    assert (row["n"], row["k"]) == (n, len(types))
    assert abs(row["t_stat"] - t_stat) < 1e-3
    assert abs(row["z"] - (t_stat - et) / math.sqrt(vt)) < 1e-4
    # Verify the NULL MOMENTS themselves by permutation: T under
    # random rank shuffles must match E[T] and Var[T] (tie-less data
    # ranks are a permutation of 1..n here up to midranks).
    rng = np.random.default_rng(7)
    sims = np.array([(z * rng.permutation(r)).sum()
                     for _ in range(4000)])
    assert abs(sims.mean() - et) / et < 0.01
    assert abs(sims.var() - vt) / vt < 0.10


def test_event_study_vs_pandas(spark, sf_dir, duck):
    uv = duck.execute("""
        SELECT user_id, CAST(ts AS DATE) AS d, AVG(value) AS y
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1, 2""").df()
    uv = uv.sort_values(["y", "user_id", "d"],
                        kind="stable").reset_index(drop=True)
    q = uv["y"].iloc[math.ceil(0.9 * len(uv)) - 1]
    spikes = uv[uv["y"] > q]
    d0 = spikes.groupby("user_id")["d"].min()
    effects = {}
    for tau in range(-5, 6):
        diffs = []
        for _, row in uv.iterrows():
            u, d, y = row["user_id"], row["d"], row["y"]
            if u not in d0.index:
                continue
            if (d - d0[u]).days != tau:
                continue
            ctrl = uv[(uv["d"] == d)
                      & (uv["user_id"].map(
                          lambda x: x not in d0.index
                          or (d0[x] - d).days > 5))]
            if len(ctrl) == 0:
                continue  # engine inner-joins ctrl: no-control days drop
            diffs.append(y - ctrl["y"].mean())
        if diffs:
            effects[tau] = (len(diffs), float(np.mean(diffs)))
    rows = {r["tau"]: r for r in
            QUERIES["causal_event_study"](spark, sf_dir).collect()}
    assert set(rows) == set(effects)
    for tau, (n_obs, eff) in effects.items():
        assert rows[tau]["n_obs"] == n_obs
        assert abs(rows[tau]["effect"] - eff) < 1e-4
