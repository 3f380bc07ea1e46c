"""Known-answer tests for the round-11 batch-J operators
(q_round11j): Spiegelhalter z, Hosmer-Lemeshow, Fleiss' kappa,
rank-biased overlap — each replayed with an independent pandas/python
reimplementation (RBO via the literal prefix-intersection sum, which
also proves the plan's tail-weight identity)."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()

_SCORED = """
    SELECT e.value, e.event_type,
           0.02 + 0.96 * (e.value - m.vmin) / (m.vmax - m.vmin) AS p,
           CASE WHEN e.event_type IN ('click', 'purchase')
                THEN 1 ELSE 0 END AS y
    FROM events e, (SELECT MIN(value) AS vmin, MAX(value) AS vmax
                    FROM events
                    WHERE value IS NOT NULL AND NOT isnan(value)) m
    WHERE e.value IS NOT NULL AND NOT isnan(e.value)"""


def test_spiegelhalter_z_vs_numpy(spark, sf_dir, duck):
    df = duck.execute(_SCORED).df()
    p, y = df["p"].to_numpy(), df["y"].to_numpy()
    num = ((y - p) * (1 - 2 * p)).sum()
    den = ((1 - 2 * p) ** 2 * p * (1 - p)).sum()
    row = QUERIES["ml_spiegelhalter_z"](spark, sf_dir).collect()[0]
    assert row["n"] == len(p)
    assert abs(row["z"] - num / math.sqrt(den)) < 1e-4


def test_hosmer_lemeshow_vs_pandas(spark, sf_dir, duck):
    """Value-atomic decile binning + the HL χ² replayed in pandas."""
    df = duck.execute(_SCORED).df().sort_values("p", kind="stable")
    n = len(df)
    cells = df.groupby("p", sort=True).agg(
        cnt=("y", "size"), pos=("y", "sum"))
    cum0 = cells["cnt"].cumsum().shift(fill_value=0)
    cells["bin"] = (cum0 * 10) // n
    hl = 0.0
    expect = {}
    for b, g in cells.groupby("bin"):
        n_b = int(g["cnt"].sum())
        obs = int(g["pos"].sum())
        exp = round(float((g.index * g["cnt"]).sum()), 6)
        contrib = round((obs - exp) ** 2 / (exp * (1 - exp / n_b)), 6)
        hl += contrib
        expect[int(b)] = (n_b, obs, exp, contrib)
    rows = QUERIES["ml_hosmer_lemeshow"](spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        n_b, obs, exp, contrib = expect[r["bin"]]
        assert (r["n_b"], r["obs_pos"]) == (n_b, obs)
        assert abs(r["exp_pos"] - exp) < 1e-5
        assert abs(r["contrib"] - contrib) < 1e-4
        assert abs(r["hl_stat"] - hl) < 1e-3


def test_fleiss_kappa_vs_python(spark, sf_dir, duck):
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
    n_items, m = len(items), 4
    pbar = ((nij ** 2).groupby("item").sum().sum() - n_items * m) / (
        n_items * m * (m - 1))
    pj = nij.groupby("cat").sum() / (n_items * m)
    pe = float((pj ** 2).sum())
    kappa = (pbar - pe) / (1 - pe)
    row = QUERIES["ml_fleiss_kappa"](spark, sf_dir).collect()[0]
    assert (row["n_items"], row["n_raters"]) == (n_items, m)
    assert abs(row["pbar"] - pbar) < 1e-5
    assert abs(row["pbar_e"] - pe) < 1e-5
    assert abs(row["kappa"] - kappa) < 1e-4


def test_rbo_vs_prefix_intersections(spark, sf_dir, duck):
    """Truncated RBO computed the textbook way — explicit |A_:d ∩
    B_:d| at every depth — validating the plan's per-item tail-weight
    reformulation."""
    def top(yr):
        return duck.execute(f"""
            SELECT l_partkey FROM (
              SELECT l_partkey,
                     CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                                   AS DECIMAL(38,12))) AS DOUBLE) AS rev
              FROM lineitem
              WHERE EXTRACT(YEAR FROM l_shipdate) = {yr}
              GROUP BY l_partkey)
            ORDER BY rev DESC, l_partkey LIMIT 50""").df()[
                "l_partkey"].tolist()
    a, b = top(1995), top(1996)
    p, rbo = 0.9, 0.0
    for d in range(1, 51):
        rbo += round(p ** (d - 1) / d, 12) * len(
            set(a[:d]) & set(b[:d]))
    rbo *= (1 - p)
    row = QUERIES["ml_rank_biased_overlap"](spark, sf_dir).collect()[0]
    assert row["n_common"] == len(set(a) & set(b))
    assert abs(row["rbo"] - rbo) < 1e-5
