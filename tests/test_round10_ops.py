"""Known-answer / property tests for the round-10 operator batch —
hand-computed or numpy-verified values on tiny planted frames, plus
shape checks on the fixture (the DuckDB oracle gate covers the
cross-engine hash contract; these pin the MATH)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestor_and_features_creator_spark import plans

QUERIES = plans.queries()


def test_bh_fdr_known_vector(spark, sf_dir):
    """BH on a hand-worked vector: with m tests, q(i) = min_{j>=i}
    p(j)*m/j. Verify the registered op's q values satisfy the BH
    identity recomputed in python from its own emitted p values."""
    rows = QUERIES["stat_bh_fdr"](spark, sf_dir).collect()
    assert rows
    m = len(rows)
    byp = sorted(rows, key=lambda r: (r["p_cheb"], r["event_type"]))
    run = 1.0
    for i in range(m - 1, -1, -1):
        raw = byp[i]["p_cheb"] * m / (i + 1)
        run = min(run, raw)
        # q computed from UNROUNDED p upstream; 6-dp inputs here give
        # a small tolerance band
        assert abs(byp[i]["q_bh"] - min(1.0, run)) < 1e-4, (i, byp[i])
        assert byp[i]["reject_10"] == (byp[i]["q_bh"] <= 0.1 + 1e-4) or \
            abs(byp[i]["q_bh"] - 0.1) < 1e-4
    # q is monotone non-decreasing in p
    qs = [r["q_bh"] for r in byp]
    assert qs == sorted(qs)


def test_kendall_tau_known_contingency():
    """τ-b on a hand-computed 2×2 contingency: cells (x=0,y=0):2,
    (x=0,y=1):1, (x=1,y=0):1, (x=1,y=1):3 → C = 2·3 = 6, D = 1·1 = 1,
    n = 7, n0 = 21, n1t = 3+6 = 9, n2t = 3+6 = 9,
    τ = 5/√(12·12) = 5/12."""
    cells = {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 1): 3}
    conc = sum(c1 * c2 for (x1, y1), c1 in cells.items()
               for (x2, y2), c2 in cells.items() if x2 > x1 and y2 > y1)
    disc = sum(c1 * c2 for (x1, y1), c1 in cells.items()
               for (x2, y2), c2 in cells.items() if x2 > x1 and y2 < y1)
    n = sum(cells.values())
    n0 = n * (n - 1) // 2
    nx = {}
    ny = {}
    for (x, y), c in cells.items():
        nx[x] = nx.get(x, 0) + c
        ny[y] = ny.get(y, 0) + c
    n1t = sum(c * (c - 1) // 2 for c in nx.values())
    n2t = sum(c * (c - 1) // 2 for c in ny.values())
    tau = (conc - disc) / math.sqrt((n0 - n1t) * (n0 - n2t))
    assert conc == 6 and disc == 1
    assert abs(tau - 5 / 12) < 1e-12


def test_kendall_tau_fixture_bounds(spark, sf_dir):
    rows = QUERIES["stat_kendall_tau_b"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["tau_b"] is not None:
            assert -1.0 <= r["tau_b"] <= 1.0, r


def test_hash_priority_sample_matches_python_md5(spark, sf_dir):
    """The bottom-k sample is EXACTLY the k smallest md5(event_id)
    strings — recomputed independently with hashlib."""
    from data_ingestor_and_features_creator_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    ids = [r["event_id"] for r in ev.select("event_id").collect()]
    expect = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids)[:500]
    got = [(r["pri"], r["event_id"])
           for r in QUERIES["data_sample_hash_priority"](
               spark, sf_dir).collect()]
    assert got == expect[:len(got)]


def test_threshold_confusion_identities(spark, sf_dir):
    r = QUERIES["ml_threshold_confusion"](spark, sf_dir).collect()[0]
    tp, fp, fn, tn = r["tp"], r["fp"], r["fn"], r["tn"]
    assert tp + fp + fn + tn > 0
    if r["precision_"] is not None:
        assert abs(r["precision_"] - tp / (tp + fp)) < 1e-6
    if r["recall_"] is not None:
        assert abs(r["recall_"] - tp / (tp + fn)) < 1e-6
    if r["f1"] is not None:
        assert abs(r["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6
    if r["mcc"] is not None:
        den = math.sqrt((tp + fp) * (tp + fn)) * math.sqrt(
            (tn + fp) * (tn + fn))
        assert abs(r["mcc"] - (tp * tn - fp * fn) / den) < 1e-5
        assert -1.0 <= r["mcc"] <= 1.0


def test_pacf_matches_numpy_yule_walker(spark, sf_dir):
    """PACF at lag k equals the last coefficient of the order-k
    Yule-Walker solve on the SAME per-lag-Pearson ACF values — verify
    the Durbin-Levinson algebra against numpy's linear solve for a
    few fixture users."""
    rows = {r["user_id"]: r for r in QUERIES["ts_pacf_durbin_levinson"](
        spark, sf_dir).collect()}
    checked = 0
    for uid, r in rows.items():
        if any(r[f"pacf{k}"] is None for k in (1, 2, 3)):
            continue
        # rebuild rho from pacf1 and the recursion inputs: pacf1 = rho1;
        # invert pacf2 for rho2; invert pacf3 for rho3
        r1 = r["pacf1"]
        p2 = r["pacf2"]
        rho2 = p2 * (1 - r1 * r1) + r1 * r1
        phi21 = r1 * (1 - p2)
        p3 = r["pacf3"]
        rho3 = p3 * (1 - phi21 * r1 - p2 * rho2) + phi21 * rho2 + p2 * r1
        rho = np.array([r1, rho2, rho3])
        # Yule-Walker order-3: R phi = rho, R toeplitz of [1, r1, rho2]
        R = np.array([[1, r1, rho2], [r1, 1, r1], [rho2, r1, 1]])
        try:
            phi = np.linalg.solve(R, rho)
        except np.linalg.LinAlgError:
            continue
        assert abs(phi[-1] - p3) < 1e-4, (uid, phi[-1], p3)
        checked += 1
    assert checked >= 3


def test_rolling_sharpe_matches_pandas(spark, sf_dir):
    """Rolling Sharpe for one fixture user recomputed with pandas
    (diff → rolling(20) mean/std)."""
    import pandas as pd

    from data_ingestor_and_features_creator_spark.catalog import load_table

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value")))
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")) \
            .limit(1).collect()[0]["user_id"]
    pdf = (ev.filter(F.col("user_id") == uid)
             .select("event_id", "ts", "value")
             .orderBy("ts", "event_id").toPandas())
    ret = pdf["value"].diff()
    roll = ret.rolling(20, min_periods=1)
    n = roll.count()
    mean, std = roll.mean(), roll.std(ddof=1)
    expect = pd.Series(np.where((n >= 10) & (std > 0), mean / std, np.nan),
                       index=pdf.index)
    got = {r["event_id"]: r["sharpe"]
           for r in QUERIES["win_rolling_sharpe"](spark, sf_dir)
           .filter(F.col("user_id") == uid).collect()}
    checked = 0
    for i, eid in enumerate(pdf["event_id"]):
        g = got[eid]
        e = expect.iloc[i]
        if g is None:
            assert np.isnan(e) or not np.isfinite(e), (eid, e)
        else:
            assert abs(g - e) < 1e-5, (eid, g, e)
            checked += 1
    assert checked >= 10


def test_seasonal_strength_planted_extremes(spark, sf_dir, tmp_path):
    """A series that is a pure function of hour-of-day has strength 1;
    an hour-constant series has strength ~0 — planted through a temp
    events table and the SAME op body (rebuilt on the temp dir)."""
    import os

    import duckdb

    src = duckdb.connect()
    src.execute(f"""
        COPY (
          WITH g AS (SELECT unnest(generate_series(0, 479)) AS i)
          SELECT CAST(i AS BIGINT) AS event_id,
                 TIMESTAMP '2024-01-01' + INTERVAL (i) HOUR AS ts,
                 CAST(CASE WHEN i % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
                   AS user_id,
                 'view' AS event_type,
                 CAST(CASE WHEN i % 2 = 0
                      THEN 10.0 * (i % 24)        -- pure hour signal
                      ELSE 5.0 + (i % 7)          -- hour-independent
                 END AS DOUBLE) AS value,
                 '' AS props
          FROM g
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{tmp_path}/{t}.parquet")
    rows = {r["user_id"]: r["seasonal_strength"]
            for r in QUERIES["ts_seasonal_strength"](
                spark, str(tmp_path)).collect()}
    assert rows[1] is not None and rows[1] > 0.999, rows
    # user 2's value = 5 + (i % 7): period-7 pattern over hourly rows is
    # NOT aligned with hour-of-day (gcd(7,24)=1 → every hour sees every
    # phase) → hour profile explains ~nothing
    assert rows[2] is not None and rows[2] < 0.05, rows


def test_triangle_bitmap_equals_path_join(spark, sf_dir):
    """The dense-regime bitmap intersection and the wedge-path join
    are two implementations of the same count — cross-validate them
    on the fixture graph (each is also independently SQL-oracled)."""
    a = QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    b = QUERIES["graph_triangle_bitmap"](spark, sf_dir).collect()[0]
    assert a["n_triangles"] == b["n_triangles"] > 0
    assert a["n_edges"] == b["n_edges"] > 0
