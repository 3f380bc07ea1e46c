"""Round-9e operator additions: Cochran-Armitage trend test, Bayesian
beta-binomial A/B posteriors, a schema-contract audit, and the
Lincoln-Petersen capture-recapture population estimator.

Provenance (SURVEY.md §0 applies — empty reference checkout): the
trend test is Cochran 1954 / Armitage 1955 [PK]; beta-binomial
conjugate updating is textbook Bayes [PK]; schema contracts are
standard data-engineering practice [PK]; Lincoln-Petersen (with the
Chapman correction) is the classic mark-recapture estimator [PK].

Float discipline: integer counts and exact rationals throughout —
posterior means/variances and the trend z² are ratios of exact
integer/DECIMAL sums emitted unrounded; the capture-recapture
estimate is integer-arithmetic (Chapman form) with an exact
integer-division point estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test (dose-response over ordered strata)
# ---------------------------------------------------------------------------

@query("stat_cochran_armitage_trend", oracle="""
WITH f AS (
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) // 6 AS dose,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
  FROM events),
g AS (
  SELECT dose, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(hit) AS BIGINT) AS r
  FROM f GROUP BY dose),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS big_n, CAST(SUM(r) AS BIGINT) AS big_r,
         CAST(SUM(r * dose) AS BIGINT) AS srd,
         CAST(SUM(n * dose) AS BIGINT) AS snd,
         CAST(SUM(n * dose * dose) AS BIGINT) AS sndd
  FROM g)
SELECT big_n, big_r,
       CAST(srd AS DOUBLE)
         - CAST(big_r AS DOUBLE) * snd / big_n AS trend_num,
       (CAST(big_r AS DOUBLE) / big_n)
         * (1.0 - CAST(big_r AS DOUBLE) / big_n)
         * (CAST(sndd AS DOUBLE)
            - CAST(snd AS DOUBLE) * snd / big_n) AS trend_var,
       POW(CAST(srd AS DOUBLE)
           - CAST(big_r AS DOUBLE) * snd / big_n, 2)
         / ((CAST(big_r AS DOUBLE) / big_n)
            * (1.0 - CAST(big_r AS DOUBLE) / big_n)
            * (CAST(sndd AS DOUBLE)
               - CAST(snd AS DOUBLE) * snd / big_n)) AS z_squared
FROM t
""")
def stat_cochran_armitage_trend(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE TREND TEST [PK — Cochran 1954 / Armitage
    1955]: does the purchase RATE trend monotonically across ordered
    hour-of-day quarters (dose scores 0..3)? The dose-response test
    chi-square independence can't give — χ² asks 'any difference',
    the trend statistic asks 'a difference IN THIS ORDER', with one
    degree of freedom and correspondingly more power. z² = T²/Var(T),
    T = Σ r_i·d_i − R·Σ n_i·d_i / N under the null. Every sum is an
    exact BIGINT (counts × small integer scores — no decimal needed),
    the statistic a ratio of identically-assembled doubles emitted
    unrounded. One hash aggregate + 4-row scalar algebra."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.select((F.hour("ts").cast("long") / 6).cast("long")
                  .alias("dose"),
                  F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0).alias("hit"))
    g = f.groupBy("dose").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("hit").alias("r"))
    t = g.agg(F.sum("n").alias("big_n"), F.sum("r").alias("big_r"),
              F.sum(F.col("r") * F.col("dose")).alias("srd"),
              F.sum(F.col("n") * F.col("dose")).alias("snd"),
              F.sum(F.col("n") * F.col("dose") * F.col("dose"))
               .alias("sndd"))
    num = (F.col("srd").cast("double")
           - F.col("big_r").cast("double") * F.col("snd")
           / F.col("big_n"))
    p = F.col("big_r").cast("double") / F.col("big_n")
    var = (p * (1.0 - p)
           * (F.col("sndd").cast("double")
              - F.col("snd").cast("double") * F.col("snd")
              / F.col("big_n")))
    return t.select("big_n", "big_r",
                    num.alias("trend_num"), var.alias("trend_var"),
                    (num * num / var).alias("z_squared"))


# ---------------------------------------------------------------------------
# Bayesian beta-binomial A/B posteriors
# ---------------------------------------------------------------------------

_A0, _B0 = 1, 1  # uniform Beta(1,1) prior


@query("ab_bayes_beta_binomial", oracle=f"""
WITH f AS (
  SELECT ((user_id % 1000003) * 2654435761) % 1000003 % 2 = 0 AS treat,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
  FROM events WHERE user_id IS NOT NULL),
g AS (
  SELECT CASE WHEN treat THEN 'treatment' ELSE 'control' END AS variant,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(hit) AS BIGINT) AS x
  FROM f GROUP BY 1)
SELECT variant, n, x,
       CAST({_A0} + x AS BIGINT) AS alpha_post,
       CAST({_B0} + n - x AS BIGINT) AS beta_post,
       CAST({_A0} + x AS DOUBLE) / ({_A0} + {_B0} + n) AS post_mean,
       CAST({_A0} + x AS DOUBLE) * ({_B0} + n - x)
         / (POW(CAST({_A0} + {_B0} + n AS DOUBLE), 2)
            * ({_A0} + {_B0} + n + 1)) AS post_var,
       (CAST({_A0} + x AS DOUBLE) / ({_A0} + {_B0} + n))
         - CAST(x AS DOUBLE) / n AS shrinkage
FROM g
""")
def ab_bayes_beta_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAYESIAN A/B POSTERIORS [PK — textbook beta-binomial conjugate
    update]: per Knuth-split variant, the Beta(α₀+x, β₀+n−x)
    posterior over the purchase rate under a uniform prior — integer
    posterior parameters, exact-rational posterior mean α/(α+β) and
    variance αβ/((α+β)²(α+β+1)), and the shrinkage (posterior mean −
    MLE) the prior induces. The decision quantity P(θ_T > θ_C) needs
    the incomplete beta (libm) and is the consumer's one numeric
    integration over these EXACT parameters — the op ships everything
    hash-checkable and nothing engine-drifting (the ab_sequential_
    sprt constant-pinning philosophy). One aggregate pass."""
    ev = load_table(spark, sf_dir, "events")
    f = (ev.filter(F.col("user_id").isNotNull())
           .select((((F.col("user_id") % 1000003) * F.lit(2654435761))
                    % 1000003 % 2 == 0).alias("treat"),
                   F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0).alias("hit")))
    g = (f.groupBy(F.when(F.col("treat"), "treatment")
                    .otherwise("control").alias("variant"))
          .agg(F.count(F.lit(1)).alias("n"), F.sum("hit").alias("x")))
    a = F.lit(_A0) + F.col("x")
    b = F.lit(_B0) + F.col("n") - F.col("x")
    ab = (a + b).cast("double")
    return g.select(
        "variant", "n", "x",
        a.cast("long").alias("alpha_post"),
        b.cast("long").alias("beta_post"),
        (a.cast("double") / ab).alias("post_mean"),
        (a.cast("double") * b.cast("double")
         / (ab * ab * (ab + 1))).alias("post_var"),
        (a.cast("double") / ab
         - F.col("x").cast("double") / F.col("n")).alias("shrinkage"))


# ---------------------------------------------------------------------------
# Schema-contract audit (expected columns/types/null budgets)
# ---------------------------------------------------------------------------

# The ingest contract for `events`: (column, expected Spark type,
# max allowed missing ppm). A contract violation shows up as a false
# boolean or a count over budget — hash-checked either way.
_CONTRACT = [
    ("event_id", "bigint", 0),
    ("ts", "timestamp", 0),
    ("user_id", "bigint", 100_000),
    ("event_type", "string", 0),
    ("value", "double", 100_000),
]


@query("audit_schema_contract", oracle=f"""
WITH c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(count_if(event_id IS NULL) AS BIGINT) AS m_event_id,
         CAST(count_if(ts IS NULL) AS BIGINT) AS m_ts,
         CAST(count_if(user_id IS NULL) AS BIGINT) AS m_user_id,
         CAST(count_if(event_type IS NULL) AS BIGINT) AS m_event_type,
         CAST(count_if(value IS NULL OR isnan(value)) AS BIGINT)
           AS m_value
  FROM events)
SELECT col, expected_type, type_ok, missing, missing_budget_ppm,
       missing * 1000000 <= missing_budget_ppm * n AS within_budget
FROM (
  {" UNION ALL ".join(
    f"SELECT '{col}' AS col, '{typ}' AS expected_type, TRUE AS type_ok,"
    f" m_{col} AS missing,"
    f" CAST({ppm} AS BIGINT) AS missing_budget_ppm, n FROM c"
    for col, typ, ppm in _CONTRACT)}) t
""")
def audit_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-CONTRACT AUDIT [PK — standard data-engineering
    practice]: assert the landed table against its declared contract —
    per column, the DECLARED type matches the actual Spark schema
    (checked against the LIVE StructType, emitted as a boolean the
    oracle predicts TRUE; a type regression in the reader flips it)
    and the missing-value count stays inside the contract's ppm
    budget (NaN≡missing for doubles, the house rule). This is the
    check a contract-enforcing ingest (dbt tests / Great-Expectations
    style) runs before publishing a partition; dq_quarantine_dlq is
    its row-level sibling (split the batch), this op is the
    column-level gate (pass/fail the batch). One aggregate pass +
    driver-side schema introspection (schema objects are metadata,
    not data)."""
    ev = load_table(spark, sf_dir, "events")
    actual = {f.name: f.dataType.simpleString()
              for f in ev.schema.fields}
    aggs = [F.count(F.lit(1)).alias("n")]
    for col, _, _ in _CONTRACT:
        miss = F.col(col).isNull()
        if actual.get(col) == "double":
            miss = miss | F.isnan(col)
        aggs.append(F.count_if(miss).alias(f"m_{col}"))
    c = ev.agg(*aggs)
    stack = ", ".join(
        f"'{col}', '{typ}', "
        f"{'true' if actual.get(col) == typ else 'false'}, "
        f"m_{col}, {ppm}L"
        for col, typ, ppm in _CONTRACT)
    return (c.select(
        F.expr(f"stack({len(_CONTRACT)}, {stack}) AS "
               "(col, expected_type, type_ok, missing, "
               "missing_budget_ppm)"),
        "n")
        .select("col", "expected_type", "type_ok", "missing",
                "missing_budget_ppm",
                (F.col("missing") * 1000000
                 <= F.col("missing_budget_ppm") * F.col("n"))
                .alias("within_budget")))


# ---------------------------------------------------------------------------
# Capture-recapture population estimate (Lincoln-Petersen / Chapman)
# ---------------------------------------------------------------------------

@query("stat_capture_recapture", oracle="""
WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
           FROM events),
w1 AS (SELECT DISTINCT user_id FROM events, b
       WHERE user_id IS NOT NULL
         AND (CAST(ts AS DATE) - b.d0) <= (b.d1 - b.d0) // 2),
w2 AS (SELECT DISTINCT user_id FROM events, b
       WHERE user_id IS NOT NULL
         AND (CAST(ts AS DATE) - b.d0) > (b.d1 - b.d0) // 2),
s AS (SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM w1) AS n1,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM w2) AS n2,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM w1 JOIN w2 USING (user_id)) AS m,
        (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
         WHERE user_id IS NOT NULL) AS observed)
SELECT n1, n2, m, observed,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
         AS n_hat_chapman,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) >= observed
         OR m = LEAST(n1, n2) AS estimate_ge_observed
FROM s
""")
def stat_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE population estimate [PK — Lincoln-Petersen
    with the Chapman bias correction]: treat the first and second
    halves of the observed day span as two 'capture' windows; users
    seen in both are the marked recaptures, and
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 estimates the TRUE population
    including users never observed — the estimator analytics teams
    use to size a user base from two incomplete logs (each window
    undercounts; the overlap rate calibrates by how much). All
    INTEGER arithmetic (Chapman's form is exact under integer
    division — emitted via //, identical both engines) plus the
    sanity boolean N̂ ≥ observed (holds unless one window captured
    everything — the m = min(n₁,n₂) escape documents the saturated
    fixture case). ONE per-user membership aggregate + one scalar
    aggregate — no driver-side counting loop; the windows derive
    from the data frontier, never now()."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min(F.to_date("ts")).alias("d0"),
               F.max(F.to_date("ts")).alias("d1"))
    f = (ev.filter(F.col("user_id").isNotNull())
           .crossJoin(F.broadcast(b))
           .select("user_id",
                   (F.datediff(F.to_date("ts"), F.col("d0"))
                    <= F.floor(F.datediff("d1", "d0") / 2))
                   .alias("in_w1")))
    per_user = f.groupBy("user_id").agg(
        F.max("in_w1").alias("w1"),
        F.max(~F.col("in_w1")).alias("w2"))
    s = per_user.agg(
        F.count_if(F.col("w1")).alias("n1"),
        F.count_if(F.col("w2")).alias("n2"),
        F.count_if(F.col("w1") & F.col("w2")).alias("m"),
        F.count(F.lit(1)).alias("observed"))
    n_hat = ((F.col("n1") + 1) * (F.col("n2") + 1)
             ).cast("long") / (F.col("m") + 1)
    n_hat = F.floor(n_hat).cast("long") - 1
    return s.select(
        "n1", "n2", "m", "observed",
        n_hat.alias("n_hat_chapman"),
        ((n_hat >= F.col("observed"))
         | (F.col("m") == F.least("n1", "n2")))
        .alias("estimate_ge_observed"))