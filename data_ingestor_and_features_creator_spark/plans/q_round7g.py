"""Round-7g operator additions: hash-deterministic permutation test,
largest-remainder token-budget apportionment, token-graph link
prediction, and two paired nonparametric tests (sign, McNemar).

Provenance (SURVEY.md §0 applies — empty reference checkout): the
permutation test is Fisher's randomization test [PK] (deterministic
hash permutations follow the repo's stat_bootstrap_ci_hash precedent);
largest-remainder is the Hamilton apportionment method [PK]; Jaccard
link prediction is Liben-Nowell & Kleinberg [PK]; the sign test and
McNemar's test are textbook [PK].

Float discipline: group means come from string-routed DECIMAL sums;
every test statistic and p-value is a ratio of exact quantities and
is emitted UNROUNDED (win_vwap convention); the apportionment op is
INTEGER-EXACT end to end (floor division + remainder ranking — no
floats anywhere).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_str, dsum_str_sql
from .registry import query

_N_PERM = 30        # permutations (bootstrap_ci_hash used 30 reps)
_BUDGET = 1_000_000  # tokens to apportion
_TOPV = 50           # vocabulary cap for the link-prediction graph


# ---------------------------------------------------------------------------
# Fisher permutation test with hash-deterministic relabeling
# ---------------------------------------------------------------------------

@query("stat_permutation_test_hash", oracle=f"""
WITH v AS (
  SELECT event_id, value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
obs AS (
  SELECT {dsum_str_sql('CASE WHEN grp = 1 THEN value END')}
           / COUNT(CASE WHEN grp = 1 THEN 1 END)
         - {dsum_str_sql('CASE WHEN grp = 0 THEN value END')}
           / COUNT(CASE WHEN grp = 0 THEN 1 END) AS d_obs,
         CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n_a,
         CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n_b
  FROM v),
perm AS (
  SELECT p.p, v.value,
         CAST(concat('0x', substr(md5(concat(CAST(p.p AS VARCHAR), ':',
              CAST(v.event_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2
           AS pg
  FROM v, (SELECT unnest(generate_series(1, {_N_PERM})) AS p) p),
pd AS (
  SELECT p,
         {dsum_str_sql('CASE WHEN pg = 1 THEN value END')}
           / COUNT(CASE WHEN pg = 1 THEN 1 END)
         - {dsum_str_sql('CASE WHEN pg = 0 THEN value END')}
           / COUNT(CASE WHEN pg = 0 THEN 1 END) AS d_p
  FROM perm GROUP BY p)
SELECT o.n_a, o.n_b, o.d_obs,
       CAST(COUNT(CASE WHEN ABS(pd.d_p) >= ABS(o.d_obs) THEN 1 END)
            AS BIGINT) AS n_extreme,
       (CAST(COUNT(CASE WHEN ABS(pd.d_p) >= ABS(o.d_obs) THEN 1 END)
             AS DOUBLE) + 1.0) / ({_N_PERM} + 1.0) AS p_value
FROM pd, obs o
GROUP BY o.n_a, o.n_b, o.d_obs
""")
def stat_permutation_test_hash(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """FISHER PERMUTATION TEST [PK] for the click-vs-rest mean-value
    difference, with HASH-DETERMINISTIC permutations (md5(p:event_id)
    parity — the stat_bootstrap_ci_hash precedent: both engines
    derive the identical pseudo-random relabeling from the same
    digest, so the 'randomization' is reproducible and oracle-
    checkable, and there is no RNG in either plan). {_N_PERM}
    relabelings, two-sided p = (1 + #extreme)/({_N_PERM}+1) — the
    +1 smoothing keeps p valid [PK]. Group means are string-routed
    DECIMAL-sum ratios (bit-identical), so every |d_p| ≥ |d_obs|
    comparison resolves identically cross-engine; d_obs and p
    emitted UNROUNDED. Scale: the permutation fan-out is one
    explode (N×{_N_PERM} rows) into a map-side-combined aggregate —
    embarrassingly parallel, no shuffle beyond the {_N_PERM}-group
    agg; at 100 TB you sample rows first (the published practice),
    not permutations."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_id", "value",
                   F.when(F.col("event_type") == "click", 1).otherwise(0)
                   .alias("grp")))
    mean_of = (lambda flag, col="grp":
               dsum_str(F.when(F.col(col) == flag, F.col("value")))
               / F.count(F.when(F.col(col) == flag, 1)))
    obs = v.agg(
        (mean_of(1) - mean_of(0)).alias("d_obs"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("n_a"),
        F.count(F.when(F.col("grp") == 0, 1)).alias("n_b"))
    # Repartition BEFORE the ×N_PERM explode (round-11 optimization,
    # guide §2.5 "input skew"): the fixture parquet is one row group ⇒
    # the scan is ONE task, and the explode + per-row md5 + string-
    # routed decimal sums all ran serially inside that scan stage
    # (measured 5.2-12.3 s at sf0.1; 1.3 s spread across cores). The
    # same shape is right at cluster scale whenever the fan-out work
    # outweighs the narrow input (one small shuffle of (id, value)
    # rows buys N_PERM× parallel hashing above it).
    perm = (v.repartition("event_id").select(
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(_N_PERM))).alias("p"),
        "event_id")
        .withColumn(
            "pg",
            F.expr("CAST(conv(substring(md5(concat(CAST(p AS STRING), "
                   "':', CAST(event_id AS STRING))), 1, 8), 16, 10) "
                   "AS BIGINT)") % 2))
    pd_ = perm.groupBy("p").agg(
        (mean_of(1, "pg") - mean_of(0, "pg")).alias("d_p"))
    j = pd_.crossJoin(F.broadcast(obs))
    return (j.groupBy("n_a", "n_b", "d_obs")
            .agg(F.count(F.when(F.abs(F.col("d_p"))
                                >= F.abs(F.col("d_obs")), 1))
                 .alias("n_extreme"))
            .select("n_a", "n_b", "d_obs", "n_extreme",
                    ((F.col("n_extreme").cast("double") + 1.0)
                     / (_N_PERM + 1.0)).alias("p_value")))


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) token-budget apportionment
# ---------------------------------------------------------------------------

@query("data_token_budget_allocate", oracle=f"""
WITH inv AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS weight
  FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(weight) AS BIGINT) AS total FROM inv),
q AS (
  SELECT source, weight,
         ({_BUDGET} * weight) // t.total AS floor_alloc,
         ({_BUDGET} * weight) % t.total AS rem
  FROM inv, t),
r AS (
  SELECT source, weight, floor_alloc, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
         {_BUDGET} - SUM(floor_alloc) OVER () AS leftover
  FROM q)
SELECT source, weight, CAST(floor_alloc AS BIGINT) AS floor_alloc,
       CAST(floor_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM r
""")
def data_token_budget_allocate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET APPORTIONMENT via the largest-remainder (Hamilton)
    method [PK]: split a {_BUDGET:,}-token training budget across
    sources proportionally to their char mass, with Σalloc == budget
    EXACTLY — naive rounding under- or over-shoots by up to
    n_sources/2 tokens and the discrepancy compounds across pipeline
    stages. INTEGER-EXACT end to end: floor shares are
    (budget·weight) // total (bigint products ~1e14, far inside
    int64), leftovers go to the largest remainders ((budget·weight)
    mod total) under a total order (rem DESC, source) — no doubles,
    no rounding conventions, nothing for the engines to disagree on.
    The same op is the sampling-weight integerizer for
    data_mix_temperature's real-valued weights at materialization
    time. Source-level: the plan is vocabulary-sized after one
    corpus aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    inv = (docs.groupBy("source")
               .agg(F.sum("n_chars").cast("long").alias("weight")))
    t = inv.agg(F.sum("weight").cast("long").alias("total"))
    # DIV, not `/`-then-cast (ADVICE r7): Spark's `/` on bigints is
    # DOUBLE division — for budget·weight > 2^53 or a quotient within
    # an ulp of an integer, the rounded double can truncate to a
    # different floor than the oracle's exact integer `//`. DIV keeps
    # both engines on exact bigint arithmetic, honoring the
    # "INTEGER-EXACT end to end" contract below.
    q = (inv.crossJoin(F.broadcast(t))
            .select("source", "weight",
                    F.expr(f"({_BUDGET} * weight) DIV total")
                     .alias("floor_alloc"),
                    ((F.lit(_BUDGET) * F.col("weight"))
                     % F.col("total")).alias("rem")))
    wall = W.orderBy(F.desc("rem"), "source")
    r = q.select(
        "source", "weight", "floor_alloc", "rem",
        F.row_number().over(wall).alias("rr"),
        (F.lit(_BUDGET) - F.sum("floor_alloc").over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
        .alias("leftover"))
    return r.select(
        "source", "weight", "floor_alloc",
        (F.col("floor_alloc")
         + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0))
        .cast("long").alias("alloc"))


# ---------------------------------------------------------------------------
# Jaccard link prediction over the token co-occurrence graph
# ---------------------------------------------------------------------------

@query("graph_jaccard_link_predict", oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents),
tk AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
  FROM tk GROUP BY tok),
top AS (
  SELECT tok, df FROM (
    SELECT tok, df, ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS r
    FROM df) WHERE r <= {_TOPV}),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b,
         a.df AS df_a, b.df AS df_b
  FROM top a JOIN top b ON a.tok < b.tok),
inter AS (
  SELECT x.tok AS tok_a, y.tok AS tok_b,
         CAST(COUNT(*) AS BIGINT) AS both_docs
  FROM tk x JOIN tk y
    ON x.doc_id = y.doc_id AND x.tok < y.tok
  WHERE x.tok IN (SELECT tok FROM top)
    AND y.tok IN (SELECT tok FROM top)
  GROUP BY x.tok, y.tok),
scored AS (
  SELECT p.tok_a, p.tok_b,
         COALESCE(i.both_docs, 0) AS both_docs,
         CAST(COALESCE(i.both_docs, 0) AS DOUBLE)
           / (p.df_a + p.df_b - COALESCE(i.both_docs, 0)) AS jaccard
  FROM pairs p LEFT JOIN inter i
    ON p.tok_a = i.tok_a AND p.tok_b = i.tok_b)
SELECT tok_a, tok_b, both_docs, jaccard
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, tok_a,
                                   tok_b) AS r
      FROM scored)
WHERE r <= 20
""")
def graph_jaccard_link_predict(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """JACCARD LINK PREDICTION (Liben-Nowell & Kleinberg [PK]) on the
    token/document bipartite graph: for the top-{_TOPV} tokens by
    document frequency, score every pair by |docs(a) ∩ docs(b)| /
    |docs(a) ∪ docs(b)| and emit the 20 strongest links under a total
    order — the neighborhood-overlap primitive behind related-term
    suggestion and taxonomy induction. Scale discipline: the
    vocabulary is CAPPED before any pairing (top-{_TOPV} broadcast),
    so the candidate space is {_TOPV}²/2 regardless of corpus size,
    and the intersection join runs doc-by-doc on the capped postings
    only — never all-pairs over the vocabulary. Counts exact;
    jaccard is a small-integer ratio emitted UNROUNDED; ranks are
    integer-total-ordered (ties broken by the pair) so top-20 is
    deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    tk = (docs.select("doc_id",
                      F.explode(F.split("text", " ")).alias("tok"))
              .filter(F.col("tok") != "").distinct())
    dfreq = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = (dfreq.select("tok", "df",
                        F.row_number().over(
                            W.orderBy(F.desc("df"), "tok")).alias("r"))
                .filter(F.col("r") <= _TOPV).drop("r"))
    a = top.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    b = top.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    pairs = a.join(b, F.col("tok_a") < F.col("tok_b"))
    capped = tk.join(F.broadcast(top.select("tok")), "tok")
    x = capped.select("doc_id", F.col("tok").alias("tok_a"))
    y = capped.select("doc_id", F.col("tok").alias("tok_b"))
    inter = (x.join(y, ["doc_id"])
              .filter(F.col("tok_a") < F.col("tok_b"))
              .groupBy("tok_a", "tok_b")
              .agg(F.count(F.lit(1)).alias("both_docs")))
    scored = (pairs.join(inter, ["tok_a", "tok_b"], "left")
              .select("tok_a", "tok_b",
                      F.coalesce("both_docs", F.lit(0)).alias("both_docs"),
                      (F.coalesce("both_docs", F.lit(0)).cast("double")
                       / (F.col("df_a") + F.col("df_b")
                          - F.coalesce("both_docs", F.lit(0))))
                      .alias("jaccard")))
    return (scored.select(
        "*", F.row_number().over(
            W.orderBy(F.desc("jaccard"), "tok_a", "tok_b")).alias("r"))
        .filter(F.col("r") <= 20)
        .select("tok_a", "tok_b", "both_docs", "jaccard"))


# ---------------------------------------------------------------------------
# Paired sign test per event_type
# ---------------------------------------------------------------------------

@query("stat_sign_test", oracle="""
WITH v AS (
  SELECT event_type, user_id, ts, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
d AS (
  SELECT event_type,
         value - LAG(value) OVER (PARTITION BY event_type, user_id
                                  ORDER BY ts, event_id) AS diff
  FROM v),
s AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN diff > 0 THEN 1 END) AS BIGINT) AS n_pos,
         CAST(COUNT(CASE WHEN diff < 0 THEN 1 END) AS BIGINT) AS n_neg
  FROM d WHERE diff IS NOT NULL AND diff <> 0 GROUP BY event_type)
SELECT event_type, n_pos, n_neg,
       CASE WHEN n_pos + n_neg > 0 THEN
         (CAST(n_pos AS DOUBLE) - CAST(n_pos + n_neg AS DOUBLE) / 2.0)
         / SQRT(CAST(n_pos + n_neg AS DOUBLE) / 4.0)
       END AS z_sign
FROM s
""")
def stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIGN TEST [PK] on consecutive per-user value changes, pooled
    per event_type: under no drift, ups and downs are equally likely,
    so n_pos ~ Binomial(n, ½) and z = (n_pos − n/2)/√(n/4) — the
    assumption-free trend check that needs NO magnitudes (immune to
    the heavy tails that wreck a paired t-test; ties dropped per the
    classical definition, and exact zero diffs ARE exact here —
    double subtraction of identical values). Counts exact integers;
    z is identical IEEE arithmetic emitted UNROUNDED. One
    (type, user) window + one map-combined aggregate."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type", "user_id", "ts", "event_id", "value"))
    wo = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    d = v.select("event_type",
                 (F.col("value") - F.lag("value").over(wo)).alias("diff"))
    s = (d.filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
          .groupBy("event_type")
          .agg(F.count(F.when(F.col("diff") > 0, 1)).alias("n_pos"),
               F.count(F.when(F.col("diff") < 0, 1)).alias("n_neg")))
    ntot = (F.col("n_pos") + F.col("n_neg")).cast("double")
    z = ((F.col("n_pos").cast("double") - ntot / 2.0)
         / F.sqrt(ntot / 4.0))
    return s.select("event_type", "n_pos", "n_neg",
                    F.when(F.col("n_pos") + F.col("n_neg") > 0, z)
                    .alias("z_sign"))


# ---------------------------------------------------------------------------
# McNemar's test between two classification rules
# ---------------------------------------------------------------------------

@query("agg_mcnemar_test", oracle="""
WITH v AS (
  SELECT event_type,
         CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS m1,
         CASE WHEN value > 60.0 THEN 1 ELSE 0 END AS m2
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
c AS (
  SELECT event_type,
         CAST(SUM(m1 * (1 - m2)) AS BIGINT) AS b,
         CAST(SUM((1 - m1) * m2) AS BIGINT) AS c,
         CAST(SUM(m1 * m2) AS BIGINT) AS both_pos,
         CAST(SUM((1 - m1) * (1 - m2)) AS BIGINT) AS both_neg
  FROM v GROUP BY event_type)
SELECT event_type, both_pos, both_neg, b, c,
       CASE WHEN b + c > 0 THEN
         (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
         * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE))
         / CAST(b + c AS DOUBLE)
       END AS mcnemar_chi2
FROM c
""")
def agg_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST [PK] between two classification rules on the
    SAME rows (threshold-50 vs threshold-60 as the fixture's model
    pair): only the DISAGREEMENT cells matter — chi² = (b−c)²/(b+c)
    — which is why it is the correct 'is model B actually better'
    test on a shared eval set where the two models' errors are
    correlated and a two-proportion z (which assumes independence)
    overstates significance. Emits the full 2×2 concordance table
    (exact integers) plus the statistic (exact-rational arithmetic,
    UNROUNDED). One map-combined aggregate — the cheapest possible
    paired-model comparison at any scale."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("event_type",
                   F.when(F.col("value") > 50.0, 1).otherwise(0)
                   .alias("m1"),
                   F.when(F.col("value") > 60.0, 1).otherwise(0)
                   .alias("m2")))
    c = v.groupBy("event_type").agg(
        F.sum(F.col("m1") * (1 - F.col("m2"))).alias("b"),
        F.sum((1 - F.col("m1")) * F.col("m2")).alias("c"),
        F.sum(F.col("m1") * F.col("m2")).alias("both_pos"),
        F.sum((1 - F.col("m1")) * (1 - F.col("m2"))).alias("both_neg"))
    bd, cd = F.col("b").cast("double"), F.col("c").cast("double")
    chi2 = (bd - cd) * (bd - cd) / (F.col("b") + F.col("c")).cast("double")
    return c.select("event_type", "both_pos", "both_neg", "b", "c",
                    F.when(F.col("b") + F.col("c") > 0, chi2)
                    .alias("mcnemar_chi2"))
