"""Round-11 operator batch D (SURVEY.md §2 growth): generation-eval
metrics (corpus BLEU-2, ROUGE-2 recall) and the matrix-profile discord
detector for time series.

BLEU/ROUGE need (candidate, reference) pairs; the fixture construction
is the deterministic SHIFT SELF-EVAL: candidate = tokens 2..41 of each
document, reference = tokens 1..40 — high-but-not-total n-gram overlap
(every unigram matches except multiplicity edges, bigrams break at the
window ends), candidate never longer than the reference so the brevity
penalty is exercised, and both engines build the exact same pair from
the same text with no external model output needed. Tokenization is
the house single-space twin (split(' ') ≡ string_split(' '), empties
filtered) — textops convention.

Provenance ([PK], empty reference checkout — SURVEY §0): Papineni et
al. 2002 (BLEU); Lin 2004 (ROUGE); Yeh, Keogh et al. 2016 (matrix
profile / discord discovery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql, safe_div, \
    safe_div_sql
from .registry import query

# ---------------------------------------------------------------------------
# Shared shift-pair n-gram tables
# ---------------------------------------------------------------------------

# cand = tokens[2..41] (1-based, 40 tokens), ref = tokens[1..40].
# DuckDB list slicing xs[a:b] is 1-based inclusive; Spark slice(xs, a, n)
# takes n elements from 1-based position a — both yield the same slices.
_TOK_SQL = """
tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents),
pairs AS (
  SELECT doc_id, ts[2:41] AS cand, ts[1:40] AS ref
  FROM tok),
cpos AS (
  SELECT doc_id, g AS i, cand[g + 1] AS t
  FROM pairs, unnest(generate_series(0, len(cand) - 1)) AS u(g)),
rpos AS (
  SELECT doc_id, g AS i, ref[g + 1] AS t
  FROM pairs, unnest(generate_series(0, len(ref) - 1)) AS u(g)),
cbig AS (
  SELECT doc_id, t || ' ' || LEAD(t) OVER (PARTITION BY doc_id
                                           ORDER BY i) AS g
  FROM cpos QUALIFY g IS NOT NULL),
rbig AS (
  SELECT doc_id, t || ' ' || LEAD(t) OVER (PARTITION BY doc_id
                                           ORDER BY i) AS g
  FROM rpos QUALIFY g IS NOT NULL),
u1 AS (
  SELECT COALESCE(c.doc_id, r.doc_id) AS doc_id,
         CAST(SUM(COALESCE(c.n, 0)) AS BIGINT) AS nc,
         CAST(SUM(COALESCE(r.n, 0)) AS BIGINT) AS nr,
         CAST(SUM(LEAST(COALESCE(c.n, 0), COALESCE(r.n, 0))) AS BIGINT)
           AS clip
  FROM (SELECT doc_id, t, COUNT(*) AS n FROM cpos GROUP BY doc_id, t) c
  FULL JOIN (SELECT doc_id, t, COUNT(*) AS n
             FROM rpos GROUP BY doc_id, t) r
    ON c.doc_id = r.doc_id AND c.t = r.t
  GROUP BY COALESCE(c.doc_id, r.doc_id)),
u2 AS (
  SELECT COALESCE(c.doc_id, r.doc_id) AS doc_id,
         CAST(SUM(COALESCE(c.n, 0)) AS BIGINT) AS nc,
         CAST(SUM(COALESCE(r.n, 0)) AS BIGINT) AS nr,
         CAST(SUM(LEAST(COALESCE(c.n, 0), COALESCE(r.n, 0))) AS BIGINT)
           AS clip
  FROM (SELECT doc_id, g, COUNT(*) AS n FROM cbig GROUP BY doc_id, g) c
  FULL JOIN (SELECT doc_id, g, COUNT(*) AS n
             FROM rbig GROUP BY doc_id, g) r
    ON c.doc_id = r.doc_id AND c.g = r.g
  GROUP BY COALESCE(c.doc_id, r.doc_id))
"""


def _ngram_tables(spark: SparkSession, sf_dir: str):
    """(u1, u2): per-doc candidate/reference/clipped counts for
    unigrams and bigrams of the shift pair. Token arrays are SLICED
    before any explode (40 elements max per side regardless of
    document length), so the n-gram fan-out is O(docs · 40) — corpus
    length, not corpus volume."""
    docs = load_table(spark, sf_dir, "documents")
    ts = F.filter(F.split("text", " "), lambda x: x != "")
    pairs = docs.select(
        "doc_id",
        F.slice(ts, 2, 40).alias("cand"),
        F.slice(ts, 1, 40).alias("ref"))

    def side(col: str):
        pos = pairs.select("doc_id",
                           F.posexplode(col).alias("i", "t"))
        wd = W.partitionBy("doc_id").orderBy("i")
        big = (pos.select("doc_id",
                          F.concat_ws(" ", "t", F.lead("t").over(wd))
                          .alias("g"),
                          F.lead("t").over(wd).alias("nxt"))
                  .filter(F.col("nxt").isNotNull()).drop("nxt"))
        return (pos.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("n")),
                big.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("n")))

    c1, c2 = side("cand")
    r1, r2 = side("ref")

    def clipped(c: DataFrame, r: DataFrame, key: str):
        j = c.withColumnRenamed("n", "cn").join(
            r.withColumnRenamed("n", "rn"), ["doc_id", key], "full")
        cn = F.coalesce("cn", F.lit(0))
        rn = F.coalesce("rn", F.lit(0))
        return j.groupBy("doc_id").agg(
            F.sum(cn).cast("long").alias("nc"),
            F.sum(rn).cast("long").alias("nr"),
            F.sum(F.least(cn, rn)).cast("long").alias("clip"))

    return clipped(c1, r1, "t"), clipped(c2, r2, "g")


# ---------------------------------------------------------------------------
# Corpus BLEU-2
# ---------------------------------------------------------------------------

@query("text_bleu_corpus", oracle=f"""
WITH {_TOK_SQL.strip()},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(u1.nc) AS BIGINT) AS c_len,
         CAST(SUM(u1.nr) AS BIGINT) AS r_len,
         CAST(SUM(u1.clip) AS DOUBLE) / SUM(u1.nc) AS p1,
         CAST(SUM(u2.clip) AS DOUBLE) / SUM(u2.nc) AS p2
  FROM u1 JOIN u2 USING (doc_id))
SELECT n_docs, c_len, r_len,
       {r6_sql('p1')} AS p1, {r6_sql('p2')} AS p2,
       {r6_sql('CASE WHEN c_len >= r_len THEN 1.0 '
               'ELSE EXP(1.0 - CAST(r_len AS DOUBLE) / c_len) END')} AS bp,
       {r6_sql('CASE WHEN p1 > 0 AND p2 > 0 THEN '
               '(CASE WHEN c_len >= r_len THEN 1.0 '
               ' ELSE EXP(1.0 - CAST(r_len AS DOUBLE) / c_len) END)'
               ' * EXP(0.5 * (LN(p1) + LN(p2))) ELSE 0.0 END')} AS bleu2
FROM agg
""")
def text_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS BLEU-2 [PK — Papineni et al. 2002]: modified (clipped)
    unigram and bigram precision pooled over the corpus, times the
    brevity penalty exp(1 − r/c) for c < r — the generation-eval
    metric every fine-tuning pipeline reports. Clipping is the
    per-doc FULL join of candidate and reference n-gram counts
    (min(count_c, count_r)); pooling sums numerators and denominators
    BEFORE dividing (corpus BLEU, not averaged sentence BLEU). The
    shift-pair construction (module docstring) makes the candidate one
    token shorter than the reference whenever the document is shorter
    than the slice window, so BP < 1 is actually exercised. exp/ln
    are the only libm calls and sit directly under r6 (1-ulp
    cross-engine drift, 10 orders below the rounding quantum).
    Scale: O(docs · 40) n-gram rows, two hash aggregates, one 1-row
    result."""
    u1, u2 = _ngram_tables(spark, sf_dir)
    agg = (u1.join(u2.select(F.col("doc_id"),
                             F.col("nc").alias("nc2"),
                             F.col("clip").alias("clip2")), "doc_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.sum("nc").cast("long").alias("c_len"),
                  F.sum("nr").cast("long").alias("r_len"),
                  (F.sum("clip").cast("double")
                   / F.sum("nc")).alias("p1"),
                  (F.sum("clip2").cast("double")
                   / F.sum("nc2")).alias("p2")))
    bp = F.when(F.col("c_len") >= F.col("r_len"), F.lit(1.0)).otherwise(
        F.exp(1.0 - F.col("r_len").cast("double") / F.col("c_len")))
    bleu = F.when((F.col("p1") > 0) & (F.col("p2") > 0),
                  bp * F.exp(0.5 * (F.log("p1") + F.log("p2")))
                  ).otherwise(F.lit(0.0))
    return agg.select("n_docs", "c_len", "r_len",
                      r6(F.col("p1")).alias("p1"),
                      r6(F.col("p2")).alias("p2"),
                      r6(bp).alias("bp"),
                      r6(bleu).alias("bleu2"))


# ---------------------------------------------------------------------------
# ROUGE-2 recall per source
# ---------------------------------------------------------------------------

@query("text_rouge2_by_source", oracle=f"""
WITH {_TOK_SQL.strip()},
per_doc AS (
  SELECT d.source, u2.doc_id,
         CASE WHEN u2.nr > 0
              THEN CAST(u2.clip AS DOUBLE) / u2.nr END AS rec
  FROM u2 JOIN documents d ON d.doc_id = u2.doc_id)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(rec) AS BIGINT) AS n_scored,
       {r6_sql(safe_div_sql(dsum_sql('rec'), 'COUNT(rec)'))} AS rouge2_recall
FROM per_doc GROUP BY source
""")
def text_rouge2_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 RECALL by corpus source [PK — Lin 2004]: clipped bigram
    matches / reference bigram count per document (the
    summarization-eval recall twin of BLEU's precision), averaged
    within each source — the per-slice quality dashboard a data
    pipeline wants (which source's generations degrade?). Documents
    whose reference has NO bigram (0- or 1-token texts — the nulls
    fixture plants whitespace-only docs) score NULL and are counted
    separately (n_scored) rather than polluting the mean; the mean
    runs through the DECIMAL(38,12) sum. Scale: reuses the
    O(docs · 40) bigram tables; one join to the doc dimension for
    source, one aggregate."""
    _, u2 = _ngram_tables(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rec = F.when(F.col("nr") > 0,
                 F.col("clip").cast("double") / F.col("nr"))
    per_doc = u2.join(docs, "doc_id").select("source", rec.alias("rec"))
    return (per_doc.groupBy("source")
                   .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                        F.count("rec").cast("long").alias("n_scored"),
                        r6(safe_div(dsum("rec"),
                                    F.count("rec").cast("double")))
                        .alias("rouge2_recall")))


# ---------------------------------------------------------------------------
# Matrix-profile discords
# ---------------------------------------------------------------------------

_MP_M = 7          # subsequence length (days)
_MP_EXCL = 4       # exclusion zone: |s - t| >= ceil(m/2)


@query("ts_matrix_profile_discord", oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         {dsum_sql('value')} / COUNT(value) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)),
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily),
elems AS (
  SELECT event_type, i - k AS s, k, v
  FROM idx, unnest(generate_series(0, {_MP_M - 1})) AS u(k)
  WHERE i - k >= 1 AND i - k <= n - {_MP_M - 1}),
wstats AS (
  SELECT event_type, s, {dsum_sql('v')} AS sv, {dsum_sql('v * v')} AS qv
  FROM elems GROUP BY event_type, s),
sigma AS (
  SELECT event_type, s, sv / {_MP_M}.0 AS mu,
         SQRT(GREATEST(qv / {_MP_M}.0 - (sv / {_MP_M}.0)
                       * (sv / {_MP_M}.0), 0.0)) AS sd
  FROM wstats),
dots AS (
  SELECT a.event_type, a.s AS sa, b.s AS sb,
         {dsum_sql('a.v * b.v')} AS dot
  FROM elems a JOIN elems b
    ON a.event_type = b.event_type AND a.k = b.k AND a.s < b.s
  WHERE b.s - a.s >= {_MP_EXCL}
  GROUP BY a.event_type, a.s, b.s),
dists AS (
  SELECT d.event_type, d.sa, d.sb,
         SQRT(GREATEST(2.0 * {_MP_M} * (1.0 - {safe_div_sql(
             f'd.dot / {_MP_M}.0 - x.mu * y.mu', 'x.sd * y.sd')}),
             0.0)) AS dist
  FROM dots d
  JOIN sigma x ON x.event_type = d.event_type AND x.s = d.sa
  JOIN sigma y ON y.event_type = d.event_type AND y.s = d.sb
  WHERE x.sd > 0 AND y.sd > 0),
prof AS (
  SELECT event_type, s, {r6_sql('MIN(dist)')} AS profile
  FROM (SELECT event_type, sa AS s, dist FROM dists
        UNION ALL
        SELECT event_type, sb AS s, dist FROM dists)
  GROUP BY event_type, s)
SELECT event_type, CAST(s AS BIGINT) AS win_start, profile
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY profile DESC, event_type,
                                   s) AS r
      FROM prof)
WHERE r <= 10
""")
def ts_matrix_profile_discord(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """MATRIX-PROFILE DISCORD DISCOVERY [PK — Yeh, Keogh et al. 2016]:
    per event type, the daily-mean series' matrix profile (for each
    length-{m} window, the z-normalized Euclidean distance to its
    NEAREST non-trivial neighbor, exclusion zone |s−t| ≥ {e}) — the
    windows with the LARGEST profile are discords, the series'
    strongest anomalies; emits the corpus top-10. dist² = 2m(1−ρ)
    converts the pairwise dot product into the z-normed distance, so
    the whole computation is three hash aggregates (window sums,
    pairwise dots keyed on the element offset, min-profile) — no
    Python kernel. Degenerate flat windows (σ = 0) are excluded on
    both engines; ρ→1 cancellation is clamped at 0 under the sqrt;
    the top-10 ranks on the ROUNDED profile with (type, start)
    tie-break. Scale: the O(n²/2) pair space is per SERIES where n =
    DAYS (the daily rollup collapses raw volume first) — at 100 TB n
    grows with calendar time, not event count; beyond ~10⁴ windows
    per series the published STOMP ordering is the upgrade path, a
    kernel swap inside the same plan shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
               .groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("d"))
               .agg((dsum("value") / F.count("value")).alias("v")))
    wt = W.partitionBy("event_type")
    idx = daily.select(
        "event_type", "v",
        F.row_number().over(wt.orderBy("d")).alias("i"),
        F.count(F.lit(1)).over(wt).alias("n"))
    m = _MP_M
    elems = (idx.select("event_type", "v", "i", "n",
                        F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
                        .alias("k"))
                .withColumn("s", F.col("i") - F.col("k"))
                .filter((F.col("s") >= 1) & (F.col("s") <= F.col("n")
                                             - (m - 1)))
                .select("event_type", "s", "k", "v"))
    wstats = elems.groupBy("event_type", "s").agg(
        dsum("v").alias("sv"), dsum(F.col("v") * F.col("v")).alias("qv"))
    mu = F.col("sv") / float(m)
    sigma = wstats.select(
        "event_type", "s", mu.alias("mu"),
        F.sqrt(F.greatest(F.col("qv") / float(m) - mu * mu,
                          F.lit(0.0))).alias("sd"))
    b = elems.select(F.col("event_type").alias("et2"),
                     F.col("s").alias("sb"), F.col("k").alias("k2"),
                     F.col("v").alias("vb"))
    dots = (elems.join(b, (elems.event_type == b.et2)
                       & (elems.k == b.k2) & (elems.s < b.sb))
                 .filter(F.col("sb") - F.col("s") >= _MP_EXCL)
                 .groupBy("event_type", F.col("s").alias("sa"), "sb")
                 .agg(dsum(F.col("v") * F.col("vb")).alias("dot")))
    x = sigma.select(F.col("event_type").alias("etx"),
                     F.col("s").alias("sx"), F.col("mu").alias("mux"),
                     F.col("sd").alias("sdx"))
    y = sigma.select(F.col("event_type").alias("ety"),
                     F.col("s").alias("sy"), F.col("mu").alias("muy"),
                     F.col("sd").alias("sdy"))
    rho = safe_div(F.col("dot") / float(m) - F.col("mux") * F.col("muy"),
                   F.col("sdx") * F.col("sdy"))
    dists = (dots.join(x, (dots.event_type == x.etx) & (dots.sa == x.sx))
                 .join(y, (dots.event_type == y.ety) & (dots.sb == y.sy))
                 .filter((F.col("sdx") > 0) & (F.col("sdy") > 0))
                 .select("event_type", "sa", "sb",
                         F.sqrt(F.greatest(
                             2.0 * m * (1.0 - rho),
                             F.lit(0.0))).alias("dist")))
    both = dists.select("event_type", F.col("sa").alias("s"), "dist") \
                .unionAll(dists.select("event_type",
                                       F.col("sb").alias("s"), "dist"))
    prof = both.groupBy("event_type", "s").agg(
        r6(F.min("dist")).alias("profile"))
    wr = W.orderBy(F.desc("profile"), "event_type", "s")
    return (prof.withColumn("r", F.row_number().over(wr))
                .filter(F.col("r") <= 10).drop("r")
                .select("event_type", F.col("s").cast("long")
                        .alias("win_start"), "profile"))


ts_matrix_profile_discord.__doc__ = (
    ts_matrix_profile_discord.__doc__
    .replace("{m}", str(_MP_M)).replace("{e}", str(_MP_EXCL)))
