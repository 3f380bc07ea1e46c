"""Round-11 operator batch O (SURVEY.md §2 growth): corpus
language-model statistics — interpolated Kneser-Ney bigram estimates,
tokenizer-fertility audit, bigram cross-entropy quality scoring, and
the Chao1 unseen-vocabulary estimator.

Provenance ([PK], empty reference checkout — SURVEY §0): Kneser &
Ney 1995 (absolute discounting with continuation counts; Chen &
Goodman 1998's interpolated form, d = 0.75); tokenizer fertility as
in the SentencePiece / multilingual-LM literature (pieces per word);
CCNet-style LM quality scoring (Wenzek et al. 2020) with add-α
smoothing; Chao 1984 (Chao1 richness), Good 1953 (Good-Turing unseen
mass).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

_TOKS_SQL = """
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\r\n]+'),
                     x -> x <> '') AS toks
  FROM documents),
big AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks,
               UNNEST(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2))
"""


def _toks(col) -> Column:
    """Whitespace tokens, empty-safe (q_extras._tokens idiom: the
    explicit [ \\t\\r\\n]+ class sidesteps Java-vs-RE2 \\s drift)."""
    return F.filter(F.split(col, r"[ \t\r\n]+"),
                    lambda t: t != F.lit(""))


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) bigram instances from whitespace tokens."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", _toks(F.col("text")).alias("toks"))
    n = F.size("toks")
    pairs = F.arrays_zip(F.slice("toks", 1, n - 1),
                         F.slice("toks", 2, n - 1))
    return (t.filter(n >= 2)
             .select("doc_id", F.explode(pairs).alias("bg"))
             .select("doc_id", F.col("bg").getField("0").alias("w1"),
                     F.col("bg").getField("1").alias("w2")))


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram estimates
# ---------------------------------------------------------------------------

_KN_D = 0.75
_KN_TOP = 20

_KN_SQL = f"""
WITH {_TOKS_SQL.strip()},
c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM big GROUP BY w1, w2),
c1 AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
         CAST(COUNT(*) AS BIGINT) AS n1w
  FROM c12 GROUP BY w1),
cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1c
  FROM c12 GROUP BY w2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbig FROM c12),
scored AS (
  SELECT c12.w1, c12.w2, c12.c, c1.cw1, c1.n1w, cont.n1c, tot.nbig,
         GREATEST(CAST(c12.c AS DOUBLE) - {_KN_D!r}, 0.0) / c1.cw1
           + CAST({_KN_D!r} AS DOUBLE) * c1.n1w / c1.cw1
             * (CAST(cont.n1c AS DOUBLE) / tot.nbig) AS p_kn
  FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2), tot)
SELECT w1, w2, c AS count, cw1 AS c_w1,
       n1c AS n_cont, {r6_sql('p_kn')} AS p_kn
FROM scored
ORDER BY c DESC, w1, w2 LIMIT {_KN_TOP}
"""


@query("vocab_kneser_ney_bigram", oracle=_KN_SQL)
def vocab_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED KNESER-NEY BIGRAM ESTIMATES [PK — Kneser & Ney
    1995; Chen & Goodman 1998's interpolated form, absolute discount
    d = 0.75]: P_KN(w₂|w₁) = max(c−d,0)/c(w₁) + d·N₁₊(w₁·)/c(w₁) ·
    N₁₊(·w₂)/N₁₊(··) — the defining idea is the CONTINUATION count
    (how many distinct left-contexts a word follows), which fixes the
    'San Francisco problem' a raw-frequency backoff has; still the
    strongest count-based n-gram smoother and the baseline every
    neural-LM data paper quotes.  All counts are exact BIGINTs from
    two hash aggregates over the corpus bigram table; the estimate is
    identical double algebra.  Emits the top-{_KN_TOP} bigrams under
    a total (count, w1, w2) order with their components.  Scale: the
    bigram explode is linear in corpus tokens; everything after the
    first aggregate is vocabulary-bounded."""
    big = _bigrams(spark, sf_dir)
    c12 = (big.groupBy("w1", "w2")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    c12 = c12.cache()
    c1 = c12.groupBy("w1").agg(
        F.sum("c").cast("long").alias("cw1"),
        F.count(F.lit(1)).cast("long").alias("n1w"))
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1c"))
    tot = c12.agg(F.count(F.lit(1)).cast("long").alias("nbig"))
    p_kn = (F.greatest(F.col("c") - _KN_D, F.lit(0.0)) / F.col("cw1")
            + _KN_D * F.col("n1w") / F.col("cw1")
            * (F.col("n1c").cast("double") / F.col("nbig")))
    return (c12.join(c1, "w1").join(cont, "w2")
               .crossJoin(F.broadcast(tot))
               .select("w1", "w2", F.col("c").alias("count"),
                       F.col("cw1").alias("c_w1"),
                       F.col("n1c").alias("n_cont"),
                       r6(p_kn).alias("p_kn"))
               .orderBy(F.desc("count"), "w1", "w2")
               .limit(_KN_TOP))


# ---------------------------------------------------------------------------
# Tokenizer fertility audit
# ---------------------------------------------------------------------------

_FERT_SQL = r"""
WITH d AS (
  SELECT lang,
         CAST(len(list_filter(regexp_split_to_array(
             text, '[ \t\r\n]+'), x -> x <> '')) AS BIGINT) AS words,
         CAST(len(regexp_extract_all(
             text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS pieces,
         n_chars
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(pieces) AS BIGINT) AS pieces,
       ROUND(CAST(SUM(pieces) AS DOUBLE) / SUM(words), 6) + 0.0
         AS fertility,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(pieces), 6) + 0.0
         AS chars_per_piece
FROM d GROUP BY lang ORDER BY lang
"""


@query("data_tokenizer_fertility", oracle=_FERT_SQL)
def data_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY AUDIT [PK — the pieces-per-word statistic
    of the SentencePiece / multilingual-LM literature]: per language,
    how many BPE-style pre-tokenizer pieces (letter runs / digit runs
    / punctuation runs — the GPT-2 pre-tokenizer shape, text_token_
    count precedent) does one whitespace word cost, and how many
    characters does a piece carry?  High fertility on a language =
    the tokenizer fragments it = that language pays more compute per
    word and trains worse — THE first audit a multilingual data team
    runs when allocating a token budget (data_token_budget_allocate's
    upstream diagnostic).  Pure regex counting in codegen, exact
    integer sums, two ratio columns rounded 6 dp.  Scale: one scan,
    one language-bounded aggregate."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(_toks(F.col("text"))).cast("long")
    pieces = F.size(F.regexp_extract_all(
        "text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0)).cast("long")
    return (d.select("lang", words.alias("words"),
                     pieces.alias("pieces"), "n_chars")
             .groupBy("lang")
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.sum("words").cast("long").alias("words"),
                  F.sum("pieces").cast("long").alias("pieces"),
                  r6(F.sum("pieces").cast("double") / F.sum("words"))
                   .alias("fertility"),
                  r6(F.sum("n_chars").cast("double") / F.sum("pieces"))
                   .alias("chars_per_piece"))
             .orderBy("lang"))


# ---------------------------------------------------------------------------
# Bigram cross-entropy quality score
# ---------------------------------------------------------------------------

_XE_ALPHA = 0.5

_XE_SQL = f"""
WITH {_TOKS_SQL.strip()},
c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM big GROUP BY w1, w2),
c1 AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1 FROM c12 GROUP BY w1),
vv AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT w1 AS w FROM big UNION ALL SELECT w2 FROM big)),
inst AS (
  SELECT big.doc_id,
         ROUND(LN((CAST(c12.c AS DOUBLE) + {_XE_ALPHA!r})
                  / (CAST(c1.cw1 AS DOUBLE)
                     + CAST({_XE_ALPHA!r} AS DOUBLE) * vv.v)), 9) AS lp
  FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), vv)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       {r6_sql(f"-{dsum_sql('lp')} / COUNT(*)")} AS cross_entropy
FROM inst GROUP BY doc_id ORDER BY doc_id
"""


@query("text_bigram_cross_entropy", oracle=_XE_SQL)
def text_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM CROSS-ENTROPY QUALITY SCORE [PK — the CCNet recipe
    (Wenzek et al. 2020): score each document by a language model
    trained on the corpus itself; here an add-α bigram model, α=0.5
    over the observed vocabulary]: H(doc) = −mean ln p(w₂|w₁) with
    p = (c(w₁w₂)+α)/(c(w₁)+α·V) — low-entropy docs are fluent/
    templated, high-entropy docs are noise — the bigram-conditioned
    refinement of text_unigram_logprob (which cannot see word order)
    and the standard partner of text_gopher_quality's rule-based
    gates.  Counts are exact; each ln is pinned to 9 dp
    (q_round6d discipline) before the DECIMAL per-doc mean.  Scale:
    one bigram explode + two vocabulary-bounded aggregates; the
    instance-to-counts join shuffles on the bigram key."""
    big = _bigrams(spark, sf_dir)
    big = big.cache()
    c12 = (big.groupBy("w1", "w2")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    c1 = c12.groupBy("w1").agg(F.sum("c").cast("long").alias("cw1"))
    vv = (big.select(F.col("w1").alias("w"))
             .unionAll(big.select("w2"))
             .agg(F.countDistinct("w").cast("long").alias("v")))
    lp = F.round(F.log((F.col("c") + _XE_ALPHA)
                       / (F.col("cw1") + _XE_ALPHA * F.col("v"))), 9)
    inst = (big.join(c12, ["w1", "w2"]).join(c1, "w1")
               .crossJoin(F.broadcast(vv))
               .select("doc_id", lp.alias("lp")))
    return (inst.groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                     r6(-dsum("lp") / F.count(F.lit(1)))
                      .alias("cross_entropy"))
                .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# Chao1 unseen-vocabulary estimate
# ---------------------------------------------------------------------------

_CHAO_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\r\n]+'),
                     x -> x <> '') AS toks
  FROM documents),
w AS (SELECT UNNEST(toks) AS w FROM t),
tf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
ff AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM tf)
SELECT n_tokens, n_types, f1, f2,
       CASE WHEN f2 > 0 THEN
         ROUND(n_types + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2), 6) + 0.0
       END AS chao1,
       ROUND(n_types + CAST(f1 AS DOUBLE) * (f1 - 1)
             / (2.0 * (f2 + 1)), 6) + 0.0 AS chao1_bc,
       ROUND(CAST(f1 AS DOUBLE) / n_tokens, 6) + 0.0
         AS gt_unseen_mass
FROM ff
"""


@query("vocab_chao1_unseen", oracle=_CHAO_SQL)
def vocab_chao1_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAO1 UNSEEN-VOCABULARY ESTIMATE [PK — Chao 1984; Good 1953]:
    from the frequency-of-frequencies alone, estimate how many word
    TYPES the corpus has not yet shown — Chao1 = D + f₁²/2f₂ (NULL when f₂=0 — the classic form is
    undefined there; and the
    bias-corrected D + f₁(f₁−1)/(2(f₂+1))) — plus the Good-Turing
    unseen-probability mass f₁/n: 'how much more vocabulary does
    scraping more of this source buy?', the coverage-planning
    companion to vocab_coverage_curve (which measures seen coverage)
    and vocab_zipf_slope (the tail shape).  Exact integer counts from
    two hash aggregates; three ratio columns rounded 6 dp with the
    signed-zero guard.  Scale: token explode then vocabulary-bounded
    aggregates, all map-side combinable."""
    d = load_table(spark, sf_dir, "documents")
    w = (d.select(F.explode(_toks(F.col("text"))).alias("w")))
    tf = w.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ff = tf.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
         .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long")
         .alias("f2"))
    f1d = F.col("f1").cast("double")
    return ff.select(
        "n_tokens", "n_types", "f1", "f2",
        F.when(F.col("f2") > 0,
               r6(F.col("n_types") + f1d * F.col("f1")
                  / (2.0 * F.col("f2")))).alias("chao1"),
        r6(F.col("n_types") + f1d * (F.col("f1") - 1)
           / (2.0 * (F.col("f2") + 1))).alias("chao1_bc"),
        r6(f1d / F.col("n_tokens")).alias("gt_unseen_mass"))
