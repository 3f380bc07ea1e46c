"""LLM-data-pipeline operators (SURVEY.md §2.11): deduplication,
similarity search, text analysis, multimodal columns — the mandated
extensions beyond the reference's own surface, over the `documents`
and `embeddings` fixtures.

Oracle notes:
- Cosine math is bit-identical to DuckDB because both engines cast
  float32→double *inside* the product lambda and fold left-to-right
  (F.zip_with/aggregate ↔ list_zip/list_transform/list_reduce) — same
  trick the §2.8 `array_higher_order` query established.
- MinHash/LSH use Spark's xxhash64, which DuckDB does not implement.
  Since round 9 their registered queries are PLANTED-TWIN EVALS with
  full SQL oracles (identical-input identity theorems make the caught/
  top-1 outcome deterministic — see _twin_aug below); approximate-
  regime quality stays pinned by the planted-duplicate unit tests
  (tests/test_llm_ops.py) and dedup_lsh_recall_eval's md5 sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql
from ..operators import graph, similarity, textops
from .registry import query


def _dot_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(list_zip({a}, {b}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
            f"(x, y) -> x + y)")


# ---------------------------------------------------------------- dedup

@query("dedup_exact", oracle="""
SELECT doc_id, sha256(lower(trim(text))) AS text_sha, lang, n_chars
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) = 1
""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: sha256 of normalized text, lowest doc_id survives.
    Shuffle key is the 64-hex digest — uniform by construction, no
    skew at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.exact_dedup_keys(docs).select(
        "doc_id", "text_sha", "lang", "n_chars")


# Planted-twin eval rig shared by the three xxhash64 dedup ids and the
# two ANN ids (VERDICT r8 ask 2 — upgrade the rows-only five to
# oracle-checkable evals, dedup_lsh_recall_eval precedent): a
# deterministic 10% sample of the corpus gets an EXACT twin (identical
# text / identical embedding) at id + _TWIN_OFFSET, injected on the
# SPARK SIDE ONLY — the oracle recomputes the expected outcome in SQL
# from the identity theorems (identical shingle set ⇒ identical MinHash
# signature ⇒ every band collides; identical token multiset ⇒ identical
# SimHash ⇒ hamming 0; identical vector ⇒ same buckets/centroid and
# strictly-maximal cosine). The production xxhash64/LSH kernels are
# untouched; band-quality at j < 1 stays measured by
# dedup_lsh_recall_eval (md5 sketch) and the planted-dup unit tests.
_TWIN_OFFSET = 1_000_000_000


def _twin_aug(docs: DataFrame):
    """(plant, aug): the deterministic planted sample (doc_id % 10 = 0,
    non-null text — scale-free modulus, identical filter in every
    oracle) and the corpus augmented with its exact twins."""
    plant = docs.filter((F.col("doc_id") % 10 == 0)
                        & F.col("text").isNotNull())
    twins = plant.select(
        (F.col("doc_id") + _TWIN_OFFSET).alias("doc_id"), "text")
    aug = docs.select("doc_id", "text").unionByName(twins)
    return plant.select("doc_id", "text"), aug


@query("dedup_fuzzy_minhash", oracle="""
WITH plant AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE doc_id % 10 = 0 AND text IS NOT NULL),
sh AS (
  SELECT doc_id,
         COUNT(DISTINCT
               array_to_string(ts[CAST(i AS INT):CAST(i + 2 AS INT)], ' '))
           AS n_sh
  FROM plant, LATERAL (
    SELECT unnest(generate_series(1, GREATEST(1, len(ts) - 2))) AS i) g
  GROUP BY doc_id)
-- the planted pair's exact Jaccard, recomputed: twin text is identical,
-- so intersection = union = n_sh and j = n_sh/n_sh = 1.0 >= 0.3
SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
       (CAST(n_sh AS DOUBLE) / CAST(n_sh AS DOUBLE)) >= 0.3 AS caught,
       CAST(n_sh AS DOUBLE) / CAST(n_sh AS DOUBLE) AS pair_jaccard
FROM sh ORDER BY doc_id
""")
def dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup MinHash-LSH pipeline (3-token shingles → 16-hash
    MinHash → 8×2 LSH bands → bucket equi-join → exact-Jaccard verify
    ≥ 0.3), driven end-to-end by a PLANTED-TWIN EVAL with a full SQL
    oracle: each sampled doc gains an exact twin, and the op emits per
    planted doc its shingle-set size plus whether the production
    pipeline caught the (doc, twin) pair and at what verified Jaccard.
    Identical shingle sets have identical MinHash signatures under ANY
    hash family, so every band collides and `caught` is TRUE with
    probability exactly 1 — the oracle recomputes it in SQL as
    j = n/n = 1.0 ≥ 0.3, and n_sh/pair_jaccard are genuine cross-engine
    recomputations (distinct-shingle count; intersection/union ratio).
    A break anywhere in shingling, signatures, banding, the bucket
    self-join, or the verify join flips `caught`/NULLs `pair_jaccard`
    and the driver hash goes red. Quality at j < 1 (the S-curve
    shoulder) is measured by dedup_lsh_recall_eval's md5 sketch, which
    both engines compute bit-identically.

    Plan notes (unchanged production shape): the doc_id repartition
    spreads the CPU-heavy shingling across cores and lets the signature
    groupBy and both verify joins reuse one distribution; the corpus is
    shingled exactly ONCE — the cached ``shingle_sets`` table feeds the
    signatures AND the verify (the diamond top)."""
    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    plant, aug = _twin_aug(docs)
    sets = textops.shingle_sets(aug).cache()
    sig = textops.minhash_from_sets(sets)
    pairs = textops.candidate_pairs(textops.lsh_bands(sig))
    ver = textops.jaccard_verify(pairs, aug, threshold=0.3, sets=sets)
    planted = (ver.filter(F.col("b") == F.col("a") + _TWIN_OFFSET)
                  .select(F.col("a").alias("doc_id"),
                          F.col("jaccard").alias("pair_jaccard")))
    n_sh = sets.select("doc_id", F.size("sh").cast("long").alias("n_sh"))
    return (plant.select("doc_id").join(n_sh, "doc_id")
                 .join(planted, "doc_id", "left")
                 .select("doc_id", "n_sh",
                         F.col("pair_jaccard").isNotNull().alias("caught"),
                         "pair_jaccard")
                 .orderBy("doc_id"))


# ---------------------------------------------------------- similarity

_KNN_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
     c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
     p AS (SELECT qid, cid,
                  {_dot_sql('qe', 'ce')} /
                  (SQRT({_dot_sql('qe', 'qe')}) * SQRT({_dot_sql('ce', 'ce')})) AS cos
           FROM q, c WHERE qid <> cid)
SELECT qid, cid, ROUND(cos, 6) AS cosine, rnk
FROM (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
      FROM p)
WHERE rnk <= 10
"""


@query("sim_knn_bruteforce", oracle=_KNN_ORACLE)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: broadcast the query
    side over one corpus scan; rank per query with a deterministic
    (cos desc, cid) tiebreak."""
    emb = load_table(spark, sf_dir, "embeddings")
    # .limit(5) = no-op bound (the key filter admits at most 5 ids at
    # ANY scale factor) that makes the broadcast query batch's
    # cardinality visible to tools/scan_broadcast_hints.py.
    return similarity.knn_bruteforce(
        emb.filter(F.col("vec_id") < 5).limit(5), emb, k=10)


# Planted-copy ANN eval oracle, shared by sim_lsh_ann and sim_ivf_ann
# (VERDICT r8 ask 2): queries are exact copies of a deterministic 10%
# corpus sample. The oracle recomputes top-1 by BRUTE FORCE in SQL —
# for an identical vector the true cosine is strictly maximal at the
# source (ties only between bit-identical corpus vectors, broken by
# cid on both engines), and both index structures retrieve the source
# with probability exactly 1 (same buckets in every LSH table; the
# query's nearest centroid IS the source's assigned centroid), so the
# approximate top-1 provably equals the exact top-1.
_ANN_EVAL_ORACLE = f"""
WITH q AS (SELECT vec_id + {_TWIN_OFFSET} AS qid, embedding AS qe
           FROM embeddings WHERE vec_id % 10 = 0),
     c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
     p AS (SELECT qid, cid,
                  {{dot_qc}} /
                  (SQRT({{dot_qq}}) * SQRT({{dot_cc}})) AS cos
           FROM q, c)
SELECT qid, cid AS top1_cid, ROUND(cos, 6) AS top1_cosine
FROM (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rnk
      FROM p)
WHERE rnk = 1 ORDER BY qid
""".format(dot_qc=_dot_sql("qe", "ce"), dot_qq=_dot_sql("qe", "qe"),
           dot_cc=_dot_sql("ce", "ce"))


def _planted_queries(emb: DataFrame) -> DataFrame:
    return (emb.filter(F.col("vec_id") % 10 == 0)
               .select((F.col("vec_id") + _TWIN_OFFSET).alias("vec_id"),
                       "embedding"))


@query("sim_lsh_ann", oracle=_ANN_EVAL_ORACLE)
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN via 8-table × 4-bit random-hyperplane LSH
    (seeded, Arrow-kernel projections) + exact cosine re-rank of
    bucket-mates, driven by the planted-copy eval: each query is an
    exact copy of a sampled corpus vector, so its buckets equal the
    source's in EVERY table — the source is always a candidate and the
    exact re-rank returns it at rank 1 with the strictly-maximal
    cosine. The oracle recomputes top-1 by brute force in SQL (same
    fold order, same (cos desc, cid) tiebreak), making the index's
    end-to-end retrieval path driver-hash-checkable; recall at
    cos < 1 stays pinned by tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (similarity.knn_lsh(_planted_queries(emb), emb, k=1)
            .select("qid", F.col("cid").alias("top1_cid"),
                    F.col("cosine").alias("top1_cosine"))
            .orderBy("qid"))


# -------------------------------------------------------- text analysis

@query("text_stats", oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
""")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats in one hash aggregate (token counts
    via size(split) — no explode needed)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(textops.tokens("text"))).alias("total_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6)
         .alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query("text_quality_filter", oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
     pt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
     st AS (SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   MAX(c) AS top_c,
                   CAST(SUM(len(tok) * c) AS BIGINT) AS sum_len
            FROM pt GROUP BY doc_id)
SELECT doc_id, n_tokens,
       ROUND(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
       ROUND(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_tok_ratio,
       (n_tokens BETWEEN 20 AND 1000
        AND CAST(sum_len AS DOUBLE) / n_tokens BETWEEN 2 AND 12
        AND CAST(top_c AS DOUBLE) / n_tokens <= 0.15) AS passes
FROM st
""")
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality heuristics (length band, mean token length,
    max-repetition ratio) as pure aggregates over an exploded token
    table; emits the flag rather than filtering so downstream choice
    stays lazy."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens("text")).alias("tok"))
    pt = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    st = pt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_c"),
        F.sum(F.length("tok") * F.col("c")).alias("sum_len"),
    )
    n = F.col("n_tokens")
    mean_len = F.col("sum_len").cast("double") / n
    top_ratio = F.col("top_c").cast("double") / n
    return st.select(
        "doc_id", "n_tokens",
        F.round(mean_len, 6).alias("mean_tok_len"),
        F.round(top_ratio, 6).alias("top_tok_ratio"),
        (n.between(20, 1000) & mean_len.between(2, 12)
         & (top_ratio <= 0.15)).alias("passes"),
    )


@query("tokenize_topk_terms", oracle="""
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
     tc AS (SELECT lang, term, COUNT(*) AS cnt FROM tok GROUP BY lang, term)
SELECT lang, term, cnt, rnk
FROM (SELECT lang, term, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rnk
      FROM tc)
WHERE rnk <= 10
""")
def tokenize_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 terms per language: explode → two-level agg → per-group
    top-k window (rank ties broken alphabetically)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(textops.tokens("text")).alias("term"))
    tc = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("lang").orderBy(F.desc("cnt"), F.col("term"))
    return (tc.withColumn("rnk", F.row_number().over(w))
              .filter(F.col("rnk") <= 10)
              .select("lang", "term", "cnt", "rnk"))


@query("text_tfidf_topk", oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok
       GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) + 1.0)
               / (CAST(df.df AS DOUBLE) + 1.0), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, tf, df, tfidf, rnk
FROM (SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 5
""")
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — the classic keyword/feature
    extraction pass: explode once, tf per (doc, term), df per term,
    broadcast the (small) df table back onto tf, rank per doc. The idf
    is the RATIONAL variant (N+1)/(df+1) — pure integer-derived double
    division, bit-identical across engines, where ln() would risk
    1-ulp libm drift on the 6-dp rounding boundary; ranks are immune
    either way (equal (tf, df) ⇒ equal score ⇒ alphabetical
    tiebreak). At 100 TB the df table is ~vocabulary-sized — broadcast
    when it fits, else it's one more equi-join on term. The corpus
    size N enters as a broadcast 1-row aggregate (same pattern as the
    BM25 corpus stats, q_extras.py) — NOT a driver-side d.count(),
    which would cost a second full corpus scan before the plan even
    runs."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(textops.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tfidf = F.round(F.col("tf").cast("double") * (F.col("n_docs") + 1.0)
                    / (F.col("df").cast("double") + 1.0), 6)
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (tf.join(F.broadcast(df), "term")
              .crossJoin(F.broadcast(n))
              .withColumn("tfidf", tfidf)
              .withColumn("rnk", F.row_number().over(w))
              .filter(F.col("rnk") <= 5)
              .select("doc_id", "term", "tf", "df", "tfidf", "rnk"))


@query("dedup_simhash", oracle="""
WITH plant AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
  WHERE doc_id % 10 = 0 AND text IS NOT NULL)
-- identical token multiset => identical per-bit sums => identical
-- 64-bit signature => xor = 0: hamming recomputes to 0, caught to
-- 0 <= 3 (the pigeonhole band guarantee needs no probability at d=0)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(0 AS BIGINT) <= 3 AS caught,
       CAST(0 AS BIGINT) AS hamming
FROM plant ORDER BY doc_id
""")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection via 64-bit SimHash + 4×16-bit band blocking +
    bit_count(xor) ≤ 3 verify (pigeonhole: hamming ≤ 3 ⇒ ≥1 band
    equal). Complements MinHash: SimHash is one 64-bit word per doc —
    the cheapest at-scale near-dup index. Driven by the planted-twin
    eval (VERDICT r8 ask 2): each sampled doc gains an exact twin; the
    op emits per planted doc its token count plus whether the
    production pipeline caught the (doc, twin) pair and the verified
    hamming distance. An identical token multiset yields identical
    per-bit ±1 sums, hence an identical signature, hence xor = 0 — so
    hamming is 0 and `caught` TRUE deterministically, which the oracle
    recomputes in SQL; any break in tokenization, the bit aggregate,
    the band bucketing, or the verify filter NULLs the row and the
    driver hash goes red. Quality at hamming > 0 stays pinned by the
    planted-perturbation unit tests (tests/test_llm_ops.py)."""
    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    plant, aug = _twin_aug(docs)
    sig = textops.simhash_signature(aug)
    pairs = textops.simhash_pairs(sig)
    planted = (pairs.filter(F.col("b") == F.col("a") + _TWIN_OFFSET)
                    .select(F.col("a").alias("doc_id"),
                            F.col("hamming").cast("long").alias("hamming")))
    return (plant.select(
                "doc_id",
                F.size(textops.tokens("text")).cast("long")
                 .alias("n_tokens"))
                 .join(planted, "doc_id", "left")
                 .select("doc_id", "n_tokens",
                         F.col("hamming").isNotNull().alias("caught"),
                         "hamming")
                 .orderBy("doc_id"))


_JACCARD_MAX_DF = 100  # stop-shingle cap: document frequency per (source, shingle)


@query("dedup_ngram_jaccard", oracle=f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(generate_series(1, greatest(1, len(ts) - 2)),
                i -> array_to_string(ts[i:i+2], ' '))) AS s
  FROM tok),
sh AS (
  SELECT doc_id, source, s FROM sh0
  QUALIFY COUNT(*) OVER (PARTITION BY source, s) <= {_JACCARD_MAX_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shj AS (
  SELECT doc_id, source, s FROM sh
  QUALIFY COUNT(*) OVER (PARTITION BY source, s) >= 2),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM shj x JOIN shj y ON x.source = y.source AND x.s = y.s
  WHERE x.doc_id < y.doc_id GROUP BY a, b)
SELECT a, b,
       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard dedup inside `source` blocks: explode
    distinct 3-gram shingles, equi-join on (source, shingle), count
    intersections, |A∪B| = |A|+|B|−|A∩B|. Blocking bounds the pair
    space (the classic scalable exact-dedup shape: block key must fit
    the skew budget); integer counts make the oracle bit-exact.

    Stop-shingle cap: shingles appearing in > _JACCARD_MAX_DF documents of one
    source (boilerplate) are dropped BEFORE the self-join — a hot
    shingle with document frequency f fans out into f² candidate rows,
    so an uncapped header line is the one input that can melt this plan
    at 100 TB. Sizes are computed on the capped shingle set, keeping
    Jaccard internally consistent; the oracle applies the identical
    cap. The hot list is tiny (boilerplate is rare) → broadcast
    anti-join, no extra shuffle on the big side."""
    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    sh = docs.select(
        "doc_id", "source",
        F.explode(F.array_distinct(
            textops.shingles(textops.tokens("text"), 3))).alias("s"),
    ).cache()
    dfreq = sh.groupBy("source", "s").agg(F.count(F.lit(1)).alias("df")).cache()
    hot = (dfreq.filter(F.col("df") > _JACCARD_MAX_DF).select("source", "s"))
    sh = sh.join(F.broadcast(hot), ["source", "s"], "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # df == 1 shingles cannot intersect anything: drop them from the
    # self-join input (typically the large majority of a real corpus),
    # but AFTER sizes — |A| still counts unique shingles, so Jaccard is
    # unchanged. Exactness preserved; the oracle mirrors the filter.
    joinable = (dfreq.filter((F.col("df") >= 2)
                             & (F.col("df") <= _JACCARD_MAX_DF))
                     .select("source", "s"))
    shj = sh.join(joinable, ["source", "s"], "left_semi")
    x = shj.select(F.col("doc_id").alias("a"), "source", "s")
    y = shj.select(F.col("doc_id").alias("b"), "source", "s")
    inter = (x.join(y, ["source", "s"]).filter(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i")))
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (inter.join(sa, "a").join(sb, "b")
                 .filter(jac >= 0.2)
                 .select("a", "b", F.round(jac, 6).alias("jaccard")))


_EMB_COS_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
p AS (SELECT x.vec_id AS a, y.vec_id AS b,
             {_dot_sql('x.embedding', 'y.embedding')} /
             (SQRT({_dot_sql('x.embedding', 'x.embedding')}) *
              SQRT({_dot_sql('y.embedding', 'y.embedding')})) AS cos
      FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id)
SELECT a, b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.4
"""


@query("dedup_embedding_cosine", oracle=_EMB_COS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact cosine ≥ 0.4 inside `label`
    blocks (blocking keeps the pair space linear-ish; unblocked
    all-pairs is the LSH path's job). Same bit-exact zip-fold math as
    the kNN oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per vector (same double as the oracle's per-pair
    # sqrt(dot(x,x)) — see lsh_near_dup_pairs), one fold per pair
    x = emb.select(F.col("vec_id").alias("a"), "label",
                   F.col("embedding").alias("ea"),
                   similarity.l2_norm("embedding").alias("na"))
    y = emb.select(F.col("vec_id").alias("b"), "label",
                   F.col("embedding").alias("eb"),
                   similarity.l2_norm("embedding").alias("nb"))
    cos = similarity.dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (x.join(y, "label").filter(F.col("a") < F.col("b"))
             .withColumn("cosine", cos)
             .filter(F.col("cosine") >= 0.4)
             .select("a", "b", F.round("cosine", 6).alias("cosine")))


def _lsh_bucket_sql(planes, t: int, bits: int) -> str:
    """DuckDB twin of similarity.lsh_buckets for one hash table:
    Σⱼ 2ʲ·[dot(embedding, planeⱼ) > 0] with the plane baked in as a
    double-literal array. ``repr(float)`` round-trips exactly, so both
    engines see bit-identical plane constants, and both fold the dot
    left-to-right — the sign (hence the bucket) matches exactly."""
    terms = []
    for j in range(bits):
        lit = "[" + ", ".join(repr(float(v)) for v in planes[t, j]) + "]"
        terms.append(f"(CASE WHEN {_dot_sql('embedding', lit)} > 0 "
                     f"THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


_LSH_PLANES = similarity._hyperplanes(
    similarity.NEARDUP_TABLES, similarity.NEARDUP_BITS)
_EMB_LSH_ORACLE = f"""
WITH bk0 AS (
  {' UNION ALL '.join(
      f"SELECT vec_id, {t} AS tbl, "
      f"{_lsh_bucket_sql(_LSH_PLANES, t, similarity.NEARDUP_BITS)} AS bucket "
      f"FROM embeddings"
      for t in range(similarity.NEARDUP_TABLES))}
),
bk AS (SELECT * FROM bk0
       QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= 1000),
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         FROM bk x JOIN bk y
           ON x.tbl = y.tbl AND x.bucket = y.bucket
          AND x.vec_id < y.vec_id),
p AS (SELECT cand.a, cand.b,
             {_dot_sql('x.embedding', 'y.embedding')} /
             (SQRT({_dot_sql('x.embedding', 'x.embedding')}) *
              SQRT({_dot_sql('y.embedding', 'y.embedding')})) AS cos
      FROM cand
      JOIN embeddings x ON cand.a = x.vec_id
      JOIN embeddings y ON cand.b = y.vec_id)
SELECT a, b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.4
"""


@query("dedup_embedding_lsh", oracle=_EMB_LSH_ORACLE)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs WITHOUT a blocking key — the scale path
    (`dedup_embedding_cosine` needs a `label` block; real corpora have
    none): 4 tables × 8-bit random-hyperplane buckets, self-join on
    (table, bucket) with a 1000-vector bucket cap, exact-cosine verify
    ≥ 0.4. Fully oracle-checked: the seeded hyperplanes are a
    broadcast plane table on the Spark side and literal arrays in the
    DuckDB SQL — same floats from the same seed, same left-to-right
    fold, so both engines build identical buckets, identical
    candidates, identical cosines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (similarity.lsh_near_dup_pairs(emb, threshold=0.4)
                      .orderBy("a", "b"))


_CC_ORACLE = f"""
WITH RECURSIVE
e AS (SELECT a, b FROM ({_EMB_COS_ORACLE.replace('ROUND(cos, 6) AS cosine', 'cos')})),
sym AS (SELECT a AS n, b AS m FROM e UNION SELECT b, a FROM e),
reach(n, m) AS (
    SELECT n, n FROM (SELECT DISTINCT n FROM sym)
    UNION
    SELECT r.n, s.m FROM reach r JOIN sym s ON r.m = s.n),
lbl AS (SELECT n AS vec_id, MIN(m) AS cluster_id FROM reach GROUP BY n)
SELECT vec_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       (vec_id = cluster_id) AS is_canonical
FROM lbl ORDER BY vec_id
"""


def _cluster_report(cc: DataFrame) -> DataFrame:
    w = W.partitionBy("cluster_id")
    return (cc.select(F.col("n").alias("vec_id"), "cluster_id")
              .withColumn("cluster_size", F.count(F.lit(1)).over(w))
              .withColumn("is_canonical",
                          F.col("vec_id") == F.col("cluster_id"))
              .orderBy("vec_id"))


@query("dedup_cluster_cc_star", oracle=_CC_ORACLE)
def dedup_cluster_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster assignment as dedup_cluster_cc but via
    LARGE-STAR/SMALL-STAR contraction (operators/graph.py,
    connected_components_star) — the web-scale path: O(log² n) rounds
    on the shrinking edge set vs O(diameter) rounds of full-graph
    propagation, robust to high-degree hubs. Identical oracle: both
    algorithms must land on min-node-per-component exactly."""
    pairs = dedup_embedding_cosine(spark, sf_dir).select("a", "b")
    return _cluster_report(graph.connected_components_star(pairs))


@query("dedup_cluster_cc", oracle=_CC_ORACLE)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER assignment: transitive closure over the
    embedding-cosine near-dup pair graph via iterative min-label
    propagation (operators/graph.py), canonical doc = min vec_id per
    component. This is the step that turns pairwise dedup output into
    an actionable keep/drop list. The oracle is a DuckDB recursive CTE
    computing min-reachable-node — an exact SQL twin of the fixpoint,
    so this 'iterative algorithm' is fully oracle-checked."""
    pairs = dedup_embedding_cosine(spark, sf_dir).select("a", "b")
    return _cluster_report(graph.connected_components(pairs))


@query("dedup_minhash_cluster", oracle="""
WITH plant AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
  WHERE doc_id % 10 = 0 AND text IS NOT NULL)
-- the guaranteed (doc, twin) edge (identical signature, j = 1) puts
-- both in one component, so same_cluster recomputes to TRUE; the
-- component's min id is <= doc_id < twin_id, so the twin can never be
-- its cluster's keeper — both booleans are monotone under any extra
-- organic near-dup edges the banding may add
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       TRUE AS same_cluster, FALSE AS twin_keep
FROM plant ORDER BY doc_id
""")
def dedup_minhash_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end FUZZY-dedup keep/drop list — what a pretraining
    pipeline actually consumes: MinHash-LSH near-dup pairs
    (dedup_fuzzy_minhash's plan) → star-contraction connected
    components → (doc_id, cluster_id, keep = lowest id per cluster);
    docs in no pair keep themselves (left join, label coalesces to
    self). Driven by the planted-twin eval (VERDICT r8 ask 2): the op
    emits, per planted doc, whether doc and twin landed in the SAME
    cluster and whether the twin was (wrongly) kept. Both booleans are
    deterministic AND invariant to extra hash-dependent organic edges:
    the planted edge is caught with probability 1 (identical MinHash
    signature), connectivity only grows with more edges, and the
    cluster min can only decrease — so same_cluster = TRUE,
    twin_keep = FALSE exactly, which the oracle recomputes in SQL. The
    CC step itself is oracle-proven against a recursive CTE on the
    embedding path (dedup_cluster_cc[_star])."""
    docs = load_table(spark, sf_dir, "documents").repartition("doc_id")
    plant, aug = _twin_aug(docs)
    sets = textops.shingle_sets(aug).cache()
    sig = textops.minhash_from_sets(sets)
    pairs = textops.candidate_pairs(textops.lsh_bands(sig))
    dup = (textops.jaccard_verify(pairs, aug, threshold=0.3, sets=sets)
                  .select("a", "b"))
    cc = graph.connected_components_star(dup)
    # Report tail reads ONLY the CC labels (round-11 optimization): the
    # old form materialized a corpus-wide keep/drop list (aug LEFT JOIN
    # cc, labels coalesced to self) and then derived BOTH report sides
    # from that uncached list — the corpus scan + join executed twice,
    # once per side. Every planted doc and its twin are guaranteed IN
    # cc (the planted edge has identical MinHash signatures, so it is
    # banded and verified with probability 1 — the same invariant the
    # oracle's constant TRUE/FALSE columns already rely on), so the
    # coalesce-to-self never fires for report rows and both sides can
    # project straight off the checkpointed cc table: two corpus scans
    # and two joins removed, answer unchanged (proven by the oracle at
    # all fixtures).
    orig = cc.select(F.col("n").alias("doc_id"),
                     F.col("cluster_id").alias("__c_orig"))
    twin = cc.select((F.col("n") - _TWIN_OFFSET).alias("doc_id"),
                     F.col("cluster_id").alias("__c_twin"),
                     (F.col("n") == F.col("cluster_id"))
                     .alias("__twin_keep"))
    # LEFT joins from plant (round 12, ADVICE r11): should a planted
    # doc ever fail to reach cc (impossible under the current identical-
    # signature banding, but data-dependent), its report row now
    # SURVIVES with same_cluster = FALSE — a loud oracle mismatch —
    # instead of silently dropping. On every fixture the rows all match,
    # so the output (and hash) is unchanged.
    return (plant.select(
                "doc_id",
                F.size(textops.tokens("text")).cast("long")
                 .alias("n_tokens"))
                 .join(orig, "doc_id", "left")
                 .join(twin, "doc_id", "left")
                 .select("doc_id", "n_tokens",
                         F.coalesce(F.col("__c_orig") == F.col("__c_twin"),
                                    F.lit(False)).alias("same_cluster"),
                         F.coalesce("__twin_keep", F.lit(False))
                          .alias("twin_keep"))
                 .orderBy("doc_id"))


# Deterministic per-language marker vocabularies for the n-gram/keyword
# language-ID heuristic. On the synthetic fixture every language shares
# one vocabulary, so scores tie and the tiebreak (alphabetical lang)
# decides — the OPERATOR mechanics (score → argmax → tie-break) are
# what the oracle pins; swap marker lists for real corpora.
_LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "est", "que"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def _lang_score_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"
    return f"len(list_intersect(string_split(text, ' '), {arr}))"


@query("text_lang_id", oracle=f"""
WITH s AS (
  SELECT doc_id, lang AS lang_true,
         {', '.join(f'{_lang_score_sql(l)} AS s_{l}' for l in sorted(_LANG_MARKERS))}
  FROM documents)
SELECT doc_id, lang_true,
       CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
            WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
            WHEN s_fr THEN 'fr' ELSE 'zh' END AS lang_pred,
       greatest(s_de, s_en, s_es, s_fr, s_zh) AS score
FROM s
""")
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-vocabulary language ID: per-language overlap score →
    argmax with deterministic alphabetical tie-break (CASE checks langs
    in sorted order on both engines). Pure set-intersection counts —
    no UDF, exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.split("text", r"\s+")
    scores = {l: F.size(F.array_intersect(
        tok, F.array(*[F.lit(w) for w in _LANG_MARKERS[l]])))
        for l in sorted(_LANG_MARKERS)}
    best = F.greatest(*scores.values())
    # CASE chain in sorted-lang order: first match wins, mirroring the
    # oracle's CASE ... WHEN order exactly
    pred = F
    for lang in sorted(_LANG_MARKERS):
        pred = pred.when(scores[lang] == best, F.lit(lang))
    pred = pred.otherwise(F.lit("zh"))
    return docs.select("doc_id", F.col("lang").alias("lang_true"),
                       pred.alias("lang_pred"), best.alias("score"))


_FP_B = 1_000_003
_FP_M = 1_000_000_007


@query("text_fingerprint", oracle=f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST(len(t) * 131 + ascii(t[1:1]) AS BIGINT))),
         (acc, h) -> (acc * {_FP_B} + h) % {_FP_M}) AS fingerprint,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: Rabin-Karp fold
    acc = (acc·B + h(tok)) mod M over the ordered token stream —
    order-sensitive (unlike sha2-of-text, it supports windowed/
    incremental variants). h(tok) here is a toy cross-engine token hash
    (len·131 + first char code) so DuckDB can verify the FOLD exactly;
    production swaps h for xxhash64 (rows-only then). Exact BIGINT
    arithmetic throughout — no float drift possible."""
    docs = load_table(spark, sf_dir, "documents")
    tok_h = lambda t: (F.length(t) * 131 +
                       F.ascii(F.substring(t, 1, 1))).cast("long")
    fp = F.aggregate(
        F.transform(textops.tokens("text"), tok_h),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * _FP_B + h) % _FP_M,
    )
    return docs.select(
        "doc_id", fp.alias("fingerprint"),
        F.size(textops.tokens("text")).alias("n_tokens"))


@query("text_token_count", oracle=r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS bpe_pieces,
       n_chars
FROM documents
""")
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (training-data budget accounting):
    whitespace tokens and BPE-style pre-tokenizer pieces (letter runs /
    digit runs / punctuation runs — the GPT-2 pre-tokenizer shape,
    regex-only so it stays in codegen; both engines run the same RE2
    class syntax)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(textops.tokens("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(
            "text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0)).alias("bpe_pieces"),
        "n_chars",
    )


# The synthetic corpus has no punctuation or PII, so the two operators
# below PLANT deterministic structure with pure expressions (identical
# strings on both engines) before exercising the regex machinery — the
# operator mechanics (match, count, replace, split, position) are what
# the oracle pins; on a real corpus the planting stage is dropped.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9 -]{6,}[0-9]"


@query("text_pii_scrub", oracle=rf"""
WITH t AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@mail.example.org or +1 555-01' ||
         CAST(doc_id % 10 AS VARCHAR) || ' now' AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
FROM t
""")
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (training-data compliance pass): count and replace
    email/phone patterns with typed placeholders. Regex-only — stays in
    whole-stage codegen, pattern classes restricted to RE2-compatible
    syntax so Java (Spark) and RE2 (DuckDB) agree. Note DuckDB's
    regexp_replace needs the 'g' flag for global replacement; Spark's
    is global by default."""
    d = load_table(spark, sf_dir, "documents")
    t = F.concat(F.col("text"), F.lit(" contact user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@mail.example.org or +1 555-01"),
                 (F.col("doc_id") % 10).cast("string"), F.lit(" now"))
    base = d.select("doc_id", t.alias("t"))
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0))
         .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), 0))
         .cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE, "<PHONE>").alias("scrubbed"),
    )


@query("text_sentence_split", oracle=r"""
WITH t AS (
  SELECT doc_id,
         substr(text, 1, 60) || '. ' || substr(text, 61, 60) || '! ' ||
         substr(text, 121, 60) || '?' AS t
  FROM documents),
arr AS (SELECT doc_id, string_split_regex(t, '[.!?]\s*') AS a FROM t),
ex AS (SELECT doc_id,
              CAST(generate_subscripts(a, 1) AS BIGINT) AS sent_idx,
              trim(unnest(a)) AS sentence
       FROM arr)
SELECT doc_id, sent_idx, sentence,
       CAST(len(string_split(sentence, ' ')) AS BIGINT) AS n_tokens
FROM ex WHERE sentence <> ''
""")
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation: split on terminator+whitespace, explode
    WITH POSITION (order is meaningful downstream — packing, windowed
    context). posexplode is 0-based vs generate_subscripts' 1-based →
    +1; empties from trailing/consecutive terminators are filtered
    AFTER numbering on both engines, so indices keep identical gaps.
    No lookbehind in the pattern — RE2 (DuckDB) has none, so the
    terminator is consumed rather than kept."""
    d = load_table(spark, sf_dir, "documents")
    t = F.concat(F.substring("text", 1, 60), F.lit(". "),
                 F.substring("text", 61, 60), F.lit("! "),
                 F.substring("text", 121, 60), F.lit("?"))
    arr = d.select("doc_id", F.split(t, r"[.!?]\s*").alias("a"))
    ex = arr.select("doc_id", F.posexplode("a").alias("pos", "s"))
    return (ex.select("doc_id",
                      (F.col("pos") + 1).cast("long").alias("sent_idx"),
                      F.trim("s").alias("sentence"))
              .filter(F.col("sentence") != "")
              .withColumn("n_tokens",
                          F.size(F.split("sentence", " ")).cast("long")))


@query("sim_ivf_ann", oracle=_ANN_EVAL_ORACLE)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (the third scale path next to brute-force and
    LSH; operators/similarity.py knn_ivf): a seeded KMeans coarse
    quantizer (k=16, fit on the CORPUS only) buckets the corpus by
    nearest centroid; queries probe their 2 nearest centroids and
    re-rank exactly. At 100 TB the centroid table is a broadcast join
    and each probe touches ~2/16 of the corpus partition-pruned by
    centroid id. Driven by the planted-copy eval: a query identical to
    a corpus vector has the source's assigned centroid as its own
    nearest, so the source is always in the probed lists and the exact
    re-rank returns it at rank 1 — the oracle recomputes top-1 by
    brute force in SQL. Recall at cos < 1 (the genuinely approximate
    regime) stays pinned by tests/test_llm_ops.py against the
    brute-force baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (similarity.knn_ivf(_planted_queries(emb), emb, k=1)
            .select("qid", F.col("cid").alias("top1_cid"),
                    F.col("cosine").alias("top1_cosine"))
            .orderBy("qid"))


# multimodal ops moved to plans/q_media.py (round 6): real codecs
# over real container files replaced the round-2 stub kernels.


@query("feature_hashing", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
SELECT doc_id,
       CAST((len(t) * 131 + ascii(t[1:1])) % 64 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM tok GROUP BY doc_id, bucket ORDER BY doc_id, bucket
""")
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING TRICK: tokens → fixed-width sparse count vector
    (bucket = h(token) mod 64) with no vocabulary pass — the
    streaming-friendly featurizer (HashingVectorizer): one explode +
    one agg, dimensionality fixed up front, no global dictionary to
    build or broadcast. Token hash is the same toy cross-engine h as
    text_fingerprint so the oracle verifies the BUCKETING exactly;
    production swaps in xxhash64 (rows-only then). Collisions are the
    accepted trade — that's the trick's contract, not a bug."""
    d = load_table(spark, sf_dir, "documents")
    tok_h = (F.length("t") * 131 + F.ascii(F.substring("t", 1, 1)))
    return (d.select("doc_id", F.explode(textops.tokens("text")).alias("t"))
              .select("doc_id", (tok_h % 64).cast("long").alias("bucket"))
              .groupBy("doc_id", "bucket")
              .agg(F.count(F.lit(1)).alias("n"))
              .orderBy("doc_id", "bucket"))


@query("vec_normalize", oracle=f"""
SELECT vec_id,
       ROUND(SQRT({_dot_sql('embedding', 'embedding')}), 6) AS l2_norm,
       list_aggregate(
         list_transform(embedding,
           x -> CAST(CAST(CAST(x AS DOUBLE) /
                          SQRT({_dot_sql('embedding', 'embedding')})
                          AS DECIMAL(18,6)) AS VARCHAR)),
         'string_agg', ',') AS unit_csv
FROM embeddings
""")
def vec_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize the embedding column — the prep step every
    cosine-based op wants done once upstream (then cosine IS the dot
    product). Unit components leave the query as DECIMAL(18,6)-cast
    strings joined to CSV: identical fixed-point rendering on both
    engines, where raw double→string rendering differs (scientific
    notation thresholds) and raw arrays crash the driver's
    canonicalizer. Same zip-fold norm as every similarity op."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = similarity.l2_norm("embedding")
    unit = F.transform(
        "embedding",
        lambda x: (x.cast("double") / nrm).cast("decimal(18,6)")
                   .cast("string"))
    return emb.select(
        "vec_id",
        F.round(nrm, 6).alias("l2_norm"),
        F.array_join(unit, ",").alias("unit_csv"),
    )


# ------------------------------------------------------ dataset splits

@query("data_split_hash", oracle="""
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM (
    SELECT n_chars,
           CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 80
                THEN 'train'
                WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM documents)
GROUP BY split ORDER BY split
""")
def data_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by a PORTABLE Knuth
    multiplicative hash of the key — the training-pipeline way to split
    100 TB: no sampling shuffle, no RNG state, any engine recomputes the
    same assignment. The pre-mod by 1000003 keeps every intermediate
    < 2^52 so DuckDB BIGINT (which faults on overflow, unlike Spark's
    wrapping) evaluates the identical arithmetic — that's what makes
    this SQL-oracle-checkable where xxhash64 splits are not."""
    d = load_table(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 1000003 % 100
    split = (F.when(h < 80, "train").when(h < 90, "val")
              .otherwise("test").alias("split"))
    return (d.select(split, "n_chars")
             .groupBy("split")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("chars"))
             .orderBy("split"))


@query("data_sample_stratified", oracle="""
WITH s AS (
  SELECT doc_id, lang, n_chars,
         ((doc_id % 1000003) * 2654435761) % 1000003 % 100 AS h
  FROM documents),
kept AS (
  SELECT * FROM s
  WHERE h < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50 ELSE 100 END)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM kept GROUP BY lang ORDER BY lang
""")
def data_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sampling — per-stratum keep rates
    (down-weight dominant languages, keep the tail whole: the data-mix
    rebalancing every pretraining corpus goes through) via the same
    portable Knuth hash as data_split_hash: no RNG, no sampling
    shuffle, any engine recomputes the identical keep set, and the
    rate per stratum is just a broadcastable CASE (or dim join) on the
    stratum key. df.sampleBy() is the built-in analog but is
    seed/partitioning-dependent — hash-gating is the reproducible
    100 TB form."""
    d = load_table(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 1000003 % 100
    rate = (F.when(F.col("lang") == "en", 10)
             .when(F.col("lang") == "de", 50).otherwise(100))
    return (d.filter(h < rate)
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_kept"),
                  F.sum("n_chars").alias("chars"),
                  F.min("doc_id").alias("first_doc"))
             .orderBy("lang"))


_PACK_BUDGET = 2048  # tokens per training sequence


@query("data_pack_sequences", oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS tok_start
  FROM t)
SELECT doc_id, source, n_tokens,
       tok_start // {_PACK_BUDGET} AS pack_id,
       tok_start % {_PACK_BUDGET} AS offset_in_pack,
       (tok_start + n_tokens - 1) // {_PACK_BUDGET} > tok_start // {_PACK_BUDGET}
         AS crosses_boundary
FROM c
""")
def data_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training (concat-and-chunk): within
    each source, documents are concatenated in doc_id order and cut
    into fixed token-budget sequences; each doc gets the pack id and
    offset where its first token lands, plus a crosses-boundary flag
    (the doc spans two training sequences).

    One window running sum + integer arithmetic — no UDF, no shuffle
    beyond the per-source partitioning, and the running sum is the
    same cumsum primitive the HRV window bucketing uses (§2.5). At
    100 TB pack within (source, shard) so no single partition carries
    a whole source; exact integers make the oracle bit-stable."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (W.partitionBy("source").orderBy("doc_id")
          .rowsBetween(W.unboundedPreceding, 0))
    t = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    c = t.withColumn("tok_start",
                     F.sum("n_tokens").over(w) - F.col("n_tokens"))
    pack = (F.col("tok_start") / _PACK_BUDGET).cast("long")
    end_pack = ((F.col("tok_start") + F.col("n_tokens") - 1)
                / _PACK_BUDGET).cast("long")
    return c.select(
        "doc_id", "source", "n_tokens",
        pack.alias("pack_id"),
        (F.col("tok_start") % _PACK_BUDGET).alias("offset_in_pack"),
        (end_pack > pack).alias("crosses_boundary"),
    )


_GOPHER_STOP = ("the", "a", "and", "of", "to", "in", "is")


@query("text_gopher_quality", oracle=f"""
WITH sp AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
tok AS (SELECT doc_id, unnest(s) AS tok FROM sp),
st AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(len(tok)) AS BIGINT) AS sum_word_len,
         CAST(SUM(CASE WHEN regexp_matches(tok, '[A-Za-z]') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_alpha_words,
         CAST(COUNT(DISTINCT CASE WHEN tok IN {_GOPHER_STOP} THEN tok END)
              AS BIGINT) AS n_stop_distinct
  FROM tok GROUP BY doc_id),
bg AS (SELECT doc_id, s[i] || ' ' || s[i+1] AS bigram
       FROM (SELECT doc_id, s, unnest(generate_series(1, len(s) - 1)) AS i
             FROM sp)),
bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
bgs AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_c,
               CAST(SUM(c) AS BIGINT) AS n_bigrams
        FROM bgc GROUP BY doc_id)
SELECT st.doc_id, n_words, sum_word_len, n_alpha_words, n_stop_distinct,
       COALESCE(top_bigram_c, 0) AS top_bigram_c,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       (n_words BETWEEN 50 AND 100000
        AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
        AND 5 * n_alpha_words > 4 * n_words
        AND n_stop_distinct >= 2
        AND 5 * COALESCE(top_bigram_c, 0) <= COALESCE(n_bigrams, 0)) AS passes
FROM st LEFT JOIN bgs ON st.doc_id = bgs.doc_id
""")
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules quality signals (Rae et al. 2021, public): word
    count band, mean word length 3-10, alpha-word fraction > 0.8,
    >= 2 distinct stopwords, top-bigram repetition <= 0.2 — the
    standard pretraining-corpus filter family alongside the C4-style
    text_quality_filter.

    Every output is an exact integer (numerator/denominator pairs)
    and the pass flag uses cross-multiplied integer comparisons, so
    no float rounding can drift cross-engine. Bigrams come from
    ``transform`` over the split array — per-row array math, NO window
    shuffle; the only shuffles are the two doc_id hash aggregates and
    a co-partitioned join AQE folds together. Line-based Gopher rules
    (bullet/ellipsis lines) are N/A: fixture docs are single-line."""
    d = load_table(spark, sf_dir, "documents")
    sp = d.select("doc_id", F.split(F.col("text"), " ").alias("s"))
    tok = sp.select("doc_id", F.explode("s").alias("tok"))
    st = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("tok")).alias("sum_word_len"),
        F.sum(F.when(F.col("tok").rlike("[A-Za-z]"), 1).otherwise(0))
         .alias("n_alpha_words"),
        F.countDistinct(
            F.when(F.col("tok").isin(*_GOPHER_STOP), F.col("tok")))
         .alias("n_stop_distinct"),
    )
    bigrams = F.expr(
        "transform(slice(s, 1, size(s) - 1),"
        " (x, i) -> concat(x, ' ', element_at(s, i + 2)))")
    bg = sp.select("doc_id", F.explode(bigrams).alias("bigram"))
    bgc = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    bgs = bgc.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_c"), F.sum("c").alias("n_bigrams"))
    j = st.join(bgs, "doc_id", "left")
    top_c = F.coalesce(F.col("top_bigram_c"), F.lit(0))
    n_bg = F.coalesce(F.col("n_bigrams"), F.lit(0))
    n, sl = F.col("n_words"), F.col("sum_word_len")
    return j.select(
        "doc_id", "n_words", "sum_word_len", "n_alpha_words",
        "n_stop_distinct",
        top_c.alias("top_bigram_c"), n_bg.alias("n_bigrams"),
        (n.between(50, 100000)
         & (3 * n <= sl) & (sl <= 10 * n)
         & (5 * F.col("n_alpha_words") > 4 * n)
         & (F.col("n_stop_distinct") >= 2)
         & (5 * top_c <= n_bg)).alias("passes"),
    )


_PR_SCALE = 1_000_000   # fixed-point micro-units
_PR_D = 85              # damping 0.85 as a rational 85/100
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    base = f"(({100 - _PR_D}) * {_PR_SCALE} // 100)"
    ctes = [f"""
WITH edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nodes AS (
  SELECT c_custkey * 2 AS node_id FROM customer
  UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od
           FROM edges GROUP BY src),
r0 AS (SELECT node_id,
              CAST({_PR_SCALE} // (SELECT n FROM nn) AS BIGINT) AS rank_u
       FROM nodes)"""]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(f"""
s{k} AS (
  SELECT e.dst AS node_id, CAST(SUM(r.rank_u // o.od) AS BIGINT) AS cs
  FROM edges e
  JOIN r{k - 1} r ON e.src = r.node_id
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
r{k} AS (
  SELECT nodes.node_id,
         CAST({base} // (SELECT n FROM nn)
              + ({_PR_D} * COALESCE(s{k}.cs, 0)) // 100 AS BIGINT) AS rank_u
  FROM nodes LEFT JOIN s{k} ON nodes.node_id = s{k}.node_id)""")
    return (",".join(ctes)
            + f"\nSELECT node_id, rank_u FROM r{_PR_ITERS}")


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (damping
    0.85, 3 fixed iterations) — the iterative-algorithm family beyond
    connected components: per round one equi-join pushes rank/outdeg
    contributions along edges, one hash aggregate gathers them, and a
    left join re-attaches silent nodes.

    Exactness strategy: ranks live as BIGINT micro-units and every
    step is integer arithmetic (floor division both engines), so the
    result is bit-identical cross-engine — float PageRank would drift
    with summation order. Dangling mass (suppliers are sinks in the
    bipartite graph) decays rather than redistributes; both engines
    implement the same variant, and the fixed-point quantization is
    the documented contract.

    Scale shape: edges + out-degrees computed once and cached (the
    per-iteration reuse diamond); each iteration is one shuffle on dst
    — rank updates never leave the JVM, and at 1000 executors the edge
    table partitioning is reused across all rounds. The single driver
    scalar is N (node count), same convergence-check precedent as
    dedup_cluster_cc (operators/graph.py)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
               .select((F.col("o_custkey") * 2).cast("long").alias("src"),
                       (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"))
               .distinct())
    cust = (load_table(spark, sf_dir, "customer")
            .select((F.col("c_custkey") * 2).cast("long").alias("node_id")))
    supp = (load_table(spark, sf_dir, "supplier")
            .select((F.col("s_suppkey") * 2 + 1).cast("long").alias("node_id")))
    nodes = cust.unionAll(supp).cache()
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ew = edges.join(outdeg, "src").cache()
    init = _PR_SCALE // n
    base = ((100 - _PR_D) * _PR_SCALE // 100) // n
    ranks = nodes.select("node_id", F.lit(init).cast("long").alias("rank_u"))
    for _ in range(_PR_ITERS):
        contrib = (ew.join(ranks, ew.src == ranks.node_id)
                     .select("dst", F.expr("rank_u div od").alias("c")))
        s = contrib.groupBy("dst").agg(F.sum("c").alias("cs"))
        ranks = (nodes.join(s, nodes.node_id == s.dst, "left")
                      .select("node_id",
                              (F.lit(base)
                               + F.expr(f"({_PR_D} * coalesce(cs, 0)) div 100"))
                              .cast("long").alias("rank_u")))
    return ranks


_SEM_CC_ORACLE = f"""
WITH RECURSIVE
e AS (SELECT a, b FROM ({_EMB_LSH_ORACLE})),
sym AS (SELECT a AS n, b AS m FROM e UNION SELECT b, a FROM e),
reach(n, m) AS (
    SELECT n, n FROM (SELECT DISTINCT n FROM sym)
    UNION
    SELECT r.n, s.m FROM reach r JOIN sym s ON r.m = s.n),
lbl AS (SELECT n AS vec_id, MIN(m) AS cluster_id FROM reach GROUP BY n)
SELECT emb.vec_id,
       COALESCE(lbl.cluster_id, emb.vec_id) AS cluster_id,
       (COALESCE(lbl.cluster_id, emb.vec_id) = emb.vec_id) AS keep
FROM embeddings emb LEFT JOIN lbl ON emb.vec_id = lbl.vec_id
ORDER BY emb.vec_id
"""


@query("dedup_semantic_cluster", oracle=_SEM_CC_ORACLE)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END SEMANTIC DEDUP (SemDeDup-style, public): unblocked
    hyperplane-LSH near-dup pairs over the embedding column →
    star-contraction connected components → (vec_id, cluster_id, keep)
    where keep = lowest id per semantic cluster and unpaired vectors
    keep themselves. The semantic twin of dedup_minhash_cluster — and
    unlike that one, FULLY oracle-checked: the LSH pair stage uses
    seeded plan-literal hyperplanes with a DuckDB twin, and the
    clustering fixpoint has an exact recursive-CTE twin, so the whole
    keep-list is hash-compared cross-engine.

    Scale: every stage is the already-audited scale path — banded LSH
    (no all-pairs), 1000-vector bucket cap, O(log² n) star contraction
    — composed; the final left join is vec_id-partitioned both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.lsh_near_dup_pairs(emb, threshold=0.4).select("a", "b")
    cc = graph.connected_components_star(pairs)
    return (emb.select("vec_id")
               .join(cc.select(F.col("n").alias("vec_id"), "cluster_id"),
                     "vec_id", "left")
               .select("vec_id",
                       F.coalesce("cluster_id", "vec_id").alias("cluster_id"))
               .withColumn("keep", F.col("vec_id") == F.col("cluster_id"))
               .orderBy("vec_id"))


@query("vec_centroid_by_label", oracle=f"""
WITH e AS (
  SELECT label, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings),
m AS (
  SELECT label, pos,
         {dsum_sql('CAST(x AS DOUBLE)')} / COUNT(x) AS mu
  FROM e GROUP BY label, pos)
SELECT label, CAST(COUNT(*) AS BIGINT) AS dim,
       string_agg(CAST(CAST(mu AS DECIMAL(18,6)) AS VARCHAR),
                  ',' ORDER BY pos) AS centroid_csv
FROM m GROUP BY label
""")
def vec_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding CENTROID — the KMeans E-step / class-
    prototype aggregate as one distributed plan: posexplode the vector
    column, DECIMAL-exact mean per (label, dimension), gather back in
    dimension order. Rendering rides the proven vec_normalize trick
    (DECIMAL(18,6) fixed-point CSV — raw double→string and raw arrays
    both break cross-engine hashing). Scale: the explode is bounded by
    the embedding dim, the (label, pos) agg is perfectly uniform (no
    skew by construction), and the gather state per label is one
    dim-length array — this is how you compute 10k class prototypes
    over 100 TB without a single driver-side vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    m = e.groupBy("label", "pos").agg(
        (dsum(F.col("x").cast("double")) / F.count("x")).alias("mu"))
    comp = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "mu"))),
        lambda s: s["mu"].cast("decimal(18,6)").cast("string"))
    return m.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"),
        F.array_join(comp, ",").alias("centroid_csv"))
