"""Round-8d operator additions: the cross-split leakage audit and the
vocabulary coverage curve — two training-data governance passes.

Provenance (SURVEY.md §0 applies — empty reference checkout): split
contamination via duplicates is the published train/test-leakage canon
(the reason C4/The Pile/GPT-3 decontaminate [PK]); token-coverage
curves are the tokenizer-sizing canon (how big a vocab covers X% of a
corpus, Zipf-area arithmetic [PK]).

House rules throughout (plans/registry.py): integer-exact cores
(coverage thresholds compared as cross-multiplied integers, never
float fractions), identical aliases, non-nullable booleans, no
decimals/arrays at the boundary.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


# ---------------------------------------------------------------------------
# Cross-split exact-duplicate leakage audit
# ---------------------------------------------------------------------------

_SPLIT_SQL = """
  CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 80
       THEN 'train'
       WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
       THEN 'val' ELSE 'test' END
"""


@query("audit_split_exact_leak", oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 37 = 0),
assigned AS (
  SELECT doc_id, {_SPLIT_SQL} AS split,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS dig
  FROM corpus),
grp AS (
  SELECT dig,
         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_val,
         CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_test
  FROM assigned GROUP BY dig)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_digests,
  CAST(SUM(CASE WHEN n_train > 0 AND (n_val > 0 OR n_test > 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS leaking_digests,
  CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0
                THEN n_test ELSE 0 END) AS BIGINT)
    AS contaminated_test_docs,
  CAST(SUM(CASE WHEN n_train > 0 AND n_val > 0
                THEN n_val ELSE 0 END) AS BIGINT)
    AS contaminated_val_docs,
  COALESCE(SUM(CASE WHEN n_train > 0 AND (n_val > 0 OR n_test > 0)
                    THEN 1 ELSE 0 END) > 0, false) AS any_leak
FROM grp
""")
def audit_split_exact_leak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SPLIT LEAKAGE AUDIT [PK — the reason C4/GPT-3-style
    pipelines decontaminate]: a document whose NORMALIZED content also
    appears in train makes every val/test copy worthless — the model
    has memorized the answer. The op assigns the repo's portable-hash
    splits (the data_split_hash convention — so this audits the
    ACTUAL production assignment, not a toy one), groups by the
    C4-normalized md5 digest (the dedup_exact_normalized convention),
    and counts digests whose members span train AND an eval split,
    plus the contaminated eval-doc counts a cleanup would drop.
    NON-VACUOUS by injection (workflow vacuity rule: the fixture's 500
    documents are all digest-unique, so the raw table would let the
    audit pass while finding nothing): every 37th document is
    SYNDICATED — re-published under doc_id+1,000,000, the real-world
    mirror/crosspost shape — identically on BOTH engines; the copy's
    new id hashes to an independent split, so ~1−(0.8²+0.1²+0.1²)
    ≈ 34% of copy pairs straddle splits and `any_leak` pins that the
    audit finds them (a regression that silently empties the digest
    join can't pass). The FIX this op motivates is splitting by
    digest-hash instead of doc-hash; the audit is the evidence. All
    counts exact integers. Scale: one shuffle on the 32-byte digest
    (uniform), map-side combinable, scalar output."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 37 == 0)
         .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    h = ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 1000003 % 100
    split = (F.when(h < 80, "train").when(h < 90, "val")
              .otherwise("test"))
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "))
    assigned = corpus.select(split.alias("split"), F.md5(norm).alias("dig"))
    grp = (assigned.groupBy("dig")
           .agg(F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
                 .cast("long").alias("n_train"),
                F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
                 .cast("long").alias("n_val"),
                F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
                 .cast("long").alias("n_test")))
    leak = (F.col("n_train") > 0) & ((F.col("n_val") > 0)
                                     | (F.col("n_test") > 0))
    return grp.agg(
        F.count(F.lit(1)).alias("n_digests"),
        F.sum(F.when(leak, 1).otherwise(0)).cast("long")
         .alias("leaking_digests"),
        F.sum(F.when((F.col("n_train") > 0) & (F.col("n_test") > 0),
                     F.col("n_test")).otherwise(0)).cast("long")
         .alias("contaminated_test_docs"),
        F.sum(F.when((F.col("n_train") > 0) & (F.col("n_val") > 0),
                     F.col("n_val")).otherwise(0)).cast("long")
         .alias("contaminated_val_docs"),
        F.coalesce(F.sum(F.when(leak, 1).otherwise(0)) > 0,
                   F.lit(False)).alias("any_leak"))


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer-sizing arithmetic)
# ---------------------------------------------------------------------------

_COV_PCTS = (50, 90, 95, 99)


@query("vocab_coverage_curve", oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
cnt AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok
  WHERE t <> '' GROUP BY t),
ranked AS (
  SELECT c,
         ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rk,
         SUM(c) OVER (ORDER BY c DESC, t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER () AS total
  FROM cnt)
SELECT pct,
       MIN(rk) AS vocab_size,
       CAST(MAX(total) AS BIGINT) AS total_tokens
FROM ranked,
     (SELECT unnest([{", ".join(str(p) for p in _COV_PCTS)}]) AS pct) p
WHERE 100 * cum >= pct * total
GROUP BY pct
""")
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE CURVE [PK — tokenizer-sizing canon]: the
    smallest vocabulary (most-frequent-first) covering 50/90/95/99% of
    corpus token occurrences — the number that decides a tokenizer's
    vocab budget and predicts the OOV rate any smaller vocab pays
    (text_oov_rate is this curve's pointwise dual). INTEGER-EXACT:
    the threshold test is the cross-multiplied 100·cum ≥ pct·total —
    no float fraction anywhere, so the engines cannot disagree;
    frequency ties are broken by token text so the rank (and thus the
    minimal size) is a total order. Scale: one tokenize-and-count
    shuffle (map-side combinable), then ONE unpartitioned window over
    |vocab| rows (corpus-independent — the vocab is Zipf-bounded);
    the 4-row threshold table cross-joins in as a broadcast literal."""
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
            .filter(F.col("t") != ""))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    wr = W.orderBy(F.desc("c"), "t")
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ranked = cnt.select(
        "c",
        F.row_number().over(wr).alias("rk"),
        F.sum("c").over(wr.rowsBetween(W.unboundedPreceding, 0))
         .alias("cum"),
        F.sum("c").over(wall).alias("total"))
    # .limit = no-op bound (literal list) making the broadcast side's
    # cardinality visible to tools/scan_broadcast_hints.py.
    pcts = spark.range(0).sparkSession.createDataFrame(
        [(p,) for p in _COV_PCTS], "pct int").limit(len(_COV_PCTS))
    return (ranked.crossJoin(F.broadcast(pcts))
            .filter(100 * F.col("cum") >= F.col("pct") * F.col("total"))
            .groupBy("pct")
            .agg(F.min("rk").alias("vocab_size"),
                 F.max("total").cast("long").alias("total_tokens")))
