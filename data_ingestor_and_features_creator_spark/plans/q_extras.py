"""Late-round-2 additions: LLM-training chunking, sequence/transition
mining, window-rank ratios, sliding distinct counts, deterministic mode,
and the TINN geometrical feature.

Registered AFTER every other module on purpose: the driver verifies a
~50-query prefix of the priority order (plans/__init__.py), and that
prefix was frozen mid-round — these ids append to the tail so the
already-advertised verification order is undisturbed; they rotate into
the priority prefix next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..features import kernels
from .registry import query


def _tokens(col):
    """Whitespace tokens, empty-safe. The split class is the explicit
    [ \\t\\r\\n]+ on BOTH engines (Java \\s includes \\x0B, RE2's does
    not — an explicit class sidesteps the drift)."""
    return F.filter(F.split(col, r"[ \t\r\n]+"), lambda t: t != F.lit(""))


_CHUNK, _STRIDE = 32, 24  # tokens per chunk / stride (overlap 8)


@query("text_chunk_overlap", oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \t\r\n]+'),
                     x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
), e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, n - 1, {_STRIDE})) AS st
  FROM s
)
SELECT doc_id,
       CAST(st // {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(LEAST({_CHUNK}, n - st) AS BIGINT) AS n_tok,
       array_to_string(toks[st + 1:st + {_CHUNK}], ' ') AS chunk_text
FROM e
WHERE st = 0 OR st < n - {_CHUNK - _STRIDE}
""")
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-training document chunking: fixed token windows with stride
    overlap (chunk 32, stride 24), the standard pretraining prep step.

    Pure expression plan — tokenize once, bounded explode of the stride
    grid (≤ n/stride chunk ids per doc, no unbounded fan-out), slice +
    join per chunk. The tail rule keeps exactly one end-reaching chunk:
    a start survives iff it is 0 or the previous chunk stopped short of
    the end (st < n - overlap). At 100 TB this is a single narrow map
    stage — no shuffle at all; chunk rows inherit the scan's
    partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens(F.col("text")).alias("toks")) \
            .withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    e = t.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1,
                             F.lit(_STRIDE))).alias("st"))
    keep = (F.col("st") == 0) | (F.col("st") < F.col("n") - (_CHUNK - _STRIDE))
    return e.filter(keep).select(
        "doc_id",
        F.expr(f"CAST(st DIV {_STRIDE} AS BIGINT)").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("st"))
         .cast("long").alias("n_tok"),
        F.array_join(F.slice("toks", F.col("st") + 1, F.lit(_CHUNK)), " ")
         .alias("chunk_text"),
    )


@query("win_distinct_sliding", oracle="""
SELECT event_id, user_id,
       CAST(count(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS types_10
FROM events
""")
def win_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a sliding row frame — Spark has no
    COUNT(DISTINCT) OVER, so the idiomatic form is
    size(array_distinct(collect_list() over frame)): the frame is 10
    rows, so the per-row array is bounded and stays in the window
    operator's buffer (no shuffle beyond the one partitioning
    exchange). DuckDB's native distinct window aggregate is the oracle
    twin."""
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-9, 0))
    return ev.select(
        "event_id", "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
         .cast("long").alias("types_10"),
    )


@query("win_rank_ratios", oracle="""
SELECT event_id, user_id,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value ASC NULLS FIRST, event_id)
""")
def win_rank_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile — the remaining §2.5 rank
    family. The order key carries the event_id tiebreak (house rule:
    total order) AND an explicit NULLS FIRST: Spark defaults asc →
    nulls first but DuckDB defaults NULLS LAST, so the oracle pins it.
    With a unique order key the ratios are integer/integer IEEE
    divisions — bit-identical cross-engine, emitted unrounded."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_first(), "event_id")
    return ev.select(
        "event_id", "user_id",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query("agg_mode", oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, cnt FROM r WHERE rn = 1
""")
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group with a DETERMINISTIC tiebreak
    (count desc, then lexicographic) — both engines' native mode()
    leave ties unspecified, so the portable form is count-then-rank:
    one partial-aggregated shuffle on (user, type), then a per-user
    window over ≤ |type| rows. Scale note: the window input is the
    aggregated table (groups, not events), so the second exchange
    carries cardinality |users|·|types|, not raw rows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"))
    w = W.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc())
    return (c.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("user_id", F.col("event_type").alias("mode_type"),
                     "cnt"))


@query("seq_transition_probs", oracle="""
WITH p AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), t AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM p WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, cnt,
       CAST((cnt * 1000000) // SUM(cnt) OVER (PARTITION BY prev_type)
            AS BIGINT) AS prob_ppm
FROM t
""")
def seq_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (sequence mining / behavioral features): lag within the
    (user, ts) ordering, count (prev→next) pairs, normalize per prev
    state. The probability is emitted as integer PPM via floored
    integer division — Spark DIV ≡ DuckDB // for non-negatives, so the
    value is exact cross-engine (house rule: never ROUND a ratio that
    can land on a .5 ulp boundary). The transition table is |types|²
    rows — the per-prev normalization window is a no-shuffle follow-on
    to the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = (ev.select("user_id", "ts", "event_id", "event_type")
           .withColumn("prev_type", F.lag("event_type").over(w))
           .filter(F.col("prev_type").isNotNull()))
    t = p.groupBy("prev_type", F.col("event_type").alias("next_type")) \
         .agg(F.count("*").alias("cnt"))
    wp = W.partitionBy("prev_type")
    return t.select(
        "prev_type", "next_type", "cnt",
        F.expr("CAST((cnt * 1000000) DIV SUM(cnt) OVER "
               "(PARTITION BY prev_type) AS BIGINT)").alias("prob_ppm"),
    )


@query("hrv_tinn")  # rows-only: least-squares triangle fit, not SQL
def hrv_tinn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TINN — baseline width of the least-squares triangular fit to the
    NN-interval histogram (7.8125 ms bins, the 128 Hz-heritage width
    shared with hrv_geometrical). The public hrvanalysis package
    returns tinn=None (unimplemented); this follows the Kubios /
    Task-Force definition instead: search (N, M) around the modal bin
    minimizing Σ(D−q)², q the triangle 0 at N and M peaking at D(X).

    O(bins²) per record inside an Arrow kernel — bounded because the
    physiologic RR range caps the bin count (~hundreds), independent of
    beat count; the heavy reduction (histogramming) happens FIRST via a
    distributed groupBy so the kernel sees (record, bin, count) rows,
    never raw beats. Known-answer-tested in
    tests/test_hrv_known_answers.py."""
    from .q_hrv import rr_from_events

    rr = rr_from_events(spark, sf_dir)
    binned = (rr.groupBy(
        "record_id",
        F.floor(F.col("rri") / F.lit(7.8125)).cast("long").alias("bin"))
        .agg(F.count("*").alias("c")))
    return binned.groupBy("record_id").applyInPandas(
        kernels.tinn_kernel, schema=kernels.TINN_SCHEMA)
