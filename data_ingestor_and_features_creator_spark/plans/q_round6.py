"""Round-6 operator additions.

Provenance note (SURVEY.md §0 applies — empty reference checkout):
these extend the engine along the round-6 brief's scale themes —
observable streaming loss, mixture scheduling for training data,
order-of-magnitude profiling, trend detection, and the hidden
file-metadata scan surface. All public-API constructions
([SPARK]/[PK]); no reference code exists to cite.

House rules throughout (plans/registry.py): no RNG, no libm
transcendentals in aggregates, exact integer/rational outputs where
possible, total orders before any LIMIT, aliases identical on both
engines.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# Order-of-magnitude histogram (exact, no libm)
# ---------------------------------------------------------------------------

@query("agg_magnitude_histogram", oracle="""
WITH v AS (
  SELECT event_type, abs(value) AS a FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND value <> 0)
SELECT event_type,
       CASE WHEN a < 1 THEN -1
            ELSE length(CAST(CAST(floor(a) AS BIGINT) AS VARCHAR)) - 1
       END AS mag,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       MIN(a) AS lo, MAX(a) AS hi
FROM v GROUP BY event_type, mag
""")
def agg_magnitude_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-magnitude (decimal-exponent) histogram per event_type —
    the observability profile for value columns whose range spans
    decades (latencies, sizes, amounts). The bucket is floor(log10(|v|))
    for |v| >= 1 computed EXACTLY as digits(floor(|v|)) - 1 — a string
    length, not libm log10 (which drifts 1 ulp cross-engine at bucket
    boundaries); |v| < 1 collapses to bucket -1. NULL/NaN/zero rows are
    excluded per the engine's nulls-hardened missing-value semantics
    (BASELINE.md nulls gate). Domain: |v| < 2^63 (the bigint floor) —
     9.2e18, far above any fixture value. At scale this is one map-side
    combined groupBy on a low-cardinality (type, mag) key — no skew
    possible (≤ ~20 buckets per type)."""
    ev = load_table(spark, sf_dir, "events")
    a = F.abs(F.col("value"))
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value")
                   & (F.col("value") != 0))
           .select("event_type", a.alias("a")))
    mag = (F.when(F.col("a") < 1, F.lit(-1))
            .otherwise(F.length(F.floor("a").cast("bigint").cast("string"))
                       - 1))
    return (v.withColumn("mag", mag)
             .groupBy("event_type", "mag")
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.min("a").alias("lo"), F.max("a").alias("hi")))


# ---------------------------------------------------------------------------
# Mann-Kendall trend statistic per key (exact integer S, rational tau)
# ---------------------------------------------------------------------------

@query("win_mann_kendall", oracle="""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)),
n AS (SELECT user_id, COUNT(*) AS c FROM v GROUP BY user_id),
p AS (
  SELECT a.user_id, CAST(SUM(sign(b.value - a.value)) AS BIGINT) AS s
  FROM v a JOIN v b
    ON a.user_id = b.user_id
   AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
  GROUP BY a.user_id)
SELECT n.user_id, CAST(n.c AS BIGINT) AS n,
       CAST(COALESCE(p.s, 0) AS BIGINT) AS s_stat,
       CASE WHEN n.c >= 2
            THEN ROUND(COALESCE(p.s, 0) / (n.c * (n.c - 1) / 2.0), 6)
       END AS tau
FROM n LEFT JOIN p ON n.user_id = p.user_id
""")
def win_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per user: S = Σ_{i<j} sign(v_j - v_i)
    over the (ts, event_id)-ordered series, and Kendall's tau-a
    S / (n(n-1)/2) — the standard nonparametric monotone-trend
    statistic (no distributional assumption, robust to outliers,
    ties contribute 0). S is an exact integer (signum sums), tau an
    exact rational rounded 6dp — no libm anywhere. NULL/NaN excluded
    per the nulls-hardened semantics.

    Scale shape: the pair set is built with a per-key equi-join
    (shuffle on user_id, pairs generated only within a key), so cost
    is Σ_k n_k² over BOUNDED per-key series — the grouped-series
    regime this engine's sliding/HRV family already assumes (n_k ≈
    tens-to-thousands of events per user). It is NOT an unbounded
    all-pairs join; the O(n log n) inversion-count refinement only
    pays when single keys reach millions of rows."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select("user_id", F.unix_micros("ts").alias("t"),
                   "event_id", "value"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & ((F.col("a.t") < F.col("b.t"))
           | ((F.col("a.t") == F.col("b.t"))
              & (F.col("a.event_id") < F.col("b.event_id")))))
    s = (pairs.groupBy(F.col("a.user_id").alias("user_id"))
              .agg(F.sum(F.signum(F.col("b.value") - F.col("a.value")))
                    .cast("bigint").alias("s")))
    n = v.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (n.join(s, "user_id", "left")
             .select("user_id", F.col("n").cast("bigint").alias("n"),
                     F.coalesce("s", F.lit(0)).cast("bigint")
                      .alias("s_stat"),
                     F.when(F.col("n") >= 2,
                            F.round(F.coalesce("s", F.lit(0))
                                    / (F.col("n") * (F.col("n") - 1) / 2.0),
                                    6)).alias("tau")))


# ---------------------------------------------------------------------------
# Streaming late-data accounting (registered, FULL SQL oracle)
# ---------------------------------------------------------------------------

@query("stream_late_data_accounting", oracle=f"""
WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
           FROM events),
surv AS (
  SELECT ts FROM events, b
  WHERE NOT (epoch_us(ts) < b.lo + (b.hi - b.lo) // 2
             AND event_id % 97 = 0))
SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS ws_us,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM surv GROUP BY ws_us
""")
def stream_late_data_accounting(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """REAL many-trigger streaming replay with late-data loss
    accounting (the round-6 streaming-realism surface, BASELINE.md
    rate-limited soak row): the events fixture replays as time-ordered
    files under maxFilesPerTrigger=1 — one micro-batch per file, the
    watermark advancing between triggers — with the deterministic
    ~1% modular-gate subset (event_id % 97 = 0, first half of the
    timeline) displaced to arrive half a timeline late. The 2 h
    watermark rejects every displaced row, and the conservation law

        rows_in == rows_aggregated_out + numRowsDroppedByWatermark
        dropped == injected (exactly)

    is ASSERTED inside the operator — a violation errors the query
    rather than returning silently-lossy windows. The returned frame
    is the emitted append-mode windows, which the SQL oracle can
    reproduce EXACTLY because the late gate is plain arithmetic (no
    hash): survivors' 1 h tumbling counts. The accounting grain is
    (window, event_id) inside the stream — see
    streaming/runner.run_watermark_drop_accounting for why partial
    aggregation makes any coarser grain's drop counter count partials,
    not rows."""
    from ..streaming import runner
    ev = load_table(spark, sf_dir, "events")
    rep = runner.run_watermark_drop_accounting(spark, ev, n_files=6)
    stats = rep["stats"]
    if rep["dropped"] != stats["n_late"]:
        raise AssertionError(
            f"watermark drop accounting: dropped {rep['dropped']} != "
            f"injected {stats['n_late']}")
    if rep["out_rows"] + rep["dropped"] != stats["n_rows"]:
        raise AssertionError(
            f"conservation violated: {rep['out_rows']} out + "
            f"{rep['dropped']} dropped != {stats['n_rows']} in")
    return spark.createDataFrame(
        [(r["ws_us"], r["cnt"]) for r in rep["result"]],
        "ws_us long, cnt long")


# ---------------------------------------------------------------------------
# Round-robin source interleave (deterministic mixture schedule)
# ---------------------------------------------------------------------------

@query("data_interleave_sources", oracle="""
WITH r AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS rn
  FROM documents)
SELECT doc_id, source, rn,
       CAST(ROW_NUMBER() OVER (ORDER BY rn, source) AS BIGINT) AS pos
FROM r
""")
def data_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave of the corpus's sources —
    the mixture SCHEDULE complement of data_mix_temperature's mixture
    RATIOS: position pos visits sources in rotation (rank-1 rows of
    every source first, in source order, then rank-2, ...), the
    classic alternating-dataset training order. The global position is
    computed ARITHMETICALLY, not with a global sort: with per-source
    counts c_s (a one-row broadcast array, |sources| entries),

        pos(rn, s) = Σ_s' [ min(rn-1, c_s') + 1{s' < s AND c_s' >= rn} ] + 1

    i.e. rows of other sources that precede this one in (rn, source)
    lexicographic order — evaluated per row by a JVM-codegen
    F.aggregate lambda over the broadcast array. The only shuffles are
    the per-source ranking window and the 1-row count aggregate; no
    single-partition global window anywhere (the data_global_index
    house rule). The oracle reproduces pos as ROW_NUMBER over
    (rn, source), which equals the formula because (rn, source) is
    unique."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rn = F.row_number().over(
        W.partitionBy("source").orderBy("doc_id")).cast("bigint")
    r = d.withColumn("rn", rn)
    counts = (d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
               .agg(F.sort_array(F.collect_list(F.struct("source", "c")))
                     .alias("arr")))
    pos = (F.aggregate(
        "arr", F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.least(F.col("rn") - 1, x["c"])
        + F.when((x["source"] < F.col("source"))
                 & (x["c"] >= F.col("rn")), 1).otherwise(0)) + 1)
    return (r.crossJoin(F.broadcast(counts))
             .select("doc_id", "source", "rn", pos.alias("pos")))


# ---------------------------------------------------------------------------
# Hidden file-metadata scan surface (_metadata)
# ---------------------------------------------------------------------------

@query("scan_file_metadata", oracle="""
SELECT CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS total_rows,
       CAST(COUNT(*) AS BIGINT) AS min_file_rows,
       CAST(COUNT(*) AS BIGINT) AS max_file_rows
FROM lineitem
""")
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's hidden `_metadata` scan columns (file_name / file_path /
    file_size — the per-file provenance surface a 100 TB landing-zone
    audit reads WITHOUT a separate file-listing job): per-file row
    counts rolled up to (n_files, total, min/max per file). The oracle
    pins the single-file fixture shape the driver runs at (every
    sf0.* table is one parquet file); the multi-file behavior — 163
    part files on the sf1p partitioned landing layout summing to the
    same total — is pinned by tests/test_plan_shape.py::
    test_scan_file_metadata_multifile_sf1p. At scale this is a pure
    metadata projection: `_metadata` comes from the file index, no
    data columns are read (ReadSchema shows only the requested
    fields)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # file_path, not file_name: part-file BASENAMES collide across the
    # partition directories of a Hive layout (found on sf1p: 163 part
    # files → 60 distinct basenames); the full path is the identity.
    per_file = (li.select(F.col("_metadata.file_path").alias("file_path"))
                  .groupBy("file_path")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    return per_file.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.min("cnt").cast("bigint").alias("min_file_rows"),
        F.max("cnt").cast("bigint").alias("max_file_rows"))


# ---------------------------------------------------------------------------
# Count-Min sketch (round 6b): the streaming frequency-estimation
# sketch, built and queried as ONE deterministic plan
# ---------------------------------------------------------------------------

_CMS_P = [131, 137, 139, 149]        # one odd multiplier per sketch row
_CMS_W = 64


def _cms_bands_col():
    from pyspark.sql import functions as F
    return F.array(*[
        F.struct(F.lit(r).alias("r"),
                 F.pmod(F.col("user_id") * _CMS_P[r] + 13 * r,
                        F.lit(_CMS_W)).alias("b"))
        for r in range(4)])


def _cms_b_sql(r: str = "r") -> str:
    cases = " ".join(f"WHEN {i} THEN {p}" for i, p in enumerate(_CMS_P))
    return f"(user_id * (CASE {r} {cases} END) + 13 * {r}) % {_CMS_W}"


@query("agg_count_min_sketch", oracle=f"""
WITH ev AS (SELECT user_id FROM events),
rs AS (SELECT unnest(generate_series(0, 3)) AS r),
rows_ AS (SELECT r, {_cms_b_sql()} AS b FROM ev, rs),
cells AS (SELECT r, b, COUNT(*) AS c FROM rows_ GROUP BY r, b),
keys AS (SELECT user_id, COUNT(*) AS true_cnt FROM ev GROUP BY user_id),
kb AS (SELECT user_id, true_cnt, r, {_cms_b_sql()} AS b FROM keys, rs)
SELECT user_id, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(MIN(c) AS BIGINT) AS cms_est,
       CAST(MIN(c) - true_cnt AS BIGINT) AS overestimate
FROM kb JOIN cells USING (r, b)
GROUP BY user_id, true_cnt ORDER BY user_id
""")
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH end to end: build the d=4 × w=64 cell table
    (one shuffle on (row, bucket) — at most d·w = 256 groups however
    large the input), then answer every key's frequency query as
    min over rows of cell(r, h_r(key)). The hash family is portable
    integer arithmetic (odd multiplier + row offset, mod w) so the
    ENTIRE sketch — cells and estimates — is re-derived by the oracle;
    the output exposes the sketch's defining one-sided error:
    overestimate = est − true ≥ 0 always (collisions only ADD).

    Scale shape: the cell table is a bounded post-aggregate (256 rows)
    and is explicitly broadcast for the query join — the same
    aggregate-then-broadcast pattern as the q18 plan pass; the
    estimate never scans raw data a second time. At 100 TB, cells
    come from one map-side-combined pass and the min-query is free."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    bands = _cms_bands_col()
    cells = (ev.select(F.explode(bands).alias("e"))
               .select("e.r", "e.b")
               .groupBy("r", "b").agg(F.count(F.lit(1)).alias("c")))
    keys = (ev.groupBy("user_id")
              .agg(F.count(F.lit(1)).cast("long").alias("true_cnt")))
    est = (keys.select("user_id", "true_cnt", F.explode(bands).alias("e"))
               .select("user_id", "true_cnt", "e.r", "e.b")
               .join(F.broadcast(cells), ["r", "b"])
               .groupBy("user_id", "true_cnt")
               .agg(F.min("c").cast("long").alias("cms_est")))
    return (est.withColumn("overestimate",
                           (F.col("cms_est") - F.col("true_cnt"))
                           .cast("long"))
               .orderBy("user_id"))


@query("agg_frequency_moments", oracle="""
WITH per AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY event_type, user_id)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS f0,
       CAST(SUM(cnt) AS BIGINT) AS f1,
       CAST(SUM(cnt * cnt) AS BIGINT) AS f2
FROM per GROUP BY event_type ORDER BY event_type
""")
def agg_frequency_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENCY MOMENTS per stream (AMS): F0 = distinct keys, F1 =
    stream length, F2 = Σ count² — F2 IS the self-join size, the
    quantity every join-size estimator and skew detector wants, and
    the one the AMS sketch approximates at scale. Here computed exact
    in two hash aggregates (per-key partial → moment rollup); the
    exact two-pass is the 100 TB fallback when ±ε isn't acceptable,
    and the oracle for any sketched variant."""
    per = (load_table(spark, sf_dir, "events")
           .groupBy("event_type", "user_id")
           .agg(F.count(F.lit(1)).alias("cnt")))
    return (per.groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("long").alias("f0"),
                    F.sum("cnt").cast("long").alias("f1"),
                    F.sum(F.col("cnt") * F.col("cnt")).cast("long")
                     .alias("f2"))
               .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (round 6b): embedding
# dimensionality reduction with a portable seeded sign matrix
# ---------------------------------------------------------------------------

from ..functions.exact import dsum, dsum_sql  # noqa: E402

_JL_K = 8


def _jl_sql_proj(j: int) -> str:
    return dsum_sql(
        f"CASE WHEN (i * 131 + {j} * 17) % 2 = 0 "
        f"THEN CAST(v AS DOUBLE) ELSE -CAST(v AS DOUBLE) END")


@query("vec_random_projection_jl", oracle=f"""
WITH ex AS (
  SELECT vec_id,
         unnest(generate_series(0, len(embedding) - 1)) AS i,
         unnest(embedding) AS v
  FROM embeddings)
SELECT vec_id,
  {", ".join(f"{_jl_sql_proj(j)} AS p{j}" for j in range(_JL_K))}
FROM ex GROUP BY vec_id ORDER BY vec_id
""")
def vec_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOHNSON–LINDENSTRAUSS sign projection: 64-d embeddings → 8-d
    via a ±1 matrix (Achlioptas' database-friendly construction —
    sign(i, j) from a portable integer hash of the coordinate pair, so
    no RNG, no stored matrix, and the oracle re-derives every output).
    The prep step that makes downstream ANN/bucketing cheap at 100 TB:
    8 doubles ride the shuffle instead of 64 floats.

    Exactness: components sum through the decimal-exact path (dsum),
    so the fold order — Spark's hash-agg partials vs DuckDB's unnest
    scan — cannot flip a low bit. Plan: one posexplode (bounded ×64
    fan-out) + one hash aggregate computing all 8 components in a
    single pass."""
    ex = (load_table(spark, sf_dir, "embeddings")
          .select("vec_id", F.posexplode("embedding").alias("i", "v")))
    sign = [F.when(F.pmod(F.col("i") * 131 + j * 17, F.lit(2)) == 0,
                   F.lit(1.0)).otherwise(F.lit(-1.0))
            for j in range(_JL_K)]
    return (ex.groupBy("vec_id")
              .agg(*[dsum(F.col("v").cast("double") * sign[j])
                     .alias(f"p{j}") for j in range(_JL_K)])
              .orderBy("vec_id"))


@query("vocab_char_trigrams", oracle="""
WITH t AS (
  SELECT lower(text) AS t FROM documents WHERE length(lower(text)) >= 3),
g AS (
  SELECT substr(t, CAST(p AS INT), 3) AS g
  FROM (SELECT t, unnest(generate_series(1, length(t) - 2)) AS p FROM t))
SELECT g AS trigram, CAST(COUNT(*) AS BIGINT) AS n
FROM g GROUP BY g ORDER BY n DESC, g LIMIT 100
""")
def vocab_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character TRIGRAM vocabulary (top-100): the language-ID /
    BPE-seeding statistic — every overlapping 3-char window of the
    lowercased corpus, counted. Spark side is one bounded transform
    (len−2 substrings per doc, executor-side) + one hash aggregate +
    a total-order top-k (count desc, trigram asc — the registry
    tiebreak rule, so LIMIT is deterministic cross-engine)."""
    t = (load_table(spark, sf_dir, "documents")
         .select(F.lower("text").alias("t"))
         .filter(F.length("t") >= 3))
    tri = t.select(F.explode(F.expr(
        "transform(sequence(1, length(t) - 2), p -> substring(t, p, 3))"))
        .alias("trigram"))
    return (tri.groupBy("trigram")
               .agg(F.count(F.lit(1)).alias("n"))
               .orderBy(F.desc("n"), F.asc("trigram"))
               .limit(100))


# ---------------------------------------------------------------------------
# K-minimum-values distinct sketch (round 6b): completes the sketch
# trio — CMS (frequency), KMV (distinct), AMS (moments)
# ---------------------------------------------------------------------------

_KMV_K = 32
# portable Knuth multiplicative hash → (0, 1] uniform-ish fraction;
# same family as data_split_hash (q_llm.py), bijective on the key
# range so rank ties cannot occur within a stream
_KMV_H = "(((user_id % 1000003) * 2654435761) % 1000003 + 1) / 1000003.0"


@query("agg_kmv_distinct_sketch", oracle=f"""
WITH keys AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, {_KMV_H} AS hv,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {_KMV_H}, user_id) AS rn
  FROM keys),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_true,
         MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS hk
  FROM h GROUP BY event_type)
SELECT event_type, CAST(n_true AS BIGINT) AS n_distinct_true,
       CASE WHEN n_true < {_KMV_K} THEN CAST(n_true AS DOUBLE)
            ELSE ({_KMV_K} - 1) / hk END AS kmv_est
FROM agg ORDER BY event_type
""")
def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MINIMUM-VALUES distinct sketch (Bar-Yossef et al.): hash every
    key to (0, 1], keep the k = 32 smallest per group; if the group has
    fewer than k keys the sketch IS exact, else estimate = (k−1)/h_(k).
    The mergeable-distinct primitive (union sketches = merge smallest-k
    sets) that HLL refines; the portable Knuth hash makes the WHOLE
    estimate oracle-re-derivable, and the output carries the true
    distinct count so the estimate's error is visible, not asserted.

    Scale shape: one distinct shuffle (the unavoidable one) + a
    per-group top-k window over ≤ |distinct| rows; merge-at-k keeps
    sketch state at 32 doubles per group however large the input."""
    from pyspark.sql import Window as W
    k = _KMV_K
    hv = ((F.col("user_id") % 1000003) * F.lit(2654435761)
          % 1000003 + 1) / 1000003.0
    keys = (load_table(spark, sf_dir, "events")
            .select("event_type", "user_id").distinct()
            .withColumn("hv", hv))
    w = W.partitionBy("event_type").orderBy("hv", "user_id")
    h = keys.withColumn("rn", F.row_number().over(w))
    agg = (h.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_true"),
                 F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("hk")))
    return (agg.select(
                "event_type",
                F.col("n_true").cast("long").alias("n_distinct_true"),
                F.when(F.col("n_true") < k,
                       F.col("n_true").cast("double"))
                 .otherwise(F.lit(float(k - 1)) / F.col("hk"))
                 .alias("kmv_est"))
               .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Training-data curation (round 6b): domain capping + length-bucket
# batching — the two balancing passes every corpus mix runs
# ---------------------------------------------------------------------------

_CAP_N = 8
_CAP_H = "((doc_id % 1000003) * 2654435761) % 1000003"


@query("data_domain_cap", oracle=f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_CAP_H}, doc_id) AS pick_rank,
         COUNT(*) OVER (PARTITION BY source) AS n_source
  FROM documents)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(pick_rank AS BIGINT) AS pick_rank,
       CAST(n_source AS BIGINT) AS n_source
FROM ranked WHERE pick_rank <= {_CAP_N}
ORDER BY source, pick_rank
""")
def data_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN CAPPING — the anti-domination pass of every corpus mix
    (no single source may contribute more than N documents): rank each
    source's docs by a portable Knuth hash (deterministic 'random'
    pick, no RNG, stable across engines and reruns) and keep the first
    N. Carries n_source so the capped/uncapped regimes are both
    visible in the output. One shuffle on source; rank-and-filter is
    the same window the per-group top-k uses — at 100 TB the hash
    ranking means the kept set is stable under re-partitioning,
    unlike any first-N-encountered scheme."""
    h = ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 1000003
    w = W.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = (load_table(spark, sf_dir, "documents")
              .select("source", "doc_id", "n_chars")
              .withColumn("pick_rank", F.row_number().over(w))
              .withColumn("n_source",
                          F.count(F.lit(1)).over(
                              W.partitionBy("source"))))
    return (ranked.filter(F.col("pick_rank") <= _CAP_N)
                  .select("source", "doc_id",
                          F.col("n_chars").cast("long").alias("n_chars"),
                          F.col("pick_rank").cast("long").alias("pick_rank"),
                          F.col("n_source").cast("long").alias("n_source"))
                  .orderBy("source", "pick_rank"))


_LB_W = 128


@query("data_length_buckets", oracle=f"""
SELECT CAST(((n_chars + {_LB_W} - 1) // {_LB_W}) * {_LB_W} AS BIGINT)
         AS bucket_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS payload_chars,
       CAST(SUM(((n_chars + {_LB_W} - 1) // {_LB_W}) * {_LB_W} - n_chars)
            AS BIGINT) AS padding_waste
FROM documents
GROUP BY bucket_len ORDER BY bucket_len
""")
def data_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKET BATCHING audit: round every document up to the
    next 128-char bucket (the fixed-shape batch a trainer pads to) and
    report per-bucket doc counts, real payload, and PADDING WASTE —
    the number that decides whether length-grouped batching is worth
    the shuffle (waste = compute burned on pad tokens). Pure integer
    ceil-division on both engines (Spark DIV ≡ DuckDB //), one hash
    aggregate, exact at any scale."""
    b = (F.expr(f"(n_chars + {_LB_W} - 1) DIV {_LB_W}") * _LB_W)
    return (load_table(spark, sf_dir, "documents")
            .select(F.col("n_chars"), b.alias("bucket_len"))
            .groupBy("bucket_len")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("payload_chars"),
                 F.sum(F.col("bucket_len") - F.col("n_chars"))
                  .cast("long").alias("padding_waste"))
            .select(F.col("bucket_len").cast("long").alias("bucket_len"),
                    "n_docs", "payload_chars", "padding_waste")
            .orderBy("bucket_len"))


@query("win_rolling_iqr_anomaly", oracle="""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN isnan(value) THEN NULL ELSE value END AS v
  FROM events)
SELECT event_id, user_id,
       ROUND(quantile_cont(v, 0.5) OVER w, 6) AS med,
       ROUND(quantile_cont(v, 0.75) OVER w
             - quantile_cont(v, 0.25) OVER w, 6) AS iqr,
       COALESCE(ABS(v - quantile_cont(v, 0.5) OVER w)
                > 1.5 * (quantile_cont(v, 0.75) OVER w
                         - quantile_cont(v, 0.25) OVER w),
                false) AS is_anomaly
FROM g
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 50 PRECEDING AND 50 FOLLOWING)
""")
def win_rolling_iqr_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ROBUST-IQR anomaly flag — the Tukey-fence twin of the
    rolling-median artifact rule: |x − rolling_median| > 1.5 × rolling
    IQR over a 101-row centered frame. Quartiles come from the exact
    interpolating percentile as a WINDOW function (Spark `percentile`
    ≡ DuckDB `quantile_cont`, bit-identical interpolation arithmetic),
    so unlike a rolling MAD — whose deviation column depends on each
    frame's own median and cannot be a plain window expression — the
    whole statistic stays JVM-side, one sort per user partition, no
    Python. Flag COALESCEd to false (registry boolean house rule).
    NaN is mapped to NULL BEFORE the window (round-7 nulls sweep,
    same divergence as agg_percentile: Spark's percentile sorts NaN
    greatest, DuckDB's quantile_cont propagates it — a single NaN in
    any 101-row frame poisoned every quartile differently per engine);
    a NaN row itself then gets is_anomaly = false via the COALESCE."""
    ev = load_table(spark, sf_dir, "events")
    v = F.expr("CASE WHEN isnan(value) THEN NULL ELSE value END")
    g = ev.select("event_id", "user_id", "ts", v.alias("v"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-50, 50))
    med = F.expr("percentile(v, 0.5)").over(w)
    q1 = F.expr("percentile(v, 0.25)").over(w)
    q3 = F.expr("percentile(v, 0.75)").over(w)
    return g.select(
        "event_id", "user_id",
        F.round(med, 6).alias("med"),
        F.round(q3 - q1, 6).alias("iqr"),
        F.coalesce(F.abs(F.col("v") - med) > 1.5 * (q3 - q1),
                   F.lit(False)).alias("is_anomaly"))


# ---------------------------------------------------------------------------
# Parquet footer introspection (round 6b): the stats pruning trusts,
# cross-checked against full-scan truth
# ---------------------------------------------------------------------------

_FOOTER_SCHEMA = ("path string, n_row_groups int, n_rows long, "
                  "min_orderkey long, max_orderkey long")


def _footer_kernel(batches):
    """pyarrow FOOTER-ONLY read per file (no data pages touched): one
    row per file with row-group count, row total, and the l_orderkey
    min/max stats — the exact bytes a partition pruner consults."""
    import pandas as pd
    import pyarrow.parquet as pq
    for pdf in batches:
        rows = []
        for p in pdf["path"]:
            local = p[7:] if str(p).startswith("file://") else str(p)
            md = pq.ParquetFile(local).metadata
            lo = hi = None
            nrows = 0
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                nrows += rg.num_rows
                for i in range(rg.num_columns):
                    c = rg.column(i)
                    if c.path_in_schema == "l_orderkey":
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            rows.append({"path": p, "n_row_groups": md.num_row_groups,
                         "n_rows": nrows, "min_orderkey": lo,
                         "max_orderkey": hi})
        out = pd.DataFrame(rows, columns=["path", "n_row_groups", "n_rows",
                                          "min_orderkey", "max_orderkey"])
        out["n_row_groups"] = out["n_row_groups"].astype("int32")
        yield out


@query("scan_parquet_footer_stats", oracle="""
SELECT CAST(1 AS BIGINT) AS n_files,
       CAST(1 AS BIGINT) AS n_row_groups,
       CAST(COUNT(*) AS BIGINT) AS total_rows,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
FROM lineitem
""")
def scan_parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET FOOTER introspection — read ONLY the metadata every
    min/max pruner trusts (pyarrow footer parse in a mapInPandas
    stage over the distinct file list; zero data pages touched) and
    assert it against full-scan truth: the footer's row total and
    l_orderkey min/max must equal the view's COUNT/MIN/MAX. A writer
    that mis-stats a column would silently break pruning everywhere —
    this op is the audit that catches it. The oracle pins the
    single-file driver fixture (1 file / 1 row group, like
    scan_file_metadata); multi-file behavior on the 163-part sf1p
    landing layout is pinned in tests/test_plan_shape.py. At 100 TB
    this runs ~8 KB of footer per file, parallel over the manifest —
    the cheapest possible audit of the lake's pruning substrate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    files = (li.select(F.col("_metadata.file_path").alias("path"))
               .distinct())
    per_file = files.mapInPandas(_footer_kernel, schema=_FOOTER_SCHEMA)
    return per_file.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_row_groups").cast("long").alias("n_row_groups"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.min("min_orderkey").cast("long").alias("min_orderkey"),
        F.max("max_orderkey").cast("long").alias("max_orderkey"))
