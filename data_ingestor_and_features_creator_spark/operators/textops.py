"""Text-pipeline building blocks (SURVEY.md §2.11): tokenization,
shingling, MinHash signatures, LSH banding, Jaccard verification.

All pure DataFrame/Column transforms — the whole dedup pipeline stays
JVM-side (xxhash64, transform/aggregate, hash-partitioned groupBy);
no Python UDF anywhere.

Scale notes (100 TB design):
- Shingles are ``array_distinct``-ed per doc *before* the explode, so
  the explode fan-out is bounded by distinct-shingle count, and the
  signature groupBy aggregates partially map-side.
- The LSH band join is an equi-join on (band, band_hash) — a plain
  shuffle-hash join; hot buckets (boilerplate-heavy corpora) should be
  capped with a per-bucket count guard before pairing (see
  ``candidate_pairs`` max_bucket), which is the standard skew valve.
- MinHash seeds are explicit constants: signatures are reproducible
  across runs/clusters (SURVEY.md §4 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

MINHASH_K = 16          # signature length
LSH_BANDS = 8           # bands × rows_per_band == MINHASH_K
ROWS_PER_BAND = MINHASH_K // LSH_BANDS


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture texts are single-space joined)."""
    return F.split(col, r"\s+")


def shingles(tok: Column, k: int = 3) -> Column:
    """k-token shingles as strings; docs shorter than k yield one
    (whole-doc) shingle. ``sequence`` end is clamped to ≥1 because
    Spark sequences *descend* when start > stop."""
    n = F.greatest(F.lit(1), F.size(tok) - F.lit(k - 1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(tok, i, k)),
    )


def minhash_signature(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = MINHASH_K,
                      shingle_len: int = 3) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min over the doc's distinct shingles of
    k seeded xxhash64 families — one explode + one partial-agg groupBy."""
    sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(text_col), shingle_len)))
         .alias("__shingle"),
    )
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("__shingle"))).alias(f"sig_{i}")
            for i in range(k)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str = "doc_id",
              bands: int = LSH_BANDS, rows: int = ROWS_PER_BAND) -> DataFrame:
    """Explode the signature into (id, band, band_hash) rows — one row
    per band, hash of that band's signature slice."""
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"sig_{b * rows + r}") for r in range(rows)])
             .alias("band_hash"),
        )
        for b in range(bands)
    ]
    return (sig.select(id_col, F.explode(F.array(*entries)).alias("e"))
               .select(id_col, "e.band", "e.band_hash"))


def candidate_pairs(band_df: DataFrame, id_col: str = "doc_id",
                    max_bucket: int | None = 1000) -> DataFrame:
    """Distinct (a, b) a<b pairs sharing ≥1 LSH bucket. ``max_bucket``
    drops degenerate buckets (the skew valve: a bucket of m docs emits
    m² pairs; boilerplate corpora need this bounded).

    The bucket-size guard is a window count (one shuffle on the bucket
    key), NOT a groupBy+join — and the band table is cached before the
    self-join: both sides of a self-join are separate plan branches, so
    without the cache the entire upstream (shingles → MinHash → bands)
    executes once per branch. Observed 6× recomputation of the
    signature pipeline before these two changes."""
    if max_bucket is not None:
        w = W.partitionBy("band", "band_hash")
        band_df = (band_df.withColumn("__bc", F.count(F.lit(1)).over(w))
                          .filter(F.col("__bc") <= max_bucket)
                          .drop("__bc"))
    band_df = band_df.cache()
    left = band_df.select(F.col(id_col).alias("a"), "band", "band_hash")
    right = band_df.select(F.col(id_col).alias("b"), "band", "band_hash")
    return (left.join(right, ["band", "band_hash"])
                .filter(F.col("a") < F.col("b"))
                .select("a", "b").distinct())


def jaccard_verify(pairs: DataFrame, docs: DataFrame, threshold: float,
                   id_col: str = "doc_id", text_col: str = "text",
                   shingle_len: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps ≥ threshold.
    Shingle sets are arrays per doc (bounded by doc length, not corpus
    size), joined twice — both joins are equi-joins on the doc id."""
    # cached: the a- and b-side joins are separate branches that would
    # otherwise each re-shingle the corpus (same reuse hazard as the
    # candidate_pairs self-join)
    sets = docs.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(text_col), shingle_len)).alias("sh"),
    ).cache()
    a = sets.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (pairs.join(a, "a").join(b, "b")
                 .withColumn("jaccard", F.round(inter / union, 6))
                 .filter(F.col("jaccard") >= threshold)
                 .select("a", "b", "jaccard"))


def exact_dedup_keys(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Survivors of exact dedup: sha256 over normalized text, keep the
    lowest id per hash. The hash groupBy is the scale path (shuffle on
    a 64-hex key, uniformly distributed — no skew by construction)."""
    h = F.sha2(F.lower(F.trim(F.col(text_col))), 256)
    w = W.partitionBy("text_sha").orderBy(id_col)
    return (docs.withColumn("text_sha", h)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn"))
