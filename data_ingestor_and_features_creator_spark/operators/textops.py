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
    """Whitespace tokenization — SINGLE-SPACE split, the exact twin of
    every oracle's ``string_split(text, ' ')``. The round-5 form split
    on ``\\s+``, which agrees with the oracles only while the corpus is
    single-space joined; the nulls fixture's whitespace-only documents
    exposed the divergence (2 vs 6 pieces on ``'   \\n\\t  '``). Real
    corpora normalize whitespace upstream (text_normalize /
    llm_prep_pipeline_full do) — the tokenizer itself must mirror the
    oracle bit-for-bit on ANY input."""
    return F.split(col, " ")


def shingles(tok: Column, k: int = 3) -> Column:
    """k-token shingles as strings; docs shorter than k yield one
    (whole-doc) shingle. ``sequence`` end is clamped to ≥1 because
    Spark sequences *descend* when start > stop."""
    n = F.greatest(F.lit(1), F.size(tok) - F.lit(k - 1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(tok, i, k)),
    )


def shingle_sets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", shingle_len: int = 3) -> DataFrame:
    """(id, sh: array<long>) — each doc's DISTINCT shingle set, hashed
    to xxhash64 at creation. This is the one CPU-heavy text pass of the
    dedup pipeline; callers cache it at the diamond top so MinHash
    signatures AND Jaccard verify read the same materialization instead
    of re-shingling the corpus.

    Hashing inside this pass (not downstream) means every later stage —
    the cached table itself, the signature explode, and the verify's
    array_intersect/array_union — carries 8-byte longs instead of
    arbitrary-length shingle strings. Jaccard over hashed sets equals
    Jaccard over string sets up to xxhash64 collisions (~2⁻⁶⁴ per
    shingle pair — negligible against the 0.3 decision threshold)."""
    return docs.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(shingles(tokens(text_col), shingle_len),
                        lambda s: F.xxhash64(s))
        ).alias("sh"),
    )


def minhash_signature(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = MINHASH_K,
                      shingle_len: int = 3) -> DataFrame:
    """(id, sig_0..sig_{k-1}): min over the doc's distinct shingles of
    k seeded xxhash64 families — one explode + one partial-agg groupBy."""
    return minhash_from_sets(
        shingle_sets(docs, id_col, text_col, shingle_len), id_col, k=k)


def minhash_from_sets(sets: DataFrame, id_col: str = "doc_id",
                      sh_col: str = "sh", k: int = MINHASH_K) -> DataFrame:
    """MinHash over pre-built shingle sets (see ``shingle_sets``).

    Sets arrive already hashed (8-byte base value per shingle, hashed
    once in the shingling pass); the k families are derived by
    re-hashing the base — same min-over-independent-hashes semantics,
    k× fewer long-string traversals (measured 5.0 s → 2 s for the
    signature stage at sf0.1: 5k docs, ~260k shingles, k=16)."""
    base = sets.select(id_col, F.explode(sh_col).alias("__h"))
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"sig_{i}")
            for i in range(k)]
    return base.groupBy(id_col).agg(*aggs)


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
                   shingle_len: int = 3,
                   sets: DataFrame | None = None) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps ≥ threshold.
    Shingle sets are arrays per doc (bounded by doc length, not corpus
    size), joined twice — both joins are equi-joins on the doc id.

    Pass ``sets`` (a cached ``shingle_sets`` output) to reuse the
    pipeline's one shingling pass; standalone callers omit it and pay a
    semi-joined shingling restricted to docs that appear in a pair."""
    if sets is None:
        # Only docs in some candidate pair need a shingle set — semi-join
        # docs down BEFORE the CPU-heavy shingling; at LSH-sane thresholds
        # candidates are a tiny fraction of the corpus. `pairs` is cached
        # because the two id-projections plus the final join chain are
        # three branches.
        pairs = pairs.cache()
        ids = (pairs.select(F.col("a").alias(id_col))
                    .union(pairs.select(F.col("b").alias(id_col))).distinct())
        # cached: the a- and b-side joins are separate branches that would
        # otherwise each re-shingle the candidates (same reuse hazard as
        # the candidate_pairs self-join)
        sets = (shingle_sets(docs.join(ids, id_col, "left_semi"),
                             id_col, text_col, shingle_len).cache())
    a = sets.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (pairs.join(a, "a").join(b, "b")
                 .withColumn("jaccard", F.round(inter / union, 6))
                 .filter(F.col("jaccard") >= threshold)
                 .select("a", "b", "jaccard"))


SIMHASH_BITS = 64
SIMHASH_BANDS = 4          # 16-bit bands: hamming ≤ 3 ⇒ ≥1 band equal


def simhash_signature(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: explode tokens, one hash per token, and
    per bit j sum +1/−1 by whether bit j is set; the packed sign vector
    is the signature. One explode + one hash aggregate (64 narrow sum
    columns — partial map-side, same shape as the MinHash pass)."""
    tok = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("__t"),
    ).select(F.col(id_col), F.xxhash64("__t").alias("__h"))
    sums = [
        F.sum(F.when(F.shiftright("__h", j).bitwiseAND(F.lit(1)) == 1, 1)
               .otherwise(-1)).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*sums)
    packed = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, j)
        packed = term if packed is None else packed.bitwiseOR(term)
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_pairs(sig: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: split the 64-bit signature into 4
    16-bit bands (pigeonhole: hamming ≤ 3 ⇒ at least one band exactly
    equal), bucket-join on (band, value), verify with bit_count(xor).
    Same cached-diamond + equi-join shape as the MinHash path."""
    bands = [
        F.struct(F.lit(b).alias("band"),
                 F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF))
                  .alias("bv"))
        for b in range(SIMHASH_BANDS)
    ]
    banded = (sig.select(id_col, "simhash",
                         F.explode(F.array(*bands)).alias("e"))
                 .select(id_col, "simhash", "e.band", "e.bv")).cache()
    left = banded.select(F.col(id_col).alias("a"),
                         F.col("simhash").alias("sh_a"), "band", "bv")
    right = banded.select(F.col(id_col).alias("b"),
                          F.col("simhash").alias("sh_b"), "band", "bv")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (left.join(right, ["band", "bv"])
                .filter(F.col("a") < F.col("b"))
                .select("a", "b", hamming.alias("hamming")).distinct()
                .filter(F.col("hamming") <= max_hamming))


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
