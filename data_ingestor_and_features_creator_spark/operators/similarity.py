"""Embedding similarity search (SURVEY.md §2.11): brute-force cosine
top-k as the exact baseline, random-hyperplane LSH as the scale path.

Vector math stays JVM-side: ``zip_with`` + ``aggregate`` fold the dot
product inside whole-stage codegen — no Python UDF, no collect. The
float32 elements are cast to double *before* multiplication and folded
left-to-right, which makes the result bit-identical to DuckDB's
``list_reduce(list_transform(list_zip(...)))`` oracle twin.

Scale notes (100 TB design):
- Brute force is O(|Q|·|C|): correct only when the query side is small
  enough to broadcast. The corpus side streams — one pass, no shuffle
  of the corpus, ranking via per-query top-k window.
- LSH replaces the cross join with an equi-join on (table, bucket):
  corpus signatures are computed once (one scan), the join shuffles
  only bucket keys, and re-ranking touches ~|bucket| candidates per
  query. More tables ⇒ higher recall, linear cost in signatures only.
- Hyperplanes come from a fixed-seed RNG baked into the plan as
  literals: deterministic across runs/executors (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

LSH_SEED = 1234
# 4 bits × 8 tables: for a cos≈0.4 neighbor, per-table collision is
# (1−θ/π)⁴ ≈ 0.16 → union recall ≈ 0.75. 8 bits halved recall to ~0.1
# on the near-isotropic fixture embeddings; real corpora with cluster
# structure can raise bits for finer buckets (cost: recall ∝ tables).
LSH_BITS = 4
LSH_TABLES = 8
DIM = 64


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ with double casts inside the product lambda."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def knn_bruteforce(queries: DataFrame, corpus: DataFrame, k: int,
                   id_q: str = "qid", id_c: str = "cid") -> DataFrame:
    """Exact cosine top-k: broadcast the query side across the corpus
    scan, rank per query. Ties broken by candidate id so the result is
    a deterministic total order.

    CONTRACT: the query side MUST be bounded (a query batch, not a
    table that scales with SF) — the scoring join is non-equi, so
    without a broadcast build side the plan degenerates to a cartesian
    product; the static hint here is therefore structural, not a size
    guess. Callers make the bound mechanically visible with a
    deterministic ``.limit`` (tools/scan_broadcast_hints.py enforces
    that every hinted subtree is cardinality-bounded)."""
    q = queries.select(F.col("vec_id").alias(id_q),
                       F.col("embedding").alias("qe"))
    c = corpus.select(F.col("vec_id").alias(id_c),
                      F.col("embedding").alias("ce"))
    cos = dot("qe", "ce") / (l2_norm("qe") * l2_norm("ce"))
    ranked = (c.join(F.broadcast(q), F.col(id_q) != F.col(id_c))
               .withColumn("__cos", cos)
               .withColumn("rnk", F.row_number().over(
                   W.partitionBy(id_q).orderBy(F.desc("__cos"), F.col(id_c)))))
    return (ranked.filter(F.col("rnk") <= k)
                  .select(id_q, id_c, F.round("__cos", 6).alias("cosine"), "rnk"))


def _hyperplanes(tables: int = LSH_TABLES, bits: int = LSH_BITS,
                 dim: int = DIM, seed: int = LSH_SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((tables, bits, dim))


def lsh_buckets(df: DataFrame, tables: int = LSH_TABLES, bits: int = LSH_BITS,
                dim: int = DIM, seed: int = LSH_SEED) -> DataFrame:
    """(vec_id, table, bucket): sign-of-projection bits packed into an
    int bucket id per hash table.

    Arrow `mapInPandas` kernel: each batch projects its embedding
    matrix onto every hyperplane with a PER-DIMENSION left-to-right
    accumulation (``acc = acc + E[:, j] * plane[j]``) — elementwise
    float64 IEEE ops in the exact order the SQL oracle's
    ``list_reduce`` fold uses, so the projection (hence the sign,
    hence the bucket) is bit-identical to the DuckDB twin built from
    the same seed. Two earlier forms were slower: plan-literal
    unrolling (~2048 `lit`s → ~8 s analysis/codegen per fresh plan)
    and a broadcast plane-table join (|vecs|×tables·bits row fan-out,
    interpreted higher-order folds, plus a reassembly shuffle —
    ~1.4 s for 2k×32 at sf0.1). The kernel is one narrow map stage:
    no fan-out, no shuffle, numpy-vectorized across the batch."""
    planes = _hyperplanes(tables, bits, dim, seed)
    flat = planes.reshape(tables * bits, -1).astype(np.float64)
    weights = (1 << np.arange(bits)).astype(np.int64)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            em = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n, d = em.shape
            sig = np.empty((n, tables * bits), dtype=np.int64)
            for r in range(tables * bits):
                acc = np.zeros(n)
                for j in range(d):
                    acc = acc + em[:, j] * flat[r, j]
                sig[:, r] = acc > 0
            buckets = sig.reshape(n, tables, bits) @ weights  # (n, tables)
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), tables),
                "table": np.tile(np.arange(tables, dtype=np.int32), n),
                "bucket": buckets.reshape(-1).astype(np.int32),
            })

    return (df.select("vec_id", "embedding")
              .mapInPandas(kernel, "vec_id long, table int, bucket int"))


# Near-dup self-join wants FINER buckets than query-style kNN: the
# join is corpus×corpus, so expected bucket size N/2^bits bounds the
# pair fan-out (bits should grow ~log₂N at scale; 8 bits ⇒ 256 buckets
# per table). Fewer tables than kNN — near-dups (high cos) collide
# per-table with prob (1−θ/π)^bits, much higher than for cos≈0.4
# neighbors, so 4 tables recover most of them.
NEARDUP_BITS = 8
NEARDUP_TABLES = 4


def lsh_near_dup_pairs(df: DataFrame, threshold: float = 0.4,
                       tables: int = NEARDUP_TABLES,
                       bits: int = NEARDUP_BITS, dim: int = DIM,
                       seed: int = LSH_SEED,
                       max_bucket: int | None = 1000) -> DataFrame:
    """Approximate near-dup pairs over the WHOLE corpus (no blocking
    key needed — this is the scale path past `dedup_embedding_cosine`'s
    label-blocked exact join): bucket by sign-of-projection per table,
    self-join on (table, bucket), exact-cosine verify ≥ threshold.

    Precision is exact (the verify recomputes true cosine); recall is
    the union over tables of per-table collision probability — 1.0 for
    identical vectors, decaying with angle. ``max_bucket`` is the same
    skew valve as textops.candidate_pairs: a degenerate bucket of m
    vectors emits m² candidates, so drop buckets past the cap (window
    count, one shuffle). The bucket table is cached — both sides of
    the self-join are separate plan branches."""
    b = lsh_buckets(df, tables, bits, dim, seed)
    if max_bucket is not None:
        w = W.partitionBy("table", "bucket")
        b = (b.withColumn("__bc", F.count(F.lit(1)).over(w))
              .filter(F.col("__bc") <= max_bucket).drop("__bc"))
    b = b.cache()
    left = b.select(F.col("vec_id").alias("a"), "table", "bucket")
    right = b.select(F.col("vec_id").alias("b"), "table", "bucket")
    cand = (left.join(right, ["table", "bucket"])
                .filter(F.col("a") < F.col("b"))
                .select("a", "b").distinct())
    # Norms once per VECTOR, not per pair: sqrt(dot(x,x)) is the same
    # double either way, so the oracle's per-pair form still matches
    # bit-for-bit while the join evaluates one fold per pair, not 3.
    x = df.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"),
                  l2_norm("embedding").alias("na"))
    y = df.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"),
                  l2_norm("embedding").alias("nb"))
    cos = dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (cand.join(x, "a").join(y, "b")
                .withColumn("__cos", cos)
                .filter(F.col("__cos") >= threshold)
                .select("a", "b", F.round("__cos", 6).alias("cosine")))


def knn_lsh(queries: DataFrame, corpus: DataFrame, k: int,
            tables: int = LSH_TABLES, bits: int = LSH_BITS,
            dim: int = DIM, seed: int = LSH_SEED) -> DataFrame:
    """Approximate top-k: candidates share ≥1 (table, bucket) with the
    query, then exact cosine re-rank. Union-of-tables candidate set via
    distinct on the pair."""
    qb = (lsh_buckets(queries, tables, bits, dim, seed)
          .select(F.col("vec_id").alias("qid"), "table", "bucket"))
    cb = (lsh_buckets(corpus, tables, bits, dim, seed)
          .select(F.col("vec_id").alias("cid"), "table", "bucket"))
    cand = (qb.join(cb, ["table", "bucket"])
              .filter(F.col("qid") != F.col("cid"))
              .select("qid", "cid").distinct())
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    c = corpus.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    cos = dot("qe", "ce") / (l2_norm("qe") * l2_norm("ce"))
    # equi join on qid: the query side EARNS its broadcast from runtime
    # bytes via AQE (round-10 hint demotion — a query set sized as a
    # corpus sample scales with SF, so a static hint would force a
    # driver-side hash relation of a grown side at cluster scale).
    ranked = (cand.join(q, "qid").join(c, "cid")
                  .withColumn("__cos", cos)
                  .withColumn("rnk", F.row_number().over(
                      W.partitionBy("qid").orderBy(F.desc("__cos"), F.col("cid")))))
    return (ranked.filter(F.col("rnk") <= k)
                  .select("qid", "cid", F.round("__cos", 6).alias("cosine"), "rnk"))


def knn_ivf(queries: DataFrame, corpus: DataFrame, k: int,
            n_centroids: int = 16, n_probe: int = 2,
            seed: int = 7) -> DataFrame:
    """IVF-style approximate top-k (the third scale path next to
    brute force and LSH): a seeded KMeans coarse quantizer buckets the
    corpus by nearest centroid; each query probes its ``n_probe``
    nearest centroids and re-ranks the probed lists exactly.

    At 100 TB the centroid table is a broadcast join and each probe
    touches ~n_probe/n_centroids of the corpus, partition-pruned by
    centroid id. The quantizer is fit on the CORPUS only — callers may
    pass any query set (including synthetic eval queries) without
    perturbing the index. Returns (qid, cid, cosine, rnk), rank by
    (cos desc, cid) like the brute-force baseline."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select("vec_id", "embedding",
                         array_to_vector("embedding").alias("features"))
    km = KMeans(k=n_centroids, seed=seed, maxIter=10,
                featuresCol="features")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
        F.col("prediction").alias("centroid"))
    centroids = [(i, [float(x) for x in c])
                 for i, c in enumerate(model.clusterCenters())]
    # .limit = no-op bound (exactly n_centroids rows by construction)
    # that makes the broadcast side's cardinality mechanically visible
    # to tools/scan_broadcast_hints.py.
    cdf = corpus.sparkSession.createDataFrame(
        centroids, "centroid int, cvec array<double>").limit(n_centroids)
    q = queries.select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qe"))
    # distance of each query to each centroid → keep n_probe nearest.
    # Probing the query's nearest centroids guarantees a vector
    # IDENTICAL to a corpus vector finds its source: the source sits
    # in its own nearest-centroid list, which is also the query's
    # nearest (same vector, same metric) — the determinism the
    # sim_ivf_ann planted eval relies on.
    qc = (q.crossJoin(F.broadcast(cdf))
           .withColumn("d2", F.aggregate(
               F.zip_with("qe", "cvec",
                          lambda x, c: (x.cast("double") - c) ** 2),
               F.lit(0.0), lambda a, x: a + x))
           .withColumn("rk", F.row_number().over(
               W.partitionBy("qid").orderBy("d2", "centroid")))
           .filter(F.col("rk") <= n_probe).select("qid", "qe", "centroid"))
    cos = dot("qe", "ce") / (l2_norm("qe") * l2_norm("ce"))
    ranked = (qc.join(assigned, "centroid")
                .filter(F.col("qid") != F.col("cid"))
                .withColumn("__cos", cos)
                .withColumn("rnk", F.row_number().over(
                    W.partitionBy("qid").orderBy(F.desc("__cos"),
                                                 F.col("cid")))))
    return (ranked.filter(F.col("rnk") <= k)
                  .select("qid", "cid", F.round("__cos", 6).alias("cosine"),
                          "rnk"))
