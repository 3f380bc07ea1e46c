"""Round-8c operator additions: streaming CDC into the merge-on-read
table, WebDataset-style tar-shard scanning, and the leakage-safe
CUMULATIVE target encoder.

Provenance (SURVEY.md §0 applies — empty reference checkout):
foreachBatch CDC landing is the [SPARK] pattern the public formats
document; WebDataset tar shards are the published multimodal-training
storage convention [PK — Aizman et al.]; ordered/cumulative target
encoding is the standard time-safe variant of mean encoding [PK —
Micci-Barreca 2001's temporal form, the one online pipelines use
because it never reads the future].

House rules throughout (plans/registry.py): integer cores where
possible, string-routed decimal sums for float totals, identical
aliases, non-nullable booleans, no decimals/arrays at the boundary.

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum_str, dsum_str_sql
from ..operators import snapshots
from .registry import query, scratch_dir


# ---------------------------------------------------------------------------
# Streaming CDC into the merge-on-read table
# ---------------------------------------------------------------------------

@query("stream_mor_upsert_sink", oracle=f"""
WITH m AS (SELECT (MAX(event_id) + 1) // 4 AS q FROM events),
base AS (
  SELECT event_id, event_type, value FROM events, m
  WHERE event_id < 2 * m.q),
u1 AS (
  SELECT event_id, event_type, value + 1000.0 AS value
  FROM events, m WHERE event_id % 25 = 0 AND event_id < 2 * m.q),
u2 AS (
  SELECT event_id, event_type, value + 2000.0 AS value
  FROM events, m WHERE event_id % 25 = 7 AND event_id < 2 * m.q),
merged AS (
  SELECT * FROM base
  WHERE event_id NOT IN (SELECT event_id FROM u1)
    AND event_id NOT IN (SELECT event_id FROM u2)
  UNION ALL SELECT * FROM u1 UNION ALL SELECT * FROM u2)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_str_sql('value')} AS total_value,
       CAST(3 AS INT) AS head_version,
       CAST(2 AS INT) AS n_dv_files,
       true AS zero_rewrites
FROM merged GROUP BY event_type
""")
def stream_mor_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC INTO THE MERGE-ON-READ TABLE — the
    stream_cow_upsert_sink composition re-based on deletion vectors
    (round 8): two SCATTERED update batches (every-25th ids — matched
    rows in every data file, COW's full-rewrite worst case) replay one
    file per micro-batch through foreachBatch → merge_mor, ONE ACID
    DV-commit per batch, zero data files rewritten across the whole
    stream (hash-checked: the v1 file set survives into the head
    manifest intact, and exactly two DV sidecars accumulate — one per
    micro-batch). The final DV-applied read must equal the oracle's
    direct upsert algebra; a dropped batch, double-applied batch, or
    torn commit all move the per-type totals, and a resurrection bug
    (DVs dropped by a later commit) inflates n. At 100 TB this is the
    high-frequency-CDC landing path: per-batch write cost O(batch)
    regardless of scatter, with compaction (snapshot_mor_compact)
    deferred to maintenance windows instead of being paid inside
    every micro-batch."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "event_type", "value"))
    q = (ev.agg(F.max("event_id")).first()[0] + 1) // 4
    base_dir = scratch_dir("stream_mor")
    tdir = os.path.join(base_dir, "table")
    feed = os.path.join(base_dir, "feed")
    ckpt = os.path.join(base_dir, "ckpt")
    snapshots.commit_snapshot(
        ev.filter(F.col("event_id") < 2 * q).repartition(4, "event_id"),
        tdir, mode="overwrite")
    v1_files = set(snapshots.read_manifest(tdir, 1)["files"])
    half = ev.filter(F.col("event_id") < 2 * q)
    u1 = (half.filter(F.col("event_id") % 25 == 0)
              .withColumn("value", F.col("value") + 1000.0))
    u2 = (half.filter(F.col("event_id") % 25 == 7)
              .withColumn("value", F.col("value") + 2000.0))
    for i, batch in enumerate((u1, u2)):
        out = os.path.join(feed, f"b{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(out)
        for f in os.listdir(out):
            os.utime(os.path.join(out, f), (1_000_000 + i, 1_000_000 + i))

    def apply_batch(bdf, batch_id):
        if bdf.isEmpty():
            return
        snapshots.merge_mor(bdf.sparkSession, tdir,
                            bdf.select("event_id", "event_type", "value"),
                            "event_id")

    qy = (spark.readStream.schema(u1.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(os.path.join(feed, "*"))
          .writeStream.foreachBatch(apply_batch)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    qy.awaitTermination()
    head = snapshots.snapshot_versions(tdir)[-1]
    m = snapshots.read_manifest(tdir, head)
    zero_rewrites = v1_files <= set(m["files"])
    return (snapshots.read_snapshot(spark, tdir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum_str("value").alias("total_value"))
            .withColumn("head_version", F.lit(head).cast("int"))
            .withColumn("n_dv_files",
                        F.lit(len(m.get("dvs", []))).cast("int"))
            .withColumn("zero_rewrites", F.lit(zero_rewrites)))


# ---------------------------------------------------------------------------
# WebDataset-style tar-shard scan
# ---------------------------------------------------------------------------

@query("scan_tar_webdataset", oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes_txt,
       lang AS meta_lang,
       true AS has_both_members
FROM documents WHERE doc_id % 50 = 0
""")
def scan_tar_webdataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEBDATASET TAR-SHARD SCAN [PK — the published multimodal-
    training storage convention: samples live in tar shards, one
    member per modality, grouped by the filename's key prefix
    ('000123.txt' + '000123.json' = one sample)]: the op STAGES a
    real tar shard from every 50th document (text member + JSON
    metadata member, deterministic mtimes, members sorted), reads it
    back through Spark's binaryFile source, and parses members with
    the stdlib tarfile over an Arrow-batched mapInPandas — the
    pattern that turns 100 TB of tar shards into a DataFrame without
    a custom JVM input format: shards parallelize across the
    binaryFile partitioning (one shard = one row = one task unit),
    members never leave the executor. Sample assembly (the .txt/.json
    prefix join) happens in one groupBy on the key. The oracle derives
    the same (doc_id, byte length, metadata lang) straight from the
    documents table — a hash match proves the tar round-trip was
    lossless AND both members of every sample arrived. ASCII doc text
    (the fixture's charset) keeps length(text) = byte length on both
    engines."""
    import io
    import json as _json
    import tarfile

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 50 == 0)
            .select("doc_id", "text", "lang"))
    rows = docs.collect()  # bounded: 2% of documents, staging only
    shard = os.path.join(scratch_dir("wds_shard"), "shard-000000.tar")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            for ext, payload in (
                    ("txt", r["text"].encode()),
                    ("json", _json.dumps(
                        {"lang": r["lang"]}, sort_keys=True).encode())):
                info = tarfile.TarInfo(name=f"{r['doc_id']:09d}.{ext}")
                info.size = len(payload)
                info.mtime = 1_000_000
                tf.addfile(info, io.BytesIO(payload))
    with open(shard, "wb") as fh:
        fh.write(buf.getvalue())

    def parse_shards(batches):
        import pandas as pd
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        data = tf.extractfile(m).read()
                        out.append((int(key), ext, len(data),
                                    data.decode()))
            yield pd.DataFrame(
                out, columns=["doc_id", "ext", "n_bytes", "payload"])

    members = (spark.read.format("binaryFile")
               .load(os.path.dirname(shard))
               .select("content")
               .mapInPandas(parse_shards,
                            "doc_id long, ext string, n_bytes long, "
                            "payload string"))
    txt = (members.filter(F.col("ext") == "txt")
           .select("doc_id", F.col("n_bytes").alias("n_bytes_txt")))
    meta = (members.filter(F.col("ext") == "json")
            .select("doc_id",
                    F.get_json_object("payload", "$.lang")
                     .alias("meta_lang")))
    return (txt.join(meta, "doc_id", "full_outer")
            .select("doc_id", "n_bytes_txt", "meta_lang",
                    F.coalesce(F.col("n_bytes_txt").isNotNull()
                               & F.col("meta_lang").isNotNull(),
                               F.lit(False)).alias("has_both_members")))


# ---------------------------------------------------------------------------
# Leakage-safe CUMULATIVE target encoding
# ---------------------------------------------------------------------------

_TE_ALPHA = 5  # prior pseudo-count (integer so the core stays exact)


@query("feature_target_encoding_cumulative", oracle=f"""
WITH lab AS (
  SELECT event_id, event_type, ts,
         CASE WHEN event_type IN ('click', 'purchase')
              THEN 1 ELSE 0 END AS y
  FROM events),
g AS (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS prior FROM lab),
c AS (
  SELECT event_id, event_type, y,
         COALESCE(SUM(y) OVER w, 0) AS cum_pos,
         COALESCE(COUNT(*) OVER w, 0) AS cum_n
  FROM lab
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_id, event_type, CAST(y AS BIGINT) AS y,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CAST(cum_n AS BIGINT) AS cum_n,
       (cum_pos + {_TE_ALPHA} * g.prior) / (cum_n + {_TE_ALPHA})
         AS te_enc
FROM c, g
""")
def feature_target_encoding_cumulative(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """CUMULATIVE (time-ordered) TARGET ENCODING [PK — the temporal
    form of Micci-Barreca mean encoding; the one online/streaming
    training pipelines use]: each row's category encode uses ONLY
    STRICTLY EARLIER rows of its category — unlike
    feature_target_encoding_loo (which sees the whole column minus
    itself), this can never read the future, so the feature is valid
    for time-split training without any fold bookkeeping. Smoothing
    via an integer prior pseudo-count toward the global rate:
    enc = (cum_pos + α·prior)/(cum_n + α). INTEGER-EXACT core — the
    binary label makes both cumulative terms exact BIGINTs (a first
    category row encodes to the bare prior, 0/α·prior over α); prior
    is one IEEE division of exact ints, the encode one
    multiply-add-divide of identical operands — bit-identical
    cross-engine, emitted unrounded. Scale: ONE ordered window per
    category (the frame ends at 1 PRECEDING — no self-leak), full
    fact-sized output like every win_* op; at 100 TB the window
    shuffles once on the category key."""
    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type").isin("click", "purchase"), 1).otherwise(0)
    lab = ev.select("event_id", "event_type", "ts", y.alias("y"))
    g = lab.agg((F.sum("y").cast("double")
                 / F.count(F.lit(1))).alias("prior"))
    w = (W.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    c = lab.select(
        "event_id", "event_type", "y",
        F.coalesce(F.sum("y").over(w), F.lit(0)).alias("cum_pos"),
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).alias("cum_n"))
    return (c.crossJoin(F.broadcast(g))
            .select("event_id", "event_type",
                    F.col("y").cast("long").alias("y"),
                    F.col("cum_pos").cast("long").alias("cum_pos"),
                    F.col("cum_n").cast("long").alias("cum_n"),
                    ((F.col("cum_pos") + _TE_ALPHA * F.col("prior"))
                     / (F.col("cum_n") + _TE_ALPHA)).alias("te_enc")))
