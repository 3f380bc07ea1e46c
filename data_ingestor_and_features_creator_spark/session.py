"""SparkSession factory tuned for this engine.

Local defaults target the test harness (local[N], single JVM); every
setting is chosen to also be the right *shape* at cluster scale:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  join-strategy demotion) — essential at 100 TB where static stats lie.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
- Arrow enabled so every pandas-UDF stage is vectorized batch transfer,
  with ``maxRecordsPerBatch`` bounded so a single Arrow batch cannot
  blow executor memory on wide rows (SURVEY.md §4).
- Session timezone pinned to UTC: parquet fixture timestamps are naive;
  the DuckDB oracle is UTC-naive (pyspark_guide.md "Pitfalls").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "data_ingestor_and_features_creator_spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. In local
    mode the driver is the only JVM, so driver memory is the one heap
    knob; on a cluster the same configs apply per executor.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's default 1 MiB minPartitionSize coalesces the small local
        # fixtures to ONE post-shuffle partition, serializing the
        # CPU-heavy pandas-UDF stages onto a single core. A 64 KiB floor
        # keeps ~cores partitions locally; at cluster scale shuffle
        # blocks dwarf either floor, so this is a no-op there.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # Round 12 (VERDICT r11 ask 8, guide §6): floor the SCAN split
        # count at the core count — single-row-group fixture files
        # otherwise scan as ONE task and serialize every map-side
        # aggregate above them (fieller/ancova/tweedie family). Spark
        # only honors the floor by shrinking target split size, so at
        # cluster scale (files >> cores) it is a no-op; locally it is
        # the scan-side twin of the minPartitionSize floor above.
        # Adopted on a full-bench A/B: see OPTIMIZATION_r12.md.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # events.ts is parquet TIMESTAMP(NANOS): illegal for Spark's reader
        # (PARQUET_TYPE_ILLEGAL); read the raw int64 and convert in the
        # catalog (ns → µs floor division, matching DuckDB's ns→µs cast).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # TWO-THRESHOLD BROADCAST POSTURE (round 6): the STATIC planner
        # sees only file-size guesses — at the 100x blow-up its
        # pruned-column estimate of the 135 MB / 15M-row orders table
        # slipped under a 64 MB static threshold and EIGHT TPC-H plans
        # built a driver-side 15M-row hash relation (q18 alone paid
        # ~24 s; catastrophic on a real cluster). Static stays at
        # Spark's conservative 10 MB default so estimates can never
        # broadcast a fact table; AQE's runtime threshold stays at
        # 64 MB because it judges ACTUAL shuffle bytes after column
        # pruning — a genuinely-small side still earns its broadcast,
        # at runtime, from real sizes instead of guesses.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
    )
    # GC / JVM flags for A/B experiments (round 11: the ±25% concurrent-
    # throughput spread is G1 roulette on the shared 48 GB heap; this is
    # how a measured flag set would ship). Only effective for the FIRST
    # session in a process — the JVM is already up after that.
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
