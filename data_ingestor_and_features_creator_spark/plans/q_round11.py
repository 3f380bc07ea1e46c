"""Round-11 operators: the metastore-backed catalog surface
(VERDICT r10 ask 3 / "What's missing" #2).

Everything heavy lives in sources/hivecat.py (the embedded-Derby Hive
metastore round trip, run once per process in an isolated subprocess);
the registered queries read the staged parquet results back in the
caller's session so the driver contract (callable → DataFrame, SQL
oracle over the source tables) holds unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.exact import dsum_dec_str_sql
from ..sources import hivecat
from .registry import query


@query("catalog_hive_roundtrip", oracle=f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_dec_str_sql('o_totalprice')} AS sum_total,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders GROUP BY o_orderpriority
""")
def catalog_hive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIVE-METASTORE PERSISTENCE round trip [SPARK — enableHiveSupport
    / saveAsTable / spark.catalog]: session A writes ORDERS as a
    partitioned managed table into an embedded-Derby metastore and
    STOPS; a brand-new SparkSession on the same metastore must find
    the table by NAME, see every partition in SHOW PARTITIONS, and
    read back content identical to the parquet source — which is
    exactly what the SQL oracle checks (per-priority count,
    scale-robust decimal-string price total, key extremes, aggregated
    from the source directly; any loss/duplication/corruption in the
    catalog round trip breaks the hash). Runs in a subprocess with its
    own Derby dir (one-JVM lock; staging details + 100 TB notes in
    sources/hivecat.py — on a cluster the identical API surface talks
    to a shared external metastore instead of Derby)."""
    out = hivecat.ensure_staged(sf_dir)
    return spark.read.parquet(os.path.join(out, hivecat.ROUNDTRIP))


@query("catalog_hive_msck_repair", oracle="""
WITH a AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_after
           FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority,
       CAST(CASE WHEN o_orderpriority IS NOT DISTINCT FROM
                      (SELECT MAX(o_orderpriority) FROM orders)
            THEN 0 ELSE n_after END AS BIGINT) AS n_before,
       n_after
FROM a
""")
def catalog_hive_msck_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MSCK REPAIR TABLE partition recovery [SPARK/Hive DDL]: an
    EXTERNAL partitioned table is created over all but the
    lexicographically-last priority's partition directory; that late
    directory is copied in AFTER creation. The metastore — not file
    listing — governs reads: the late partition contributes 0 rows
    until MSCK REPAIR registers it (n_before; the staging subprocess
    additionally asserts the pre-repair invisibility in-line), and
    after repair every partition reads its full source count
    (n_after ≡ the oracle's per-priority counts). The "late partition
    landed after the table" flow is the daily reality of
    hourly-partition ingestion at 100 TB — MSCK is metadata-only (one
    listing + metastore inserts, no data scan)."""
    out = hivecat.ensure_staged(sf_dir)
    return spark.read.parquet(os.path.join(out, hivecat.MSCK))


@query("catalog_hive_partition_pruning", oracle=f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_dec_str_sql('o_totalprice')} AS sum_total,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
WHERE o_orderpriority IS NOT DISTINCT FROM
      (SELECT MAX(o_orderpriority) FROM orders)
GROUP BY o_orderpriority
""")
def catalog_hive_partition_pruning(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """METASTORE PARTITION PRUNING proven BEHAVIORALLY, not by plan-
    string parsing [SPARK — catalog partition filters on a Hive
    external table]: after the MSCK flow registers every partition,
    the staging subprocess DELETES every non-late partition's files
    from the table location (the metastore still lists them) and reads
    ONLY the late partition. A metastore-pruned scan never lists the
    deleted directories and returns the exact source aggregate — which
    the SQL oracle recomputes from the parquet source restricted to
    MAX(o_orderpriority); an unpruned scan would fault on the vanished
    files and fail the whole staging (gate red). This is the read-path
    payoff the catalog surface exists for: at 100 TB a partition
    filter must become a metastore listing of one partition, never a
    filesystem walk of the table."""
    out = hivecat.ensure_staged(sf_dir)
    return spark.read.parquet(os.path.join(out, hivecat.PRUNE))
