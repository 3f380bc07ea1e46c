"""Metastore-backed catalog surface (round 11, VERDICT r10 ask 3).

The engine's table-persistence story so far was the session warehouse
(`saveAsTable` + `bucketBy`, q_joins.py) and the homegrown snapshot
layer (operators/snapshots.py) — nothing proved a CATALOG that survives
the SparkSession. This module does, with the network-free embedded
Derby Hive metastore that ships in the PySpark distribution
(spark-hive / hive-metastore / derby jars verified present):

- ``catalog_hive_roundtrip``: session A writes ORDERS as a PARTITIONED
  MANAGED TABLE (`partitionBy(o_orderpriority).saveAsTable`) into a
  Derby-backed metastore, then STOPS; session B — a brand-new
  SparkSession/SparkContext on the same metastore — must find the
  table by name in `spark.catalog`, see every partition in
  SHOW PARTITIONS, and read back content identical to the parquet
  source (the SQL oracle aggregates the source directly).
- ``catalog_hive_msck_repair``: an EXTERNAL partitioned table created
  over a directory holding all but the lexicographically-last
  priority's partition; the missing partition dir is copied in AFTER
  table creation + first MSCK. The metastore — not file listing —
  governs reads (the late partition reads 0 rows until repaired:
  `n_before`), and MSCK REPAIR TABLE recovers it (`n_after` = full
  source counts, checked by the oracle).

Process isolation: the Derby metastore allows ONE JVM, and the repo's
main session is in-memory-catalog on purpose (flipping it to hive
would route every existing `saveAsTable` through a Derby lock and
deadlock the documented concurrent pytest + full-gate runs). So the
round trip runs in a SUBPROCESS with its own temp metastore +
warehouse under spark-warehouse/ (each process stages into its own
mkdtemp — concurrent gates can never contend on a Derby lock), writes
its two result tables as plain parquet, and the registered queries
read those back in the caller's session. Staged once per (process,
sf_dir) — the memo keeps repeat calls (driver retries, pytest) from
re-paying the two JVM boots.

Scale notes (100 TB): the partitioned write is one shuffle-free
columnar pass (partitionBy fan-out); MSCK is metadata-only (one
directory listing + metastore inserts, no data scan). On a real
cluster the same two queries run against a shared external metastore
(standalone Hive MS / Glue) instead of embedded Derby — the Spark API
surface (saveAsTable / spark.table / SHOW PARTITIONS / MSCK REPAIR)
is identical; embedded Derby is the documented single-JVM stand-in.
"""

from __future__ import annotations

import atexit
import os
import shutil
import subprocess
import sys
import tempfile
import urllib.parse

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_STAGE_ROOT = os.path.join(_REPO, "spark-warehouse")

# one staging per (process, sf_dir): {sf_dir: out_dir}
_STAGED: dict[str, str] = {}

ROUNDTRIP = "roundtrip.parquet"
MSCK = "msck.parquet"
PRUNE = "prune.parquet"


def ensure_staged(sf_dir: str) -> str:
    """Run the metastore round trip for ``sf_dir`` in a subprocess
    (once per process) and return the directory holding the two
    result parquets."""
    sf_dir = os.path.abspath(sf_dir)
    if sf_dir in _STAGED:
        return _STAGED[sf_dir]
    os.makedirs(_STAGE_ROOT, exist_ok=True)
    out = tempfile.mkdtemp(prefix="hivecat_", dir=_STAGE_ROOT)
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m",
         "data_ingestor_and_features_creator_spark.sources.hivecat",
         sf_dir, out],
        env=env, capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0 or not os.path.exists(
            os.path.join(out, PRUNE)):
        raise RuntimeError(
            "hivecat staging failed (rc=%s):\n%s" % (
                proc.returncode, (proc.stdout + proc.stderr)[-4000:]))
    _STAGED[sf_dir] = out
    return out


# ---------------------------------------------------------------------------
# subprocess body
# ---------------------------------------------------------------------------

def _hive_session(name: str, base: str):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master("local[8]").appName(name)
        .config("spark.sql.warehouse.dir", os.path.join(base, "wh"))
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.hadoop.javax.jdo.option.ConnectionURL",
                "jdbc:derby:;databaseName=%s;create=true"
                % os.path.join(base, "meta"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_HIVECAT_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .enableHiveSupport().getOrCreate())


def _agg(df):
    """The content fingerprint both queries emit: per-priority row
    count, SCALE-ROBUST decimal-string total (dsum_dec_str — a double
    sum of 1.5M ~1e5 prices needs > 16 significant digits at the
    blow-up fixtures), and exact key extremes."""
    from pyspark.sql import functions as F

    from ..functions.exact import dsum_dec_str
    return (df.groupBy("o_orderpriority")
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   dsum_dec_str("o_totalprice").alias("sum_total"),
                   F.min("o_orderkey").alias("min_key"),
                   F.max("o_orderkey").alias("max_key")))


def stage(sf_dir: str, out: str) -> None:
    """Subprocess body: write → restart session → read back → MSCK."""
    from ..catalog import load_table

    # --- session A: partitioned managed table into the Derby metastore
    s = _hive_session("hivecat_write", out)
    orders = load_table(s, sf_dir, "orders")
    (orders.write.mode("overwrite").format("parquet")
           .partitionBy("o_orderpriority").saveAsTable("orders_ms"))
    n_src = orders.count()
    s.stop()

    # --- session B: BRAND-NEW SparkContext, same metastore — the
    # catalog must have outlived the session that wrote it.
    s = _hive_session("hivecat_read", out)
    names = [t.name for t in s.catalog.listTables()]
    if "orders_ms" not in names:
        raise AssertionError("metastore lost orders_ms across sessions: %s"
                             % names)
    back = s.table("orders_ms")
    if back.count() != n_src:
        raise AssertionError("read-back row count != source")
    n_parts = s.sql("SHOW PARTITIONS orders_ms").count()
    n_prios = back.select("o_orderpriority").distinct().count()
    if n_parts != n_prios:
        raise AssertionError("SHOW PARTITIONS %d != %d distinct priorities"
                             % (n_parts, n_prios))
    _agg(back).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, ROUNDTRIP))

    # --- MSCK external-table flow over the managed table's files
    src_dir = os.path.join(out, "wh", "orders_ms")
    parts = sorted(d for d in os.listdir(src_dir)
                   if d.startswith("o_orderpriority="))
    # deterministic late partition: lexicographic max of the DECODED
    # values (ASCII priorities ⇒ identical to SQL MAX), nulls
    # (__HIVE_DEFAULT_PARTITION__) never chosen while a value exists
    decoded = {d: urllib.parse.unquote(d.split("=", 1)[1]) for d in parts}
    real = [d for d in parts
            if decoded[d] != "__HIVE_DEFAULT_PARTITION__"]
    late = (max(real, key=decoded.get) if real else (parts[-1] if parts
                                                     else None))
    ext = os.path.join(out, "ext")
    os.makedirs(ext, exist_ok=True)
    for d in parts:
        if d != late:
            shutil.copytree(os.path.join(src_dir, d), os.path.join(ext, d))
    cols = ", ".join("%s %s" % (f.name, f.dataType.simpleString())
                     for f in back.schema.fields
                     if f.name != "o_orderpriority")
    s.sql("DROP TABLE IF EXISTS orders_ext")
    s.sql("CREATE TABLE orders_ext (%s) USING PARQUET "
          "PARTITIONED BY (o_orderpriority STRING) LOCATION '%s'"
          % (cols, ext))
    s.sql("MSCK REPAIR TABLE orders_ext")
    from pyspark.sql import functions as F
    before = (s.table("orders_ext").groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).cast("long").alias("n_before")))
    # materialize the pre-repair counts NOW (eager localCheckpoint —
    # a lazy plan would re-read the table after the repair and see
    # the late partition)
    before = before.localCheckpoint()
    if late is not None:
        # the metastore, not the filesystem, governs reads: the late
        # dir appears on disk now, but stays invisible until repair
        shutil.copytree(os.path.join(src_dir, late),
                        os.path.join(ext, late))
        hidden = (s.table("orders_ext")
                   .filter(F.col("o_orderpriority") ==
                           F.lit(decoded[late])).count())
        if hidden != 0:
            raise AssertionError(
                "late partition visible before MSCK (%d rows)" % hidden)
        s.sql("MSCK REPAIR TABLE orders_ext")
    after = (s.table("orders_ext").groupBy("o_orderpriority")
              .agg(F.count(F.lit(1)).cast("long").alias("n_after")))
    b = before.select(F.col("o_orderpriority").alias("p"), "n_before")
    result = (after.join(b, after["o_orderpriority"].eqNullSafe(b["p"]),
                         "left")
                   .select("o_orderpriority",
                           F.coalesce("n_before", F.lit(0).cast("long"))
                            .alias("n_before"),
                           "n_after"))
    result.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, MSCK))

    # --- partition-pruning proof, BEHAVIORAL (no plan-string parsing):
    # delete every NON-late partition's files from the external
    # table's location while the metastore still lists those
    # partitions, then read ONLY the late partition. A metastore-
    # partition-pruned scan never lists the deleted directories and
    # returns the exact source aggregate; an unpruned scan would fault
    # on the vanished files (staging error → gate red).
    if late is not None:
        for d in parts:
            if d != late:
                shutil.rmtree(os.path.join(ext, d), ignore_errors=True)
        late_val = (None if decoded[late] == "__HIVE_DEFAULT_PARTITION__"
                    else decoded[late])
        pruned = s.table("orders_ext").where(
            F.col("o_orderpriority").eqNullSafe(F.lit(late_val)))
        _agg(pruned).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, PRUNE))
    else:
        _agg(s.table("orders_ext")).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(out, PRUNE))
    s.stop()


if __name__ == "__main__":
    stage(sys.argv[1], sys.argv[2])
