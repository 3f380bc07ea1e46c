"""Round-11 operator batch H (SURVEY.md §2 growth): greedy k-center
coreset selection over the embedding corpus.

Provenance ([PK], empty reference checkout — SURVEY §0): Gonzalez 1985
(greedy farthest-point k-center, 2-approximation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

# ---------------------------------------------------------------------------
# Greedy k-center coreset (Gonzalez farthest-point traversal)
# ---------------------------------------------------------------------------

_KC_K = 5

# Element-level distance idiom (vec_pairwise_cosine precedent): explode
# to (vec_id, pos, x), join on pos, accumulate (x−y)² through
# DECIMAL(38,12) — fold-order-free, so both engines produce the
# IDENTICAL double distance and the argmax can never flip.
_KC_PTS_SQL = """
pts AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings)
"""


def _kc_sql(k: int) -> str:
    """Unrolled greedy farthest-point traversal: c1 = min vec_id;
    c_{i+1} = argmax_p min_{c∈C_i} d²(p, c), ties to the smallest
    vec_id. Each round is one distance CTE (join on pos vs the new
    center only) + a running elementwise MIN + one argmax row."""
    ctes = [f"{_KC_PTS_SQL.strip()}",
            ", c1 AS (SELECT MIN(vec_id) AS cid FROM pts)",
            """, d1 AS MATERIALIZED (
  SELECT p.vec_id, {DS} AS d2
  FROM pts p JOIN pts c ON c.pos = p.pos
  JOIN c1 ON c.vec_id = c1.cid
  GROUP BY p.vec_id)""".replace("{DS}", dsum_sql("(p.x - c.x)"
                                                 " * (p.x - c.x)"))]
    for i in range(2, k + 1):
        prev = f"d{i - 1}"
        ctes.append(f""", c{i} AS MATERIALIZED (
  SELECT vec_id AS cid, d2 AS sel FROM {prev}
  ORDER BY d2 DESC, vec_id LIMIT 1)""")
        if i < k:
            ctes.append(f""", d{i} AS MATERIALIZED (
  SELECT p.vec_id, LEAST(prev.d2, {dsum_sql('(p.x - c.x) * (p.x - c.x)')})
           AS d2
  FROM pts p JOIN pts c ON c.pos = p.pos
  JOIN c{i} ON c.vec_id = c{i}.cid
  JOIN {prev} prev ON prev.vec_id = p.vec_id
  GROUP BY p.vec_id, prev.d2)""")
    sel = [f"SELECT {i} AS k, cid AS center_id, "
           f"{r6_sql('sel')} AS sel_d2 FROM c{i}"
           for i in range(2, k + 1)]
    head = ("SELECT 1 AS k, cid AS center_id, "
            "CAST(NULL AS DOUBLE) AS sel_d2 FROM c1")
    return ("WITH " + "".join(ctes) + "\n"
            + head + "\nUNION ALL\n" + "\nUNION ALL\n".join(sel))


@query("data_coreset_kcenter", oracle=_kc_sql(_KC_K))
def data_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY k-CENTER CORESET SELECTION [PK — Gonzalez 1985, the
    2-approximation farthest-point traversal]: pick the min-id vector,
    then repeatedly add the point FARTHEST from its nearest selected
    center (squared Euclidean; ties → smallest vec_id) — the classical
    diversity-maximizing coreset a training-data curator runs to seed
    representative samples or dedup-aware eval sets from an embedded
    corpus. Emits (k, center_id, selection distance²) for k = 1..5.
    Distances use the element-level join + DECIMAL(38,12) accumulation
    idiom (vec_pairwise_cosine precedent) so both engines compute the
    IDENTICAL double per (point, center) — the argmax can never flip
    cross-engine; the per-round winner is ONE driver scalar (the
    sanctioned bounded-probe collect, k−1 = 4 probes total). Scale:
    each round is one broadcast-sized join (the single new center's 64
    components) over the corpus + a running MIN — O(k·n·d) work, no
    pairwise blow-up; the selection argmax is a 1-row
    TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id",
                     F.posexplode("embedding").alias("pos0", "xf")) \
             .select("vec_id", (F.col("pos0") + 1).alias("pos"),
                     F.col("xf").cast("double").alias("x"))
    pts = pts.cache()
    c1 = pts.agg(F.min("vec_id").alias("cid")).collect()[0]["cid"]
    out_rows = [(1, c1, None)]

    def dist_to(center_id: int) -> DataFrame:
        c = (pts.filter(F.col("vec_id") == center_id)
                .select("pos", F.col("x").alias("y")))
        return (pts.join(F.broadcast(c), "pos")
                   .groupBy("vec_id")
                   .agg(dsum((F.col("x") - F.col("y"))
                             * (F.col("x") - F.col("y"))).alias("nd")))

    d = dist_to(c1).withColumnRenamed("nd", "d2")
    for k in range(2, _KC_K + 1):
        top = d.orderBy(F.desc("d2"), "vec_id").limit(1).collect()[0]
        out_rows.append((k, top["vec_id"], float(top["d2"])))
        if k < _KC_K:
            nd = dist_to(top["vec_id"])
            d = (d.join(nd, "vec_id")
                  .select("vec_id", F.least("d2", "nd").alias("d2"))
                  .localCheckpoint())
    res = spark.createDataFrame(
        out_rows, "k int, center_id long, sel_d2 double")
    return res.select(F.col("k").cast("int"), "center_id",
                      r6(F.col("sel_d2")).alias("sel_d2"))
