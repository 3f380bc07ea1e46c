"""Round-11 operator batch S (SURVEY.md §2 growth): community quality
metrics (modularity, conductance) over the cross-brand co-purchase
graph, MACD, and Rényi collision entropy.

Provenance ([PK], empty reference checkout — SURVEY §0): Newman &
Girvan 2004 (modularity); Kannan, Vempala & Vetta 2004 / Leskovec et
al. 2009 (conductance, NCP practice); Appel 1979 (MACD; EMAs as
truncated convolution kernels per the win_ewma precedent); Rényi 1961
(order-2 collision entropy).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .registry import query

# ---------------------------------------------------------------------------
# Shared: cross-brand co-purchase edges with brand communities
# ---------------------------------------------------------------------------

# Unlike q_round11b's brand-RESTRICTED community graph, these edges
# keep cross-brand pairs — the brand partition then has a real cut,
# which is what modularity/conductance measure.
_EDGE_SQL = """
edges AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
nodes AS (
  SELECT e.n AS node_id, p.p_brand AS com
  FROM (SELECT a AS n FROM edges UNION SELECT b FROM edges) e
  JOIN part p ON p.p_partkey = e.n),
deg AS (
  SELECT n AS node_id, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT a AS n FROM edges UNION ALL SELECT b FROM edges)
  GROUP BY n),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
vol AS (
  SELECT nodes.com, CAST(SUM(deg.d) AS BIGINT) AS vol,
         CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM nodes JOIN deg USING (node_id) GROUP BY nodes.com),
intra AS (
  SELECT na.com, CAST(COUNT(*) AS BIGINT) AS ec
  FROM edges JOIN nodes na ON na.node_id = edges.a
  JOIN nodes nb ON nb.node_id = edges.b
  WHERE na.com = nb.com
  GROUP BY na.com)
"""


def _edges(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_partkey").alias("k2"))
    edges = (li.join(l2, (li["l_orderkey"] == l2["o2"])
                     & (li["l_partkey"] < l2["k2"]))
               .select(F.col("l_partkey").alias("a"),
                       F.col("k2").alias("b"))
               .distinct()).cache()
    pb = load_table(spark, sf_dir, "part").select("p_partkey",
                                                  "p_brand")
    # Cached like edges (round-11 optimization): nodes is read by vol
    # AND by the intra join's two sides (na/nb) — uncached, the
    # union+distinct+part join re-ran 3× per query (and both
    # modularity and conductance call _edges). One row per co-purchase
    # part — same boundedness as the cached edge set.
    nodes = (edges.select(F.col("a").alias("n"))
                  .union(edges.select("b")).distinct()
                  .join(pb, F.col("n") == F.col("p_partkey"))
                  .select(F.col("n").alias("node_id"),
                          F.col("p_brand").alias("com"))).cache()
    deg = (edges.select(F.col("a").alias("n"))
                .unionAll(edges.select("b"))
                .groupBy("n")
                .agg(F.count(F.lit(1)).cast("long").alias("d"))
                .withColumnRenamed("n", "node_id"))
    mm = edges.agg(F.count(F.lit(1)).cast("long").alias("m"))
    vol = (nodes.join(deg, "node_id")
                .groupBy("com")
                .agg(F.sum("d").cast("long").alias("vol"),
                     F.count(F.lit(1)).cast("long").alias("n_nodes")))
    na = nodes.select(F.col("node_id").alias("a"),
                      F.col("com").alias("ca"))
    nb = nodes.select(F.col("node_id").alias("b"),
                      F.col("com").alias("cb"))
    intra = (edges.join(na, "a").join(nb, "b")
                  .filter(F.col("ca") == F.col("cb"))
                  .groupBy(F.col("ca").alias("com"))
                  .agg(F.count(F.lit(1)).cast("long").alias("ec")))
    return edges, nodes, deg, mm, vol, intra


# ---------------------------------------------------------------------------
# Modularity of the brand partition
# ---------------------------------------------------------------------------

_MOD_SQL = f"""
WITH {_EDGE_SQL.strip()},
q AS (
  SELECT {dsum_sql('CAST(COALESCE(intra.ec, 0) AS DOUBLE) / mm.m'
                   ' - (CAST(vol.vol AS DOUBLE) / (2 * mm.m))'
                   ' * (CAST(vol.vol AS DOUBLE) / (2 * mm.m))')} AS q,
         CAST(COUNT(*) AS BIGINT) AS k, MAX(mm.m) AS m
  FROM vol LEFT JOIN intra USING (com), mm)
SELECT CAST(m AS BIGINT) AS m, k, {r6_sql('q')} AS modularity
FROM q
"""


@query("graph_modularity_score", oracle=_MOD_SQL)
def graph_modularity_score(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """MODULARITY OF A PARTITION [PK — Newman & Girvan 2004]:
    Q = Σ_c (e_c/m − (vol_c/2m)²) for the BRAND partition of the
    cross-brand co-purchase graph — how much denser are within-brand
    co-purchases than a degree-preserving random rewiring?  The
    quality score that grades any community assignment (here the
    catalog's own taxonomy) and the objective Louvain-style methods
    climb; the evaluation companion to graph_label_propagation /
    graph_connected_components, which produce partitions but never
    score them.  All counts are exact BIGINTs from domain-bounded
    aggregates; Q's per-community terms sum through DECIMAL(38,12).
    Scale: the order-bounded self-join builds edges once; everything
    after is (node / community)-domain aggregates — no iteration."""
    _, _, _, mm, vol, intra = _edges(spark, sf_dir)
    term = (F.coalesce(F.col("ec"), F.lit(0).cast("long"))
             .cast("double") / F.col("m")
            - (F.col("vol").cast("double") / (2 * F.col("m")))
            * (F.col("vol").cast("double") / (2 * F.col("m"))))
    q = (vol.join(intra, "com", "left").crossJoin(F.broadcast(mm))
            .agg(dsum(term).alias("q"),
                 F.count(F.lit(1)).cast("long").alias("k"),
                 F.max("m").alias("m")))
    return q.select(F.col("m").cast("long").alias("m"), "k",
                    r6(F.col("q")).alias("modularity"))


# ---------------------------------------------------------------------------
# Per-community conductance
# ---------------------------------------------------------------------------

_COND_SQL = f"""
WITH {_EDGE_SQL.strip()},
sc AS (
  SELECT vol.com, vol.n_nodes, vol.vol,
         vol.vol - 2 * COALESCE(intra.ec, 0) AS cut,
         mm.m
  FROM vol LEFT JOIN intra USING (com), mm)
SELECT com AS brand, n_nodes, CAST(vol AS BIGINT) AS vol,
       CAST(cut AS BIGINT) AS cut,
       CASE WHEN LEAST(vol, 2 * m - vol) > 0 THEN
         {r6_sql('CAST(cut AS DOUBLE) / LEAST(vol, 2 * m - vol)')}
       END AS conductance
FROM sc ORDER BY com
"""


@query("graph_community_conductance", oracle=_COND_SQL)
def graph_community_conductance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """PER-COMMUNITY CONDUCTANCE [PK — Kannan, Vempala & Vetta 2004;
    the NCP-plot statistic of Leskovec et al. 2009]: φ(c) =
    cut(c)/min(vol(c), vol(V∖c)) for each brand community of the
    cross-brand co-purchase graph — the fraction of a community's
    edge endpoints that LEAK out, the per-cluster sibling of
    graph_modularity_score's global Q (a partition can score well
    globally while single communities leak badly; release gates check
    both).  cut = vol − 2·intra is exact integer algebra from the
    same domain-bounded aggregates; degenerate sides (empty
    complement) emit NULL by the safe-division rule.  Scale:
    identical shape to the modularity plan — edges once, aggregates
    after."""
    _, _, _, mm, vol, intra = _edges(spark, sf_dir)
    sc = (vol.join(intra, "com", "left").crossJoin(F.broadcast(mm))
             .select("com", "n_nodes", "vol", "m",
                     (F.col("vol")
                      - 2 * F.coalesce(F.col("ec"),
                                       F.lit(0).cast("long")))
                     .alias("cut")))
    den = F.least(F.col("vol"), 2 * F.col("m") - F.col("vol"))
    return (sc.select(F.col("com").alias("brand"), "n_nodes",
                      F.col("vol").cast("long").alias("vol"),
                      F.col("cut").cast("long").alias("cut"),
                      F.when(den > 0,
                             r6(F.col("cut").cast("double") / den))
                       .alias("conductance"))
              .orderBy("brand"))


# ---------------------------------------------------------------------------
# MACD (truncated-kernel EMAs)
# ---------------------------------------------------------------------------

_MACD_FAST, _MACD_SLOW, _MACD_SIG = 12, 26, 9
_MACD_LAGS = 64
_MACD_SIG_LAGS = 24


def _ema_weights(n: int, lags: int) -> list:
    a = 2.0 / (n + 1)
    return [a * (1.0 - a) ** j for j in range(lags)]


def _conv_sql(col: str, weights: list) -> str:
    return "(" + " + ".join(
        f"COALESCE(lag({col}, {j}) OVER w * {w!r}, 0)"
        for j, w in enumerate(weights)) + ")"


_MACD_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
         {dsum_sql('value')} / COUNT(value) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2),
idx AS (
  SELECT event_type, h, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS t
  FROM hourly),
macd0 AS (
  SELECT event_type, h, t,
         {_conv_sql('x', _ema_weights(_MACD_FAST, _MACD_LAGS))}
           - {_conv_sql('x', _ema_weights(_MACD_SLOW, _MACD_LAGS))}
           AS macd
  FROM idx
  WINDOW w AS (PARTITION BY event_type ORDER BY h)),
sig AS (
  SELECT event_type, h, t, macd,
         {_conv_sql('macd', _ema_weights(_MACD_SIG, _MACD_SIG_LAGS))}
           AS signal
  FROM macd0
  WINDOW w AS (PARTITION BY event_type ORDER BY h))
SELECT event_type, h, {r6_sql('macd')} AS macd,
       {r6_sql('signal')} AS signal,
       {r6_sql('macd - signal')} AS histogram
FROM sig WHERE t > {_MACD_LAGS + _MACD_SIG_LAGS}
ORDER BY event_type, h
"""


@query("win_macd", oracle=_MACD_SQL)
def win_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD [PK — Appel 1979: EMA₁₂ − EMA₂₆ with an EMA₉ signal
    line]: the momentum indicator pair completing the family around
    win_sma_crossover / win_rsi / win_adx_dmi.  Recursive EMAs are
    replaced by TRUNCATED CONVOLUTION KERNELS (win_ewma precedent) —
    64 lags for the price EMAs ((25/27)⁶⁴ ≈ 0.7% tail, documented
    truncation contract) and 24 for the signal — each weight an
    identical repr-round-trip double literal and each sum a FIXED
    left-associated expression tree, so both engines fold bit-
    identically with no decimal detour needed.  Warm-up rows
    (t ≤ 88) drop so the truncation bias never meets a partial
    window.  Runs on the HOURLY mean series (epoch-hour BIGINT key —
    house timestamp rule) so the month-long fixture clears the 88-row
    warm-up.  Scale: facts collapse to (type, hour); two stacked
    windows over the SAME partitioning — one exchange."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.unix_micros(F.col("ts"))
            / F.lit(3600000000)).cast("long")
    hourly = (ev.filter(F.col("value").isNotNull()
                        & ~F.isnan("value"))
                .groupBy("event_type",
                         F.floor(F.unix_micros("ts") / 3600000000)
                          .cast("long").alias("h"))
                .agg((dsum("value") / F.count("value")).alias("x")))
    del hour
    ws = W.partitionBy("event_type").orderBy("h")
    idx = hourly.withColumn("t", F.row_number().over(ws))

    def conv(col: str, weights: list):
        # ONE collect_list window + an ordered fold instead of
        # len(weights) separate lag() window expressions (round-11
        # optimization): the 64+64+24-lag form planned a 152-window-
        # function expression tree that cost ~2 s of PLANNING per
        # invocation (census plan_ms 2015; 3.3 s warm → 1.0 s). The
        # fold preserves the exact left-associated addition order and
        # the per-term coalesce(·, 0) of the lag form — term j is
        # arr[m−j] · w_j when the lag exists, else 0.0 — so every sum
        # is bit-identical (seed 0.0 can only flip a −0.0 first term
        # to +0.0, which r6's signed-zero rule normalizes anyway); the
        # DuckDB oracle keeps the explicit lag convolution, making the
        # equivalence hash-checked at every fixture.
        lags = len(weights)
        frame = ws.rowsBetween(-(lags - 1), 0)
        arr = F.collect_list(col).over(frame)
        warr = F.array(*[F.lit(w) for w in weights])
        m = F.size(arr)
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(lags - 1)),
            F.lit(0.0),
            lambda acc, j: acc + F.coalesce(
                F.get(arr, m - 1 - j) * F.get(warr, j),
                F.lit(0.0)))

    macd0 = idx.select(
        "event_type", "h", "t",
        (conv("x", _ema_weights(_MACD_FAST, _MACD_LAGS))
         - conv("x", _ema_weights(_MACD_SLOW, _MACD_LAGS)))
        .alias("macd"))
    sig = macd0.select(
        "event_type", "h", "t", "macd",
        conv("macd", _ema_weights(_MACD_SIG, _MACD_SIG_LAGS))
        .alias("signal"))
    return (sig.filter(F.col("t") > _MACD_LAGS + _MACD_SIG_LAGS)
               .select("event_type", "h", r6(F.col("macd")).alias("macd"),
                       r6(F.col("signal")).alias("signal"),
                       r6(F.col("macd") - F.col("signal"))
                       .alias("histogram"))
               .orderBy("event_type", "h"))


# ---------------------------------------------------------------------------
# Rényi collision entropy
# ---------------------------------------------------------------------------

_RENYI_SQL = f"""
WITH c AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, user_id),
tot AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(n * n) AS BIGINT) AS ss,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM c GROUP BY event_type)
SELECT event_type, n_users,
       {r6_sql('-ROUND(LN(CAST(ss AS DOUBLE) / (CAST(nt AS DOUBLE)'
               ' * nt)), 9)')} AS renyi2,
       {r6_sql('ROUND(LN(CAST(n_users AS DOUBLE)), 9)')} AS max_ent,
       {r6_sql('-ROUND(LN(CAST(ss AS DOUBLE) / (CAST(nt AS DOUBLE)'
               ' * nt)), 9)'
               ' / ROUND(LN(CAST(n_users AS DOUBLE)), 9)')}
         AS renyi2_norm
FROM tot ORDER BY event_type
"""


@query("agg_renyi_collision_entropy", oracle=_RENYI_SQL)
def agg_renyi_collision_entropy(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """RÉNYI ORDER-2 (COLLISION) ENTROPY [PK — Rényi 1961]: per event
    type, H₂ = −ln Σ p_u² over the user activity distribution — the
    entropy that equals −ln(collision probability), the quantity
    re-identification risk and load-balance analyses actually need
    (Shannon entropy OVERSTATES effective diversity when a few users
    dominate; H₂ ≤ H₁ always, and the gap measures head-heaviness
    next to agg_shannon_entropy / agg_simpson_diversity — indeed
    exp(H₂) is Simpson's inverse index).  Σn² and totals are exact
    BIGINTs; the single ln per group is pinned to 9 dp (q_round6d
    discipline).  Scale: two hash aggregates, map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.groupBy("event_type", "user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = c.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
        F.count(F.lit(1)).cast("long").alias("n_users"))
    h2 = -F.round(F.log(F.col("ss").cast("double")
                        / (F.col("nt").cast("double") * F.col("nt"))),
                  9)
    hmax = F.round(F.log(F.col("n_users").cast("double")), 9)
    return (tot.select("event_type", "n_users",
                       r6(h2).alias("renyi2"),
                       r6(hmax).alias("max_ent"),
                       r6(h2 / hmax).alias("renyi2_norm"))
               .orderBy("event_type"))
