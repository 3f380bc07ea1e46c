"""Round-11 operator batch L (SURVEY.md §2 growth): HITS
hubs/authorities, the Quade blocked-rank test, Krippendorff's alpha,
and the Huber M-estimator of location.

Provenance ([PK], empty reference checkout — SURVEY §0): Kleinberg
1999 (HITS); Quade 1979; Krippendorff 1970/2004 (nominal alpha,
coincidence-matrix form); Huber 1964 (M-estimation, clipped-mean
iteration).

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
# HITS hubs & authorities (integer fixed-point, unrolled)
# ---------------------------------------------------------------------------

_HITS_SCALE = 1_000_000
_HITS_ITERS = 2


def _hits_oracle() -> str:
    ctes = [f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
h0 AS (
  SELECT DISTINCT c, CAST({_HITS_SCALE} AS BIGINT) AS h FROM edges)"""]
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        ctes.append(f""",
ar{i} AS (
  SELECT e.s, CAST(SUM(h.h) AS BIGINT) AS raw
  FROM edges e JOIN {prev_h} h ON h.c = e.c GROUP BY e.s),
a{i} AS (
  SELECT s, raw * {_HITS_SCALE}
           // (SELECT CAST(SUM(raw) AS BIGINT) FROM ar{i}) AS a
  FROM ar{i}),
hr{i} AS (
  SELECT e.c, CAST(SUM(a.a) AS BIGINT) AS raw
  FROM edges e JOIN a{i} a ON a.s = e.s GROUP BY e.c),
h{i} AS (
  SELECT c, raw * {_HITS_SCALE}
           // (SELECT CAST(SUM(raw) AS BIGINT) FROM hr{i}) AS h
  FROM hr{i})""")
        prev_h = f"h{i}"
    return ("".join(ctes) + f"""
SELECT c_custkey * 2 AS node_id, 'hub' AS kind,
       COALESCE(h{_HITS_ITERS}.h, 0) AS score_u
FROM customer LEFT JOIN h{_HITS_ITERS} ON c = c_custkey
UNION ALL
SELECT s_suppkey * 2 + 1 AS node_id, 'auth' AS kind,
       COALESCE(a{_HITS_ITERS}.a, 0) AS score_u
FROM supplier LEFT JOIN a{_HITS_ITERS} ON s = s_suppkey
""")


@query("graph_hits", oracle=_hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS HUBS & AUTHORITIES [PK — Kleinberg 1999]: the mutually
    recursive centrality pair on the customer→supplier purchase graph
    — a customer is a good HUB when it buys from good authorities, a
    supplier a good AUTHORITY when good hubs buy from it — the
    complement of graph_pagerank's single-score random walk (PageRank
    ranks by inbound mass; HITS separates curator-quality from
    endpoint-quality, the classic bipartite-recommendation view).
    Exactness strategy (graph_pagerank precedent): scores live as
    BIGINT micro-units; each half-iteration is one edge join + integer
    gather, then an L1 normalization by integer floor-division — every
    step bit-identical cross-engine, no float summation order anywhere.
    2 full iterations unrolled; silent nodes re-attach by left join
    with score 0.  Scale: edges computed once and cached; each gather
    is one shuffle on the gather key; normalization totals are
    broadcast scalars."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    edges = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .select(F.col("o_custkey").alias("c"),
                       F.col("l_suppkey").alias("s"))
               .distinct()).cache()
    h = (edges.select("c").distinct()
              .withColumn("h", F.lit(_HITS_SCALE).cast("long")))
    a = None
    for _ in range(_HITS_ITERS):
        # Each gather output is CACHED before use (round-11
        # optimization): every half-iteration reads its predecessor
        # TWICE — once for the L1 normalization total, once as the
        # crossJoin's row side — and the next gather reads the
        # normalized result again, so without the cache the plan tree
        # DOUBLES per half-iteration (the 2-iteration unrolled plan
        # held 137 Exchange nodes and re-executed the whole upstream
        # chain per branch: 74.5 s at sf0.1 in the round-11 sweep,
        # 16.7 s cold / 2.7 s warm cached — same bit-exact integer
        # scores). The cached
        # tables are per-node score rows (|customers| / |suppliers|),
        # the same boundedness as the cached edge set.
        ar = (edges.join(h, "c")
                   .groupBy("s").agg(F.sum("h").cast("long")
                                     .alias("raw"))).cache()
        atot = ar.agg(F.sum("raw").cast("long").alias("tot"))
        a = (ar.crossJoin(F.broadcast(atot))
               .select("s", F.expr(
                   f"raw * {_HITS_SCALE}L div tot").alias("a")))
        hr = (edges.join(a, "s")
                   .groupBy("c").agg(F.sum("a").cast("long")
                                     .alias("raw"))).cache()
        htot = hr.agg(F.sum("raw").cast("long").alias("tot"))
        h = (hr.crossJoin(F.broadcast(htot))
               .select("c", F.expr(
                   f"raw * {_HITS_SCALE}L div tot").alias("h")))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    hubs = (cust.join(h, cust["c_custkey"] == h["c"], "left")
                .select((F.col("c_custkey") * 2).alias("node_id"),
                        F.lit("hub").alias("kind"),
                        F.coalesce(F.col("h"), F.lit(0).cast("long"))
                         .alias("score_u")))
    auths = (supp.join(a, supp["s_suppkey"] == a["s"], "left")
                 .select((F.col("s_suppkey") * 2 + 1).alias("node_id"),
                         F.lit("auth").alias("kind"),
                         F.coalesce(F.col("a"), F.lit(0).cast("long"))
                          .alias("score_u")))
    return hubs.unionByName(auths)


# ---------------------------------------------------------------------------
# Quade blocked-rank test
# ---------------------------------------------------------------------------

_QUADE_SQL = f"""
WITH um AS (
  SELECT user_id, event_type,
         {dsum_sql('value')} / COUNT(value) AS mv
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY user_id, event_type),
full_u AS (
  SELECT user_id FROM um GROUP BY user_id
  HAVING COUNT(*) = (SELECT COUNT(DISTINCT event_type) FROM um)),
base AS (SELECT um.* FROM um JOIN full_u USING (user_id)),
kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
       FROM base),
ranked AS (
  SELECT user_id, event_type,
         RANK() OVER (PARTITION BY user_id ORDER BY mv)
           + (COUNT(*) OVER (PARTITION BY user_id, mv) - 1) / 2.0 AS r
  FROM base),
rng AS (
  SELECT user_id, MAX(mv) - MIN(mv) AS rg FROM base GROUP BY user_id),
rcell AS (
  SELECT rg, CAST(COUNT(*) AS BIGINT) AS cnt FROM rng GROUP BY rg),
rmid AS (
  SELECT rg,
         COALESCE(SUM(cnt) OVER (ORDER BY rg
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0)
           + (cnt + 1) / 2.0 AS q
  FROM rcell),
sij AS (
  SELECT ranked.user_id, ranked.event_type,
         rmid.q * (ranked.r - (kk.k + 1) / 2.0) AS s
  FROM ranked JOIN rng USING (user_id)
  JOIN rmid USING (rg), kk),
sj AS (
  SELECT event_type, {dsum_sql('s')} AS sjv FROM sij
  GROUP BY event_type),
ab AS (
  SELECT (SELECT {dsum_sql('s * s')} FROM sij) AS a2,
         (SELECT {dsum_sql('sjv * sjv')} FROM sj)
           / (SELECT CAST(COUNT(*) AS BIGINT) FROM full_u) AS b2),
dims AS (
  SELECT CAST((SELECT COUNT(*) FROM full_u) AS BIGINT) AS b,
         (SELECT k FROM kk) AS k)
SELECT dims.b, dims.k, {r6_sql('ab.a2')} AS a_stat,
       {r6_sql('ab.b2')} AS b_stat,
       {r6_sql('(dims.b - 1) * ab.b2 / (ab.a2 - ab.b2)')} AS f_stat
FROM ab, dims
"""


@query("stat_quade_test", oracle=_QUADE_SQL)
def stat_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADE'S BLOCKED-RANK TEST [PK — Quade 1979]: the
    range-weighted refinement of the Friedman test — blocks (users,
    complete blocks only) with a LARGER within-block spread carry more
    evidence, so each block's rank profile is weighted by the midrank
    Q_i of its range across blocks: S_ij = Q_i(R_ij − (k+1)/2),
    F = (b−1)B/(A−B) with A = ΣS², B = ΣS_j²/b ~ F_{k−1,(b−1)(k−1)}.
    More powerful than Friedman at small k; sits between
    stat_friedman_test (unweighted blocks) and stat_page_trend_test
    (ordered alternatives) in the blocked-rank family.  Within-block
    midranks reuse the Page windows; range midranks use the
    distinct-value cells idiom; every S product runs through
    DECIMAL(38,12).  Scale: fact volume collapses at the first
    aggregate; windows are user-partitioned or cells-level."""
    ev = load_table(spark, sf_dir, "events")
    um = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy("user_id", "event_type")
            .agg((dsum("value") / F.count("value")).alias("mv")))
    ktot = um.select("event_type").distinct().count()
    full_u = (um.groupBy("user_id").agg(F.count(F.lit(1)).alias("nk"))
                .filter(F.col("nk") == ktot).select("user_id"))
    base = um.join(full_u, "user_id").cache()
    wr = W.partitionBy("user_id").orderBy("mv")
    wt = W.partitionBy("user_id", "mv")
    ranked = base.select(
        "user_id", "event_type",
        (F.rank().over(wr)
         + (F.count(F.lit(1)).over(wt) - 1) / 2.0).alias("r"))
    rng = base.groupBy("user_id").agg(
        (F.max("mv") - F.min("mv")).alias("rg"))
    rcell = rng.groupBy("rg").agg(F.count(F.lit(1)).cast("long")
                                   .alias("cnt"))
    wq = W.orderBy("rg").rowsBetween(W.unboundedPreceding, -1)
    rmid = rcell.select(
        "rg", (F.coalesce(F.sum("cnt").over(wq),
                          F.lit(0).cast("long"))
               + (F.col("cnt") + 1) / 2.0).alias("q"))
    sij = (ranked.join(rng, "user_id").join(rmid, "rg")
                 .select("event_type",
                         (F.col("q") * (F.col("r") - (ktot + 1) / 2.0))
                          .alias("s")))
    sij = sij.cache()
    sj = sij.groupBy("event_type").agg(dsum("s").alias("sjv"))
    b_cnt = full_u.count()
    a2 = sij.agg(dsum(F.col("s") * F.col("s")).alias("a2"))
    b2 = sj.agg((dsum(F.col("sjv") * F.col("sjv")) / b_cnt)
                .alias("b2"))
    return (a2.crossJoin(F.broadcast(b2))
              .select(F.lit(b_cnt).cast("long").alias("b"),
                      F.lit(ktot).cast("long").alias("k"),
                      r6(F.col("a2")).alias("a_stat"),
                      r6(F.col("b2")).alias("b_stat"),
                      r6((b_cnt - 1) * F.col("b2")
                         / (F.col("a2") - F.col("b2")))
                      .alias("f_stat")))


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal)
# ---------------------------------------------------------------------------

_KRIPP_M = 4

_KRIPP_SQL = f"""
WITH votes AS (
  SELECT l_orderkey AS item, l_returnflag AS cat
  FROM (SELECT l_orderkey, l_returnflag,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey,
                                           l_suppkey, l_extendedprice,
                                           l_returnflag) AS rn
        FROM lineitem)
  WHERE rn <= {_KRIPP_M}),
full_items AS (
  SELECT item FROM votes GROUP BY item
  HAVING COUNT(*) = {_KRIPP_M}),
nij AS (
  SELECT v.item, v.cat, CAST(COUNT(*) AS BIGINT) AS c
  FROM votes v JOIN full_items USING (item)
  GROUP BY v.item, v.cat),
do_ AS (
  SELECT CAST(SUM(c * ({_KRIPP_M} - c)) AS BIGINT) AS dnum,
         CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items
  FROM nij),
nc AS (
  SELECT cat, CAST(SUM(c) AS BIGINT) AS tc FROM nij GROUP BY cat),
de AS (
  SELECT CAST(SUM(tc * (nn.n - tc)) AS BIGINT) AS enum_, nn.n
  FROM nc, (SELECT CAST(SUM(tc) AS BIGINT) AS n FROM nc) nn
  GROUP BY nn.n)
SELECT do_.n_items, {_KRIPP_M} AS n_raters,
  {r6_sql(f'CAST(do_.dnum AS DOUBLE)'
          f' / (do_.n_items * {_KRIPP_M} * ({_KRIPP_M} - 1))')} AS d_o,
  {r6_sql('CAST(de.enum_ AS DOUBLE) / (CAST(de.n AS DOUBLE)'
          ' * (de.n - 1))')} AS d_e,
  {r6_sql(f'1.0 - (CAST(do_.dnum AS DOUBLE)'
          f' / (do_.n_items * {_KRIPP_M} * ({_KRIPP_M} - 1)))'
          ' / (CAST(de.enum_ AS DOUBLE)'
          ' / (CAST(de.n AS DOUBLE) * (de.n - 1)))')} AS alpha
FROM do_, de
"""


@query("ml_krippendorff_alpha", oracle=_KRIPP_SQL)
def ml_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRIPPENDORFF'S ALPHA, NOMINAL [PK — Krippendorff 1970/2004,
    coincidence-matrix form]: the agreement coefficient that
    chance-corrects by the PAIRABLE-VALUE distribution rather than
    per-rater marginals — α = 1 − D_o/D_e with observed disagreement
    D_o = Σ_i Σ_c n_ic(m − n_ic)/(N·m(m−1)) and expected
    D_e = Σ_c n_c(n − n_c)/(n(n−1)) over all n = N·m values.  Shares
    ml_fleiss_kappa's deterministic labeling panel (first-4-lineitems
    return flags) so the two chance models are directly comparable on
    identical data — the methodological point of publishing both.
    Every term is exact BIGINT until the final three divisions.
    Scale: one bounded per-item window + two category-domain-bounded
    aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    wv = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_returnflag")
    m = _KRIPP_M
    votes = (li.select(F.col("l_orderkey").alias("item"),
                       F.col("l_returnflag").alias("cat"),
                       F.row_number().over(wv).alias("rn"))
               .filter(F.col("rn") <= m))
    full_items = (votes.groupBy("item")
                       .agg(F.count(F.lit(1)).alias("nv"))
                       .filter(F.col("nv") == m).select("item"))
    nij = (votes.join(full_items, "item")
                .groupBy("item", "cat")
                .agg(F.count(F.lit(1)).cast("long").alias("c")))
    nij = nij.cache()
    do_ = nij.agg(
        F.sum(F.col("c") * (m - F.col("c"))).cast("long").alias("dnum"),
        F.countDistinct("item").cast("long").alias("n_items"))
    nc = nij.groupBy("cat").agg(F.sum("c").cast("long").alias("tc"))
    nn = nc.agg(F.sum("tc").cast("long").alias("n"))
    de = (nc.crossJoin(F.broadcast(nn))
            .groupBy("n")
            .agg(F.sum(F.col("tc") * (F.col("n") - F.col("tc")))
                  .cast("long").alias("enum_")))
    d_o = (F.col("dnum").cast("double")
           / (F.col("n_items") * m * (m - 1)))
    d_e = (F.col("enum_").cast("double")
           / (F.col("n").cast("double") * (F.col("n") - 1)))
    return (do_.crossJoin(F.broadcast(de))
               .select("n_items", F.lit(m).alias("n_raters"),
                       r6(d_o).alias("d_o"), r6(d_e).alias("d_e"),
                       r6(1.0 - d_o / d_e).alias("alpha")))


# ---------------------------------------------------------------------------
# Huber M-estimator of location (3 clipped-mean iterations)
# ---------------------------------------------------------------------------

_HUBER_C = 1.345
_HUBER_MADK = 1.4826
_HUBER_ITERS = 3


def _huber_sql() -> str:
    clip = ("LEAST(GREATEST(x.v, it{p}.mu - {c!r} * sc.s), "
            "it{p}.mu + {c!r} * sc.s)")
    ctes = [f"""
WITH x AS (
  SELECT event_type AS g, value AS v, event_id
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
med AS (
  SELECT g, v AS m0
  FROM (SELECT g, v,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY v, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS ng
        FROM x)
  WHERE rn = CAST(CEIL(ng / 2.0) AS BIGINT)),
madr AS (
  SELECT g, av AS mad
  FROM (SELECT x.g, ABS(x.v - med.m0) AS av,
               ROW_NUMBER() OVER (PARTITION BY x.g
                                  ORDER BY ABS(x.v - med.m0),
                                           x.event_id) AS rn,
               COUNT(*) OVER (PARTITION BY x.g) AS ng
        FROM x JOIN med USING (g))
  WHERE rn = CAST(CEIL(ng / 2.0) AS BIGINT)),
sc AS (
  SELECT med.g, med.m0, CAST({_HUBER_MADK!r} AS DOUBLE) * madr.mad AS s
  FROM med JOIN madr USING (g)),
it0 AS (SELECT g, m0 AS mu FROM sc)"""]
    for i in range(1, _HUBER_ITERS + 1):
        cl = clip.format(p=i - 1, c=_HUBER_C)
        ctes.append(f""",
it{i} AS (
  SELECT x.g, {dsum_sql(cl)} / COUNT(*) AS mu
  FROM x JOIN it{i - 1} USING (g) JOIN sc USING (g)
  GROUP BY x.g)""")
    return ("".join(ctes) + f"""
SELECT sc.g AS event_type,
       {r6_sql('sc.m0')} AS median_start,
       {r6_sql('sc.s')} AS scale_mad,
       {r6_sql(f'it{_HUBER_ITERS}.mu')} AS huber_mu
FROM sc JOIN it{_HUBER_ITERS} ON it{_HUBER_ITERS}.g = sc.g
ORDER BY sc.g
""")


@query("agg_huber_m_location", oracle=_huber_sql())
def agg_huber_m_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUBER M-ESTIMATOR OF LOCATION [PK — Huber 1964; the
    clipped-mean (Winsorized-mean) fixed-point iteration]: per event
    type, start at the deterministic lower median, scale by
    1.4826·MAD (both exact order statistics under a (value, event_id)
    total order), then run 3 fixed iterations of
    μ ← mean(clip(x, μ±1.345s)) — the bounded-influence location
    estimate that loses only ~5% efficiency at the Gaussian yet
    ignores gross outliers, completing the robust-location family
    (agg_trimmed_mean drops a fixed fraction, agg_mad_robust is the
    scale, agg_hodges_lehmann the rank-based point; Huber adapts the
    cutoff to the data's own spread).  Each iteration is ONE
    DECIMAL-summed aggregate of the clipped values joined to the
    per-group scalar (μ, s) — no sorting after the two median passes.
    Scale: two per-group rank windows + 3 hash aggregates; the scalar
    join side is group-domain-bounded."""
    ev = load_table(spark, sf_dir, "events")
    x = (ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
           .select(F.col("event_type").alias("g"),
                   F.col("value").alias("v"), "event_id"))
    x = x.cache()
    wrn = W.partitionBy("g").orderBy("v", "event_id")
    wng = W.partitionBy("g")
    med = (x.select("g", "v", F.row_number().over(wrn).alias("rn"),
                    F.count(F.lit(1)).over(wng).alias("ng"))
            .filter(F.col("rn")
                    == F.ceil(F.col("ng") / 2.0).cast("long"))
            .select("g", F.col("v").alias("m0")))
    xa = (x.join(med, "g")
           .select("g", F.abs(F.col("v") - F.col("m0")).alias("av"),
                   "event_id"))
    wma = W.partitionBy("g").orderBy("av", "event_id")
    madr = (xa.select("g", "av", F.row_number().over(wma).alias("rn"),
                      F.count(F.lit(1)).over(wng).alias("ng"))
              .filter(F.col("rn")
                      == F.ceil(F.col("ng") / 2.0).cast("long"))
              .select("g", F.col("av").alias("mad")))
    # Cached (round-11 optimization): sc is referenced by every
    # iteration's join AND by the final select, and each UNCACHED
    # reference re-ran BOTH per-group rank windows over x (median +
    # MAD — the expensive passes). The mu chain alone references sc
    # 1+2+…+ITERS times via its own lineage, so the window passes
    # executed ~6× (measured 4.0 s → 2.5 s warm at sf0.1). sc is one row
    # per event type — group-domain-bounded, like the cached x.
    sc = (med.join(madr, "g")
             .select("g", "m0",
                     (F.lit(_HUBER_MADK) * F.col("mad")).alias("s"))
             .cache())
    mu = sc.select("g", F.col("m0").alias("mu"))
    for _ in range(_HUBER_ITERS):
        clipped = F.least(
            F.greatest(F.col("v"), F.col("mu") - _HUBER_C * F.col("s")),
            F.col("mu") + _HUBER_C * F.col("s"))
        mu = (x.join(mu, "g")
               .join(sc.select("g", "s"), "g")
               .groupBy("g")
               .agg((dsum(clipped) / F.count(F.lit(1))).alias("mu")))
    return (sc.join(mu, "g")
              .select(F.col("g").alias("event_type"),
                      r6(F.col("m0")).alias("median_start"),
                      r6(F.col("s")).alias("scale_mad"),
                      r6(F.col("mu")).alias("huber_mu"))
              .orderBy("event_type"))
