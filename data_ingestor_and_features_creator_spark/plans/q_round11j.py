"""Round-11 operator batch J (SURVEY.md §2 growth): model-evaluation
completions — calibration TESTS (Spiegelhalter z, Hosmer-Lemeshow),
multi-rater agreement (Fleiss' kappa), and ranking similarity
(rank-biased overlap).

Provenance ([PK], empty reference checkout — SURVEY §0): Spiegelhalter
1986 (Statistics in Medicine); Hosmer & Lemeshow 1980; Fleiss 1971;
Webber, Moffat & Zobel 2010 (RBO, TOIS).

Registered AFTER every earlier module so the driver-budget rotation
(plans/__init__.py) keeps the existing never-sampled backlog ahead of
these in the class-1 queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum, dsum_sql, r6, r6_sql
from .q_round6j import _SCORED_SQL, _scored
from .registry import query

# ---------------------------------------------------------------------------
# Spiegelhalter's calibration z-test
# ---------------------------------------------------------------------------

_SPIEG_SQL = f"""
WITH {_SCORED_SQL},
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {dsum_sql('(y - p) * (1.0 - 2.0 * p)')} AS num,
         {dsum_sql('(1.0 - 2.0 * p) * (1.0 - 2.0 * p)'
                   ' * p * (1.0 - p)')} AS den
  FROM scored)
SELECT n, {r6_sql('num')} AS num,
       {r6_sql('num / SQRT(den)')} AS z
FROM s
"""


@query("ml_spiegelhalter_z", oracle=_SPIEG_SQL)
def ml_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPIEGELHALTER'S CALIBRATION Z-TEST [PK — Spiegelhalter 1986]:
    decomposes the Brier score and tests the CALIBRATION component
    alone — z = Σ(y−p)(1−2p) / sqrt(Σ(1−2p)²p(1−p)), asymptotically
    N(0,1) when the forecast probabilities are perfectly calibrated.
    The hypothesis-test companion to ml_ece_calibration (an effect
    size) and ml_brier_score (a combined score): a large |z| says the
    miscalibration is statistically real, not binning noise.  Shares
    the q_round6j score fixture; both sums run through DECIMAL(38,12)
    on identical per-row doubles, the z is one identical double
    expression under sqrt.  Scale: one map-side-combined aggregate
    over one scan."""
    sc = _scored(spark, sf_dir)
    y, p = F.col("y"), F.col("p")
    s = sc.agg(F.count(F.lit(1)).cast("long").alias("n"),
               dsum((y - p) * (1.0 - 2.0 * p)).alias("num"),
               dsum((1.0 - 2.0 * p) * (1.0 - 2.0 * p)
                    * p * (1.0 - p)).alias("den"))
    return s.select("n", r6(F.col("num")).alias("num"),
                    r6(F.col("num") / F.sqrt(F.col("den"))).alias("z"))


# ---------------------------------------------------------------------------
# Hosmer-Lemeshow goodness-of-fit over deciles of risk
# ---------------------------------------------------------------------------

_HL_SQL = f"""
WITH {_SCORED_SQL},
cells AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM scored GROUP BY p),
nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
binned AS (
  SELECT p, cnt, pos,
         CAST((COALESCE(SUM(cnt) OVER (ORDER BY p
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) * 10)
              // (SELECT n FROM nn) AS BIGINT) AS bin
  FROM cells),
g AS (
  SELECT bin, CAST(SUM(cnt) AS BIGINT) AS n_b,
         CAST(SUM(pos) AS BIGINT) AS obs_pos,
         {dsum_sql('p * cnt')} AS exp_pos
  FROM binned GROUP BY bin),
g2 AS (
  SELECT bin, n_b, obs_pos, {r6_sql('exp_pos')} AS exp_pos FROM g),
gc AS (
  SELECT bin, n_b, obs_pos, exp_pos,
         {r6_sql('(obs_pos - exp_pos) * (obs_pos - exp_pos)'
                 ' / (exp_pos * (1.0 - exp_pos / n_b))')} AS contrib
  FROM g2),
tot AS (SELECT {dsum_sql('contrib')} AS hl FROM gc)
SELECT gc.bin, gc.n_b, gc.obs_pos, gc.exp_pos, gc.contrib,
       {r6_sql('tot.hl')} AS hl_stat
FROM gc, tot ORDER BY gc.bin
"""


@query("ml_hosmer_lemeshow", oracle=_HL_SQL)
def ml_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOSMER-LEMESHOW GOODNESS-OF-FIT [PK — Hosmer & Lemeshow 1980]:
    partition the score fixture into DECILES OF RISK and compare
    observed vs expected positives per decile, C = Σ_g (O_g − E_g)² /
    (E_g(1 − E_g/n_g)) ~ χ²₈ under fit — the classical per-decile
    calibration table every clinical-model report prints, next to
    Spiegelhalter's single-z and ECE's effect size.  Deciles are
    assigned VALUE-ATOMICALLY (all rows sharing a score stay in one
    bin — the textbook requirement): aggregate to distinct-score
    cells, one cumulative window over cells (ml_auc_roc idiom — no
    raw-row global window), bin = 10·cum_before // n.  Expected
    positives run through DECIMAL(38,12); each decile row plus the
    repeated total is emitted.  Scale: fact rows collapse to distinct
    scores at step one."""
    sc = _scored(spark, sf_dir)
    cells = (sc.groupBy("p")
               .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                    F.sum("y").cast("long").alias("pos")))
    nn = cells.agg(F.sum("cnt").cast("long").alias("n"))
    wc = W.orderBy("p").rowsBetween(W.unboundedPreceding, -1)
    binned = (cells
              .withColumn("cum0", F.coalesce(F.sum("cnt").over(wc),
                                             F.lit(0).cast("long")))
              .crossJoin(F.broadcast(nn))
              .withColumn("bin", F.expr("(cum0 * 10) div n")))
    g = (binned.groupBy("bin")
               .agg(F.sum("cnt").cast("long").alias("n_b"),
                    F.sum("pos").cast("long").alias("obs_pos"),
                    dsum(F.col("p") * F.col("cnt")).alias("exp0")))
    g2 = g.select("bin", "n_b", "obs_pos",
                  r6(F.col("exp0")).alias("exp_pos"))
    ep = F.col("exp_pos")
    gc = g2.select(
        "bin", "n_b", "obs_pos", "exp_pos",
        r6((F.col("obs_pos") - ep) * (F.col("obs_pos") - ep)
           / (ep * (1.0 - ep / F.col("n_b")))).alias("contrib"))
    tot = gc.agg(dsum("contrib").alias("hl"))
    return (gc.crossJoin(F.broadcast(tot))
              .select("bin", "n_b", "obs_pos", "exp_pos", "contrib",
                      r6(F.col("hl")).alias("hl_stat"))
              .orderBy("bin"))


# ---------------------------------------------------------------------------
# Fleiss' kappa
# ---------------------------------------------------------------------------

_FLEISS_N_RATERS = 4

_FLEISS_SQL = f"""
WITH votes AS (
  SELECT l_orderkey AS item, l_returnflag AS cat
  FROM (SELECT l_orderkey, l_returnflag,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey,
                                           l_suppkey, l_extendedprice,
                                           l_returnflag)
                 AS rn
        FROM lineitem)
  WHERE rn <= {_FLEISS_N_RATERS}),
full_items AS (
  SELECT item FROM votes GROUP BY item
  HAVING COUNT(*) = {_FLEISS_N_RATERS}),
nij AS (
  SELECT v.item, v.cat, CAST(COUNT(*) AS BIGINT) AS c
  FROM votes v JOIN full_items USING (item)
  GROUP BY v.item, v.cat),
per_item AS (
  SELECT item, CAST(SUM(c * c) AS BIGINT) AS ss FROM nij GROUP BY item),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(ss) AS BIGINT) AS sss
  FROM per_item),
pj AS (
  SELECT cat, CAST(SUM(c) AS BIGINT) AS tc FROM nij GROUP BY cat),
pe AS (
  SELECT {dsum_sql('(CAST(tc AS DOUBLE) / (b.n_items * '
                   f'{_FLEISS_N_RATERS}.0)) * '
                   '(CAST(tc AS DOUBLE) / (b.n_items * '
                   f'{_FLEISS_N_RATERS}.0))')} AS pbar_e
  FROM pj, base b)
SELECT b.n_items, {_FLEISS_N_RATERS} AS n_raters,
  {r6_sql(f'(CAST(b.sss AS DOUBLE) - b.n_items * {_FLEISS_N_RATERS})'
          f' / (b.n_items * {_FLEISS_N_RATERS}.0'
          f' * ({_FLEISS_N_RATERS} - 1))')} AS pbar,
  {r6_sql('pe.pbar_e')} AS pbar_e,
  {r6_sql(f'((CAST(b.sss AS DOUBLE) - b.n_items * {_FLEISS_N_RATERS})'
          f' / (b.n_items * {_FLEISS_N_RATERS}.0'
          f' * ({_FLEISS_N_RATERS} - 1)) - pe.pbar_e)'
          ' / (1.0 - pe.pbar_e)')} AS kappa
FROM base b, pe
"""


@query("ml_fleiss_kappa", oracle=_FLEISS_SQL)
def ml_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLEISS' KAPPA [PK — Fleiss 1971]: chance-corrected agreement
    for a FIXED NUMBER of raters per item — the multi-rater
    generalization of ml_cohen_kappa (which handles exactly two).  The
    labeling panel is deterministic: items are orders with ≥ 4
    lineitems, the 4 'raters' are the first 4 lineitems under a
    (linenumber, partkey, suppkey, price, returnflag) order — ties
    beyond that key agree on the category, so the panel's vote
    multiset is deterministic — and the 'category' each assigns is
    its return flag — a real consensus-labeling shape (do an order's
    first four lines agree on return status?).  κ = (P̄ − P̄e)/(1 −
    P̄e) with P̄ from exact integer Σn_ij² and P̄e from the squared
    marginal shares (DECIMAL-summed over the |categories|-bounded
    marginals).  Scale: one per-item window bounded by the rater cap,
    two hash aggregates; everything after the first groupBy is
    category-domain-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    # The sort key ends at l_returnflag: any rows still tied agree on
    # the category, so the chosen panel's vote multiset is unique even
    # when the blown-up fixture holds full-duplicate lines.
    wv = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_returnflag")
    votes = (li.select(F.col("l_orderkey").alias("item"),
                       F.col("l_returnflag").alias("cat"),
                       F.row_number().over(wv).alias("rn"))
               .filter(F.col("rn") <= _FLEISS_N_RATERS))
    full_items = (votes.groupBy("item")
                       .agg(F.count(F.lit(1)).alias("nv"))
                       .filter(F.col("nv") == _FLEISS_N_RATERS)
                       .select("item"))
    nij = (votes.join(full_items, "item")
                .groupBy("item", "cat")
                .agg(F.count(F.lit(1)).cast("long").alias("c")))
    nij = nij.cache()
    per_item = nij.groupBy("item").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"))
    base = per_item.agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                        F.sum("ss").cast("long").alias("sss"))
    pj = nij.groupBy("cat").agg(F.sum("c").cast("long").alias("tc"))
    m = _FLEISS_N_RATERS
    pe = (pj.crossJoin(F.broadcast(base))
            .agg(dsum((F.col("tc").cast("double")
                       / (F.col("n_items") * float(m)))
                      * (F.col("tc").cast("double")
                         / (F.col("n_items") * float(m))))
                 .alias("pbar_e")))
    pbar = ((F.col("sss").cast("double") - F.col("n_items") * m)
            / (F.col("n_items") * float(m) * (m - 1)))
    return (base.crossJoin(F.broadcast(pe))
                .select("n_items", F.lit(m).alias("n_raters"),
                        r6(pbar).alias("pbar"),
                        r6(F.col("pbar_e")).alias("pbar_e"),
                        r6((pbar - F.col("pbar_e"))
                           / (1.0 - F.col("pbar_e"))).alias("kappa")))


# ---------------------------------------------------------------------------
# Rank-biased overlap between two revenue rankings
# ---------------------------------------------------------------------------

_RBO_D = 50
_RBO_P = 0.9

_RBO_SQL = f"""
WITH rev AS (
  SELECT l_partkey,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS rev
  FROM lineitem
  WHERE EXTRACT(YEAR FROM l_shipdate) IN (1995, 1996)
  GROUP BY l_partkey, EXTRACT(YEAR FROM l_shipdate)),
ra AS (
  SELECT l_partkey, rnk FROM (
    SELECT l_partkey,
           ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey) AS rnk
    FROM rev WHERE yr = 1995) WHERE rnk <= {_RBO_D}),
rb AS (
  SELECT l_partkey, rnk FROM (
    SELECT l_partkey,
           ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey) AS rnk
    FROM rev WHERE yr = 1996) WHERE rnk <= {_RBO_D}),
common AS (
  SELECT ra.l_partkey,
         GREATEST(ra.rnk, rb.rnk) AS md
  FROM ra JOIN rb USING (l_partkey)),
w AS (
  SELECT d,
         ROUND(POWER({_RBO_P!r}, d - 1) / d, 12) AS wd
  FROM (SELECT UNNEST(generate_series(1, {_RBO_D})) AS d)),
wt AS (
  SELECT d,
         CAST(SUM(CAST(wd AS DECIMAL(38,12)))
              OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS DOUBLE) AS tail
  FROM w),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
         {dsum_sql('wt.tail')} AS swt
  FROM common JOIN wt ON wt.d = common.md)
SELECT {_RBO_D} AS depth, CAST({_RBO_P!r} AS DOUBLE) AS p,
       n_common, {r6_sql(f'(1.0 - {_RBO_P!r}) * swt')} AS rbo
FROM s
"""


@query("ml_rank_biased_overlap", oracle=_RBO_SQL)
def ml_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP [PK — Webber, Moffat & Zobel 2010]: the
    top-weighted similarity between two rankings — here the top-50
    parts by 1995 revenue vs by 1996 revenue — truncated RBO_d =
    (1−p)·Σ_{d≤D} p^{d−1}·|A_:d ∩ B_:d|/d with p = 0.9.  Instead of
    materializing all D prefix intersections, each COMMON part
    contributes the closed tail weight W(m) = Σ_{d=m..D} p^{d−1}/d
    from its first co-appearance depth m = max(rank_A, rank_B) — the
    D-row weight table is generated once (each p^{d−1}/d pinned to
    12 dp; POWER drifts a ulp cross-engine), reverse-cumulated, and
    equi-joined to the common parts.  Rankings order by the
    DECIMAL-exact revenue (bit-identical cross-engine) with partkey
    tiebreak, so ranks can never flip.  Scale: one aggregate per
    year-partition + two top-D windows; the weight join is
    broadcast-sized (D rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (li.filter(F.year("l_shipdate").isin(1995, 1996))
             .groupBy("l_partkey",
                      F.year("l_shipdate").cast("long").alias("yr"))
             .agg(dsum(F.col("l_extendedprice")
                       * (1.0 - F.col("l_discount"))).alias("rev")))
    rev = rev.cache()

    def _top(yr: int) -> DataFrame:
        # TakeOrderedAndProject bounds the set to D rows BEFORE the
        # rank window runs (the window input is 50 rows, not the
        # SF-scaling part domain).
        wr = W.orderBy(F.desc("rev"), "l_partkey")
        return (rev.filter(F.col("yr") == yr)
                   .orderBy(F.desc("rev"), "l_partkey").limit(_RBO_D)
                   .withColumn("rnk", F.row_number().over(wr))
                   .select("l_partkey", "rnk"))

    ra = _top(1995).withColumnRenamed("rnk", "rnk_a")
    rb = _top(1996).withColumnRenamed("rnk", "rnk_b")
    common = (ra.join(rb, "l_partkey")
                .select(F.greatest("rnk_a", "rnk_b").alias("md")))
    w = (spark.range(1, _RBO_D + 1).toDF("d")
              .select("d", F.round(F.pow(F.lit(_RBO_P),
                                         F.col("d") - 1) / F.col("d"),
                              12).alias("wd")))
    wtw = W.orderBy("d").rowsBetween(0, W.unboundedFollowing)
    wt = w.select("d", F.sum(F.col("wd").cast("decimal(38,12)"))
                       .over(wtw).cast("double").alias("tail"))
    s = (common.join(F.broadcast(wt),
                     F.col("md") == F.col("d"))
               .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
                    dsum("tail").alias("swt")))
    return s.select(F.lit(_RBO_D).alias("depth"),
                    F.lit(_RBO_P).cast("double").alias("p"),
                    "n_common",
                    r6((1.0 - _RBO_P) * F.col("swt")).alias("rbo"))
