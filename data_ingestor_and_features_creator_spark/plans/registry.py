"""Registry mapping SURVEY.md §2 operator ids → (Spark query, oracle SQL).

Usage::

    @query("agg_basic", oracle="SELECT ... FROM lineitem ...")
    def agg_basic(spark, sf_dir):
        return ...DataFrame...

House rules for oracle hash-stability (SURVEY.md §5, §7 risk list):

- Alias every computed column identically in Spark and SQL.
- Raw SUMs over many doubles are computed through DECIMAL(38,6) on BOTH
  sides (exact arithmetic → bit-identical doubles after the final cast);
  see functions/exact.py. Normalized stats (avg/stddev/corr/...) carry
  ~1e-11 absolute error → rounded to 6 dp on both sides.
- Every LIMIT is preceded by a total order (unique tiebreak column).
- Timestamps leave queries as DATE (to_date/date_trunc) or epoch BIGINT,
  never raw (ns vs µs truncation drift).
- Integer SUMs are CAST(... AS BIGINT) in DuckDB (its SUM(BIGINT) is
  HUGEINT, Spark's is LONG).
- BOOLEAN output columns must be NON-NULLABLE (COALESCE the flag to
  false): a boolean NULL survives Spark's pandas conversion as None
  but DuckDB's .df() turns it into float NaN — the two canonicalize
  differently (observed: win_anomaly_zscore). Nullable DOUBLEs are
  fine (both paths collapse NULL→NaN).
- Never ROUND a value that can land exactly on a .xxxxxx5 boundary
  (power-of-two-weighted sums do): Spark rounds half-up, DuckDB
  half-even. Emit unrounded when the fold order is fixed (win_ewma).
- A hash-checked DOUBLE must never be able to carry −0.0: the driver's
  hash formats the sign, so DuckDB's `2.0 * round(-0.25)` = −0.0 vs
  Spark bround's BigDecimal +0.0 hash-mismatches (round-6
  scalar_rounding_conventions). Normalize with `+ 0.0` (IEEE:
  −0.0 + 0.0 = +0.0) or emit an integer type when exact.
- No raw array/map columns in hash-checked output: the driver's
  canonicalizer pandas-sorts every column and list cells are
  unhashable there (round-6 array_set_funcs ERR). Serialize with
  array_join/array_to_string (sorted first when set-semantic) or a
  key-sorted k:v CSV for maps (agg_map_counts precedent).
- No DecimalType column may reach hash-checked output (round-7 driver
  red, agg_rollup_decimal_exact): the driver's two fetch paths
  REPRESENT a decimal differently — Spark toPandas keeps
  decimal.Decimal('…115399985363'), DuckDB's pandas fetch degrades to
  float64 ('…1154') — identical values, divergent cell reprs, hash
  mismatch. When >16-significant-digit exactness must survive, emit
  the decimal's fixed-point STRING (dsum_dec_str / dsum_dec_str_sql:
  both engines print DECIMAL(38,12) identically, incl. zero/negatives
  — digit-exact at any magnitude AND hash-stable); when the magnitude
  fits a double, dsum_str. Enforced by driver_canon_check (rejects any
  Decimal cell) and the schema scan in tests/test_driver_canon.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..scratch import scratch_dir  # noqa: F401  (re-export for plan modules)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
MODULES: dict[str, str] = {}  # query id -> defining module basename


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under a SURVEY.md §2 operator id.

    ``oracle`` is the DuckDB-dialect ANSI SQL twin; omit it for
    non-SQL-expressible operators (driver then runs the weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        MODULES[name] = fn.__module__.rsplit(".", 1)[-1]
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
