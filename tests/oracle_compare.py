"""Order-insensitive result comparison mimicking the driver's oracle check.

The driver sorts columns by name and value-hashes rows (SURVEY.md §5).
Here we normalize every cell to a canonical string (floats at 6 dp —
queries are required to emit only 6-dp-rounded or exact-decimal floats,
see plans/registry.py house rules), sort rows, and diff the multisets,
printing the first divergences on failure.
"""

from __future__ import annotations

import datetime
import decimal
import math
import re
from typing import Any

_DEC_RE = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")


def duck_fetch(con, sql: str):
    """Fetch an oracle result as pandas the way the driver does —
    ``.df()``, where HUGEINT and DECIMAL degrade to float64 — EXCEPT
    when the statement produces true decimal columns (scale > 0):
    those queries fetch ONCE through Arrow so the decimal cells stay
    exact ``decimal.Decimal`` (the pandas float64 degradation is the
    thing that hid the DECIMAL→DOUBLE last-ulp divergence at e10
    magnitudes, functions/exact.py). Inside the Arrow path, scale-0
    decimal128 columns (DuckDB's HUGEINT image) are cast back to
    float64 to keep the driver-faithful HUGEINT degradation. One
    execution either way — two executions could interleave rows
    differently under DuckDB's parallel hash aggregate and corrupt a
    column-patch. Only decimal-emitting oracles see the Arrow dtype
    mapping (dates come back as datetime.date, NULL booleans as None);
    norm_cell canonicalizes both mappings identically for every type
    the house rules allow in results."""
    dec_cols = []
    try:
        for name, typ, *_ in con.execute("DESCRIBE " + sql).fetchall():
            m = _DEC_RE.match(typ or "")
            if m and int(m.group(2)) > 0:
                dec_cols.append(name)
    except Exception as exc:
        # A DESCRIBE failure would silently downgrade a decimal-emitting
        # oracle to the float64 .df() path — exactly the masking the
        # exact-decimal gate exists to remove. Every house-rule oracle is
        # a DESCRIBE-able SELECT/WITH, so this is a hard error, not a
        # fallback (ADVICE r5).
        raise RuntimeError(
            f"DESCRIBE failed for oracle (decimal detection would be "
            f"silently skipped): {exc}\nSQL: {sql[:200]}"
        ) from exc
    if not dec_cols:
        return con.execute(sql).df()
    import pyarrow as pa

    tbl = con.execute(sql).arrow()
    pdf = tbl.to_pandas()
    for field in tbl.schema:
        if pa.types.is_decimal(field.type) and field.type.scale == 0:
            pdf[field.name] = pdf[field.name].astype("float64")
    return pdf


def norm_cell(v: Any) -> str:
    import numpy as np

    if v is None:
        return "<NULL>"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, decimal.Decimal):
        # Exact-decimal path (round 5): a decimal whose value survives
        # the float round-trip compares through the float pipeline (so
        # a DECIMAL on one side can match a float64 of the same value
        # on the other); one that does NOT fit a double (>~16
        # significant digits — the whole point of DECIMAL-typed
        # outputs, see functions/exact.py scale-limit note) compares
        # by its exact normalized fixed-point digits, so engines must
        # agree to the last decimal digit, not the last ulp.
        # Faithful iff the float's shortest round-trip repr reproduces
        # the decimal's value (NOT Decimal(f) == v — a double's exact
        # binary expansion almost never equals a nice decimal like
        # 0.025 even though the float carries full information).
        f = float(v)
        if math.isfinite(f) and decimal.Decimal(repr(f)) == v:
            v = f
        else:
            return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if math.isinf(v):
            return "<Inf>" if v > 0 else "<-Inf>"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return f"{v:.6f}"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        # DuckDB .df() renders DATE as midnight datetime64 while Spark
        # keeps datetime.date; house rules forbid raw timestamps in
        # results, so a midnight datetime IS a date — collapse it.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def driver_canon_check(name: str, side: str,
                       columns: list[str], rows: list[tuple]) -> None:
    """Emulate the DRIVER canonicalizer's two strictnesses that this
    repo's own compare is (deliberately) forgiving about — both bit us
    in round 6, both now house rules (plans/registry.py):

    1. The driver pandas-``sort_values`` over ALL columns before
       hashing; a raw array/map cell is unhashable inside pandas'
       factorize and the whole check ERRs (round-6 ``array_set_funcs``).
       We reproduce the exact operation on the exact frame.
    2. The driver's cell formatter is SIGN-SENSITIVE on zero: a −0.0
       on one engine vs +0.0 on the other hash-mismatches even though
       pandas/norm_cell equality collapses them (round-6
       ``scalar_rounding_conventions``). We scan every float (and
       Decimal) cell for signed zero and fail on ANY occurrence —
       "never able to carry −0.0" is the rule, not "both sides agree".

    3. (Round 7/8, ``agg_rollup_decimal_exact``.) The driver's two
       fetch paths REPRESENT a DecimalType cell differently — Spark
       toPandas keeps ``decimal.Decimal``, DuckDB's pandas fetch
       degrades to float64 — so identical values hash differently.
       norm_cell deliberately forgives this (a Decimal may match a
       float64 of the same value); the driver does not. ANY
       ``decimal.Decimal`` cell in a hash-checked frame fails here:
       emit the fixed-point STRING instead (functions/exact.py
       dsum_dec_str — both engines print DECIMAL(38,12) identically).

    Called from assert_same_result on BOTH frames, so the full-registry
    parity gate (tests/test_oracle_parity.py) and tools/check_subset.py
    enforce driver conformance on every run; tests/test_driver_canon.py
    additionally sweeps all oracles and probes the failure classes."""
    import math

    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(columns))
    if len(pdf):
        try:
            pdf.sort_values(by=list(pdf.columns), kind="mergesort")
        except Exception as exc:
            raise AssertionError(
                f"{name} [{side}]: driver canonicalizer would ERR — "
                f"pandas sort_values over all columns raised {exc!r}. "
                f"Serialize array/map output columns "
                f"(plans/registry.py house rule)."
            ) from exc
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype.kind == "f":
            a = s.to_numpy()
            bad = np.signbit(a) & (a == 0.0)
            if bad.any():
                raise AssertionError(
                    f"{name} [{side}]: column {col!r} carries -0.0 "
                    f"({int(bad.sum())} cells) — the driver's hash is "
                    f"sign-sensitive; normalize with `+ 0.0` or emit an "
                    f"integer type (plans/registry.py house rule).")
        elif s.dtype == object:
            for v in s:
                if isinstance(v, decimal.Decimal):
                    raise AssertionError(
                        f"{name} [{side}]: column {col!r} carries a "
                        f"decimal.Decimal cell ({v!r}) — the driver's "
                        f"fetch paths represent DecimalType divergently "
                        f"(Spark keeps Decimal, DuckDB degrades to "
                        f"float64; round-7 agg_rollup_decimal_exact "
                        f"red). Emit the fixed-point STRING instead "
                        f"(dsum_dec_str, plans/registry.py house rule).")
                if (isinstance(v, float) and v == 0.0
                        and math.copysign(1.0, v) < 0.0):
                    raise AssertionError(
                        f"{name} [{side}]: column {col!r} carries a "
                        f"signed zero ({v!r}) — the driver's hash is "
                        f"sign-sensitive; normalize with `+ 0.0` "
                        f"(plans/registry.py house rule).")


def assert_same_result(name: str,
                       spark_cols: list[str], spark_rows: list[tuple],
                       duck_cols: list[str], duck_rows: list[tuple]) -> None:
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    driver_canon_check(name, "spark", spark_cols, spark_rows)
    driver_canon_check(name, "duck", duck_cols, duck_rows)
    s = normalize(spark_cols, spark_rows)
    d = normalize(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        # Hoist the sets: evaluating set(d) inside the comprehension
        # condition rebuilds it PER ROW — O(n²) — which turned a 60k-row
        # mismatch report into a >9-minute hang (round 6, win_vwap).
        d_set, s_set = set(d), set(s)
        only_s = [r for r in s if r not in d_set][:5]
        only_d = [r for r in d if r not in s_set][:5]
        raise AssertionError(
            f"{name}: value mismatch (cols sorted: {sorted(spark_cols)})\n"
            f"first paired diffs: {diffs}\n"
            f"only in spark: {only_s}\nonly in duck: {only_d}"
        )


# ---------------------------------------------------------------------------
# Distributed (in-engine) digest compare — the UNBOUNDED check path
# ---------------------------------------------------------------------------
#
# The pandas path above routes the full result through the driver
# (spark.driver.maxResultSize bounds it: time_bucket_gapfill's 125.8M-row
# grid at the 30x blow-up exceeded it, BASELINE.md round-5 row). This path
# instead computes an ORDER-INSENSITIVE 64-bit-per-row digest INSIDE each
# engine and compares three scalars (row count, digest sum, column set):
#
#   row_str  = canonical VARCHAR per cell (identical formatting rules in
#              Spark SQL and DuckDB SQL), cells joined with chr(31),
#              columns in sorted-name order, NULL -> '<NULL>'
#   digest   = SUM over rows of lower-64-bits(md5(row_str))
#              - DuckDB: md5_number_lower(row_str)       (UBIGINT -> HUGEINT sum)
#              - Spark:  conv(byte-swapped hex[17..32] of md5(row_str), 16, 10)
#                        cast DECIMAL(20,0)              (DECIMAL(30,0) sum)
#              byte order verified identical (probe test in
#              tests/test_digest_compare.py); sums are exact in both engines
#              up to ~5e10 rows (DECIMAL(30,0) / 2^64) — far beyond any
#              fixture — so the compare never truncates or degrades.
#
# Both aggregations reduce to ONE row per engine; nothing scales with the
# result size on the driver, so the check is bounded only by the engines
# themselves. Canonicalization mirrors norm_cell: floats at 6 dp (house
# rule: queries emit 6-dp-rounded or exact-decimal floats — ties at the
# 7th digit cannot survive the 6-dp pre-round, so HALF_UP-vs-HALF_EVEN
# formatter differences are unreachable), -0.0 collapsed, NaN/Inf
# sentinels, decimals at full declared scale, dates ISO, booleans
# lowercase. Complex types (array/map/struct) and raw timestamps raise —
# those results are small-by-construction in the registry and use the
# pandas path.
#
# The 6-dp-pre-round precondition is LOAD-BEARING, not advisory (probed
# round 6, win_vwap at the 6M-row blow-up): for BIT-IDENTICAL doubles,
# Java's format_string('%.6f', d) rounds the double's SHORTEST DECIMAL
# REPR half-up, while C printf (DuckDB) and Python round the EXACT
# BINARY EXPANSION — so any double whose shortest repr terminates at the
# 7th fractional digit in 5 (e.g. 5e-7 → Spark '0.000001', DuckDB
# '0.000000'; pinned in tests/test_digest_compare.py) digests
# differently despite equal values. Ratios of short-decimal rationals
# land on that grid with real probability. Ops that legitimately emit
# UNROUNDED doubles (win_vwap, win_kalman_filter) therefore verify on
# the pandas path — where both engines' values flow through ONE Python
# formatter — and must not be digest-checked.

_CHR_SEP = 31  # unit separator; cannot appear in house-rule string outputs


def _canon_spark(col: str, dtype: str) -> str:
    c = f"`{col}`"
    base = dtype.split("(")[0]
    if base in ("tinyint", "smallint", "int", "bigint", "boolean",
                "date", "decimal"):
        return f"CAST({c} AS STRING)"
    if base == "string":
        return c
    if base in ("float", "double"):
        d = f"CAST({c} AS DOUBLE)"
        return (f"CASE WHEN {c} IS NULL THEN '<NULL>' "
                f"WHEN isnan({d}) THEN '<NaN>' "
                f"WHEN {d} = double('Infinity') THEN '<Inf>' "
                f"WHEN {d} = double('-Infinity') THEN '<-Inf>' "
                f"WHEN {d} = 0.0D THEN '0.000000' "
                f"ELSE format_string('%.6f', {d}) END")
    raise ValueError(f"digest compare: unsupported Spark type {dtype} "
                     f"for column {col} (use the pandas path)")


def _canon_duck(col: str, typ: str) -> str:
    c = f'"{col}"'
    t = typ.upper().split("(")[0].strip()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "BOOLEAN",
             "DATE", "DECIMAL"):
        return f"CAST({c} AS VARCHAR)"
    if t == "VARCHAR":
        return c
    if t in ("FLOAT", "DOUBLE", "REAL"):
        d = f"CAST({c} AS DOUBLE)"
        return (f"CASE WHEN {c} IS NULL THEN '<NULL>' "
                f"WHEN isnan({d}) THEN '<NaN>' "
                f"WHEN {d} = 'infinity'::DOUBLE THEN '<Inf>' "
                f"WHEN {d} = '-infinity'::DOUBLE THEN '<-Inf>' "
                f"WHEN {d} = 0.0 THEN '0.000000' "
                f"ELSE printf('%.6f', {d}) END")
    raise ValueError(f"digest compare: unsupported DuckDB type {typ} "
                     f"for column {col} (use the pandas path)")


def spark_digest(sdf) -> tuple[int, int, list[str]]:
    """(row_count, digest_sum, sorted_columns) computed fully in-engine;
    only two scalars come back to the driver."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    dtypes = dict(sdf.dtypes)
    cells = [f"COALESCE({_canon_spark(c, dtypes[c])}, '<NULL>')"
             for c in cols]
    row = "concat_ws(chr(31), " + ", ".join(cells) + ")"
    pairs = "||".join(f"substring(md5({row}), {i}, 2)"
                      for i in range(31, 15, -2))
    lo64 = f"CAST(conv(upper({pairs}), 16, 10) AS DECIMAL(20,0))"
    out = sdf.select(F.expr(lo64).alias("h")) \
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("h").cast("decimal(38,0)").alias("d")) \
             .collect()[0]
    return int(out["n"]), int(out["d"] or 0), cols


def duck_digest(con, sql: str) -> tuple[int, int, list[str]]:
    desc = con.execute("DESCRIBE " + sql).fetchall()
    cols = sorted(name for name, *_ in desc)
    types = {name: typ for name, typ, *_ in desc}
    cells = [f"COALESCE({_canon_duck(c, types[c])}, '<NULL>')"
             for c in cols]
    row = "concat_ws(chr(31), " + ", ".join(cells) + ")"
    n, d = con.execute(
        f"SELECT COUNT(*), CAST(COALESCE(SUM(md5_number_lower({row})), 0)"
        f" AS VARCHAR) FROM ({sql}) __q"
    ).fetchone()
    return int(n), int(d), cols


def assert_same_digest(name: str, sdf, con, oracle_sql: str) -> int:
    """Unbounded order-insensitive compare; returns the row count."""
    sn, sd, scols = spark_digest(sdf)
    dn, dd, dcols = duck_digest(con, oracle_sql)
    assert scols == dcols, (
        f"{name}: column mismatch spark={scols} duck={dcols}")
    assert sn == dn, f"{name}: row count spark={sn} duck={dn}"
    assert sd == dd, (
        f"{name}: digest mismatch over {sn} rows "
        f"(spark={sd} duck={dd}) — values differ")
    return sn
