"""Driver-canonicalizer conformance gate (VERDICT r6 ask #3).

The round-6 driver reds (``array_set_funcs`` ERR, raw array columns;
``scalar_rounding_conventions`` HASH FAIL, signed-zero DOUBLE) shared
one root cause: the repo's own compare was MORE FORGIVING than the
driver's canonicalizer. This module is the gate that emulates the
driver's stricter path — pandas ``sort_values`` over all columns
(throws on unhashable array/map cells) plus a sign-sensitive zero scan
— and would have caught both reds before the driver did:

- ``test_oracle_driver_canon`` sweeps ALL SQL oracles through DuckDB at
  the test fixture and runs ``driver_canon_check`` on each frame (the
  −0.0 in scalar_rounding_conventions and the list columns in
  array_set_funcs both lived on the oracle side too, so this DuckDB-only
  sweep alone catches both; it costs no Spark time).
- The SPARK side of every oracle id is enforced by the same
  ``driver_canon_check`` wired into ``assert_same_result`` — i.e. the
  full-registry parity gate (tests/test_oracle_parity.py) and
  tools/check_subset.py now fail any query whose Spark frame the driver
  could not canonicalize.
- The probe tests pin the two failure classes synthetically so a
  regression in the checker itself is caught.
"""

from __future__ import annotations

import decimal

import pytest

from data_ingestor_and_features_creator_spark import plans

from .oracle_compare import driver_canon_check, duck_fetch

plans.load_all()
_ORACLES = plans.oracles()
_QUERIES = plans.queries()
SQL_IDS = sorted(_ORACLES)


@pytest.mark.parametrize("name", SQL_IDS)
def test_oracle_driver_canon(name, duck):
    pdf = duck_fetch(duck, _ORACLES[name])
    driver_canon_check(name, "duck", list(pdf.columns),
                       list(pdf.itertuples(index=False, name=None)))


def test_probe_unhashable_array_cell_errs():
    """A raw list cell must fail the gate the way the driver ERRs."""
    with pytest.raises(AssertionError, match="sort_values"):
        driver_canon_check("probe_array", "spark", ["k", "xs"],
                           [(1, [1, 2]), (2, [3])])


def test_probe_map_cell_errs():
    with pytest.raises(AssertionError, match="sort_values"):
        driver_canon_check("probe_map", "spark", ["k", "m"],
                           [(1, {"a": 1}), (2, {"b": 2})])


def test_probe_negative_zero_float_fails():
    """−0.0 in a float column must fail even though −0.0 == 0.0."""
    with pytest.raises(AssertionError, match="-0.0"):
        driver_canon_check("probe_negzero", "duck", ["k", "v"],
                           [(1, -0.0), (2, 1.5)])


def test_probe_negative_zero_object_and_decimal_fail():
    with pytest.raises(AssertionError, match="signed zero"):
        driver_canon_check("probe_negzero_obj", "duck", ["k", "v"],
                           [(1, -0.0), (2, "x")])
    with pytest.raises(AssertionError, match="decimal.Decimal"):
        driver_canon_check("probe_negzero_dec", "duck", ["k", "v"],
                           [(1, decimal.Decimal("-0.000")), (2, None)])


def test_probe_decimal_cell_fails():
    """Round 8 (driver red r7, agg_rollup_decimal_exact): ANY Decimal
    cell — even a perfectly ordinary positive one — must fail the gate,
    because the driver's Spark fetch keeps decimal.Decimal while its
    DuckDB fetch degrades to float64 and the cell reprs hash apart."""
    with pytest.raises(AssertionError, match="decimal.Decimal"):
        driver_canon_check(
            "probe_decimal", "spark", ["k", "v"],
            [(1, decimal.Decimal("1008514289.115399985363")), (2, None)])


def _decimal_fields(dt, path=""):
    """Recursively collect DecimalType leaves (incl. inside arrays/
    structs/maps — nested decimals surface as Decimal objects after
    toPandas just the same)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        yield path or "<root>"
    elif isinstance(dt, T.ArrayType):
        yield from _decimal_fields(dt.elementType, path + "[]")
    elif isinstance(dt, T.MapType):
        yield from _decimal_fields(dt.keyType, path + "<key>")
        yield from _decimal_fields(dt.valueType, path + "<value>")
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            yield from _decimal_fields(f.dataType, f"{path}.{f.name}")


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_spark_schema_has_no_decimal_type(name, spark, sf_dir):
    """SHAPE scan over every registered query's Spark output schema
    (VERDICT r7 ask #1, generalized from the round-6 lesson: the gate
    must scan shapes, not just sampled values): no DecimalType column
    may reach the driver boundary — the driver's fetch paths represent
    it divergently (registry.py house rule). This catches a decimal
    output even when the value-level sweep happens not to sample the
    op.

    Round 9 (VERDICT r8 ask 5) piggybacks the GLOBAL-WINDOW plan scan
    on the same build: every unpartitioned Window in the optimized
    plan must sit above an Aggregate/Distinct/Limit/literal boundary —
    a `WindowExec: No Partition Defined` over raw fact rows is the
    single-task 100 TB faceplant this registry bans. The round-9 sweep
    found 7 offenders (raw-row global rank/prefix-sum shortcuts) and
    replaced them with two-pass range-partitioned constructions or
    per-value-histogram windows; this assertion keeps the class dead.

    Round 10 (VERDICT r9 finding 1) piggybacks the STATIC-BROADCAST-
    HINT scan the same way: every `ResolvedHint (strategy=broadcast)`
    subtree in the analyzed plan must be cardinality-bounded — a
    bounding node (Aggregate/Limit/LocalRelation/…) or only
    bounded-domain dim scans (nation/region) — because a static hint
    FORCES the broadcast at any size, and on an SF-scaling side that
    is a driver OOM at cluster scale. The round-10 sweep demoted ~17
    TPC-H-family hints on customer/supplier/part plus 10 more found
    registry-wide (query/eval/centroid sides now carry explicit
    deterministic bounds); the session's two-threshold AQE posture
    earns the broadcasts back from runtime bytes."""
    from tools.scan_broadcast_hints import find_scaling_broadcast_hints
    from tools.scan_global_windows import find_unbounded_global_windows

    df = _QUERIES[name](spark, sf_dir)
    bad = [f"{f.name}:{sub}" for f in df.schema.fields
           for sub in _decimal_fields(f.dataType)]
    assert not bad, (
        f"{name}: DecimalType at the driver boundary in {bad} — emit "
        f"the fixed-point STRING (dsum_dec_str) or a double/bigint "
        f"(plans/registry.py house rule).")
    unbounded = find_unbounded_global_windows(df)
    assert not unbounded, (
        f"{name}: unpartitioned Window over unbounded input {unbounded}"
        f" — use the two-pass range-partitioned global index "
        f"(data_global_index pattern) or window over a per-value/"
        f"per-group aggregate instead.")
    hinted = find_scaling_broadcast_hints(df)
    assert not hinted, (
        f"{name}: static broadcast hint over an SF-scaling side "
        f"{hinted} — drop the hint (AQE earns the broadcast from "
        f"runtime bytes) or make the side's bound explicit with a "
        f"deterministic .limit (see tools/scan_broadcast_hints.py).")


def test_oracle_schema_has_no_scaled_decimal(duck):
    """Oracle-side twin of the shape scan, execution-free: DESCRIBE
    every SQL oracle and fail on any DECIMAL(p, s>0) output column
    (scale-0 decimals are DuckDB's HUGEINT image — the .df() float64
    degradation there is driver-faithful and house-rule-covered by
    the BIGINT-cast rule)."""
    import re

    dec_re = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")
    bad = []
    for name in SQL_IDS:
        for col, typ, *_ in duck.execute(
                "DESCRIBE " + _ORACLES[name]).fetchall():
            m = dec_re.match(typ or "")
            if m and int(m.group(2)) > 0:
                bad.append((name, col, typ))
    assert not bad, bad


def test_probe_clean_frame_passes():
    driver_canon_check("probe_clean", "spark", ["k", "v", "s"],
                       [(1, 0.0, "a,b"), (2, -1.25, ""), (3, None, None)])


def test_round6_reds_now_conform(spark, duck, sf_dir):
    """End-to-end: the two round-6 driver-red ids, Spark AND oracle
    frames, through the strict gate (they must stay conformant)."""
    for name in ("array_set_funcs", "scalar_rounding_conventions"):
        sdf = _QUERIES[name](spark, sf_dir).toPandas()
        driver_canon_check(name, "spark", list(sdf.columns),
                           list(sdf.itertuples(index=False, name=None)))
        ddf = duck_fetch(duck, _ORACLES[name])
        driver_canon_check(name, "duck", list(ddf.columns),
                           list(ddf.itertuples(index=False, name=None)))
