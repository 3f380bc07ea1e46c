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


def assert_same_result(name: str,
                       spark_cols: list[str], spark_rows: list[tuple],
                       duck_cols: list[str], duck_rows: list[tuple]) -> None:
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = normalize(spark_cols, spark_rows)
    d = normalize(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        only_s = [r for r in s if r not in set(d)][:5]
        only_d = [r for r in d if r not in set(s)][:5]
        raise AssertionError(
            f"{name}: value mismatch (cols sorted: {sorted(spark_cols)})\n"
            f"first paired diffs: {diffs}\n"
            f"only in spark: {only_s}\nonly in duck: {only_d}"
        )
