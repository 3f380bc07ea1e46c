#!/usr/bin/env python
"""Generate OPERATORS.md: the machine-derived operator inventory —
one row per registered query id with its implementing function,
file:line, oracle class (SQL twin vs rows-only), and the first
docstring sentence. Derived FROM the registry, so it cannot drift
from the code the way a hand-written table can; re-run after adding
operators.

Usage: python tools/gen_inventory.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestor_and_features_creator_spark import plans

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        i = text.find(stop)
        if i > 0:
            return text[: i + 1]
    return text[:200]


def main() -> int:
    plans.load_all()
    rows = []
    for name, fn in plans.QUERIES.items():
        target = inspect.unwrap(fn)
        try:
            src = os.path.relpath(inspect.getsourcefile(target), REPO)
            line = inspect.getsourcelines(target)[1]
        except (OSError, TypeError):
            src, line = "?", 0
        oracle = "SQL" if name in plans.ORACLES else "rows"
        rows.append((name, f"{src}:{line}", oracle,
                     first_sentence(target.__doc__)))
    rows.sort()
    n_sql = sum(1 for r in rows if r[2] == "SQL")
    out = [
        "# OPERATORS — generated inventory (tools/gen_inventory.py)",
        "",
        f"{len(rows)} registered queries; {n_sql} with DuckDB SQL oracle "
        f"twins, {len(rows) - n_sql} rows-only (round 10 upgraded the "
        "last six rows-only HRV kernel ids to bound/planted evals with "
        "full SQL oracles; raw kernel numerics stay known-answer-tested "
        "in tests/test_hrv_known_answers.py). Regenerate with "
        "`python tools/gen_inventory.py` after adding operators.",
        "",
        "| id | impl | oracle | summary |",
        "| --- | --- | --- | --- |",
    ]
    for name, loc, oracle, summary in rows:
        summary = summary.replace("|", "\\|")
        out.append(f"| `{name}` | {loc} | {oracle} | {summary} |")
    path = os.path.join(REPO, "OPERATORS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} rows ({n_sql} SQL)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
