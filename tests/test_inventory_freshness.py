"""Count-freshness invariant (round 11, VERDICT r10 ask 6): the
registry totals stated in README.md, SURVEY.md §2 and OPERATORS.md must
equal the LIVE registry (`len(plans.queries())`) and its SQL-oracle
count — mechanically, so the totals can never drift again (round 9
shipped a 513-vs-551 drift that was caught by hand; round 10 was
consistent at 559 but only by hand). When an operator is added: run
tools/gen_inventory.py (rewrites OPERATORS.md) and update the README /
SURVEY prose totals; this test is the gate that forgets neither."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestor_and_features_creator_spark import plans  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name), encoding="utf-8") as fh:
        return fh.read()


def _live_counts() -> tuple[int, int]:
    qs = plans.queries()
    oracles = plans.oracles()
    return len(qs), len([n for n in qs if n in oracles])


def test_operators_md_totals_match_registry():
    n, n_sql = _live_counts()
    m = re.search(r"(\d+) registered queries; (\d+) with DuckDB SQL oracle",
                  _read("OPERATORS.md"))
    assert m, "OPERATORS.md header lost its totals line — rerun gen_inventory"
    assert (int(m.group(1)), int(m.group(2))) == (n, n_sql), (
        f"OPERATORS.md says {m.group(1)}/{m.group(2)}, registry is "
        f"{n}/{n_sql} — run tools/gen_inventory.py")
    # the generated table itself must carry one row per id
    n_rows = len(re.findall(r"^\| `", _read("OPERATORS.md"), re.M))
    assert n_rows == n, f"OPERATORS.md table has {n_rows} rows, registry {n}"


def test_survey_inventory_totals_match_registry():
    n, n_sql = _live_counts()
    m = re.search(r"\*\*Inventory totals \(round \d+\): (\d+) registered"
                  r"\s+operator ids; (\d+)\s+SQL-oracle", _read("SURVEY.md"))
    assert m, "SURVEY.md lost its 'Inventory totals' line"
    assert (int(m.group(1)), int(m.group(2))) == (n, n_sql), (
        f"SURVEY.md says {m.group(1)}/{m.group(2)}, registry is {n}/{n_sql}")


def test_readme_totals_match_registry():
    n, n_sql = _live_counts()
    text = _read("README.md")
    m = re.search(r"the registry: (\d+) operator queries", text)
    assert m and int(m.group(1)) == n, (
        f"README tree comment says {m and m.group(1)}, registry is {n}")
    # README's round-history paragraphs keep each PAST round's totals —
    # only the LAST (most recent round's) count is the live claim.
    hits = re.findall(r"(\d+) registered\s+queries,\s+(\d+) with\s+DuckDB"
                      r"\s+oracle", text)
    assert hits and tuple(map(int, hits[-1])) == (n, n_sql), (
        f"README prose says {hits and hits[-1]}, registry is {n}/{n_sql}")


def test_stale_rows_only_records_requeue_before_green_ids():
    """VERDICT r10 ask 8: ids whose LATEST committed driver record is a
    round-1 rows-only check but which now carry SQL oracles must sit in
    the rotation AFTER every never-driver-checked id (fresh coverage
    first) and BEFORE every green id (so the stale record of record
    upgrades as soon as the backlog drains)."""
    ids = list(plans.queries())
    checked, failed, rows_only = plans._driver_history()
    stale = sorted(n for n in rows_only if n in plans.oracles())
    if not stale:  # the records upgraded — the ask is complete
        return
    never = [i for i, n in enumerate(ids) if n not in checked]
    green = [i for i, n in enumerate(ids)
             if n in checked and n not in failed and n not in rows_only]
    stale_pos = [ids.index(n) for n in stale]
    assert max(never, default=-1) < min(stale_pos)
    assert max(stale_pos) < min(green)


def test_zero_rows_only_stays_zero():
    """Round 10 closed the last rows-only ids; regressing to a weaker
    rows-only check is a deliberate, documented act — this trips if it
    happens silently."""
    n, n_sql = _live_counts()
    assert n == n_sql
