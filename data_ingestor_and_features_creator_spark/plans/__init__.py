"""Query plans: the operator registry consumed by __spark_entry__.py.

Importing this package imports every query module, which registers its
queries (and oracle SQL twins) with the registry.
"""

from .registry import MODULES, ORACLES, QUERIES, query  # noqa: F401


def load_all() -> None:
    """Import every query module so registrations run."""
    from . import q_flagship  # noqa: F401
    from . import q_relational  # noqa: F401
    from . import q_joins  # noqa: F401
    from . import q_aggregates  # noqa: F401
    from . import q_window  # noqa: F401
    from . import q_scalar  # noqa: F401
    from . import q_hrv  # noqa: F401
    from . import q_llm  # noqa: F401
    from . import q_streaming  # noqa: F401
    from . import q_udf  # noqa: F401
    from . import q_extras  # noqa: F401  (tail of the priority order)
    from . import q_round3  # noqa: F401  (tail of the priority order)
    from . import q_round4  # noqa: F401  (tail of the priority order)
    from . import q_tpch  # noqa: F401  (tail of the priority order)
    from . import q_round4b  # noqa: F401  (tail of the priority order)
    # round-5 hygiene split of q_round4b (same ops, family files):
    from . import q_cohort_stats  # noqa: F401
    from . import q_labels_training  # noqa: F401
    from . import q_scalar_formats  # noqa: F401
    from . import q_round5  # noqa: F401  (tail of the priority order)
    from . import q_round6  # noqa: F401  (tail of the priority order)
    from . import q_media  # noqa: F401  (round 6: real-codec multimodal)
    from . import q_round6c  # noqa: F401  (tail of the priority order)
    from . import q_round6d  # noqa: F401  (tail of the priority order)
    from . import q_round6e  # noqa: F401  (tail of the priority order)
    from . import q_round6f  # noqa: F401  (tail of the priority order)
    from . import q_round6g  # noqa: F401  (tail of the priority order)
    from . import q_round6h  # noqa: F401  (tail of the priority order)
    from . import q_round6i  # noqa: F401  (tail of the priority order)
    from . import q_round6j  # noqa: F401  (tail of the priority order)
    from . import q_round6k  # noqa: F401  (tail of the priority order)
    from . import q_round6l  # noqa: F401  (tail of the priority order)
    from . import q_round6m  # noqa: F401  (tail of the priority order)
    from . import q_round6n  # noqa: F401  (tail of the priority order)
    from . import q_round6o  # noqa: F401  (tail of the priority order)
    from . import q_round6p  # noqa: F401  (tail of the priority order)
    from . import q_round6q  # noqa: F401  (tail of the priority order)
    from . import q_round6r  # noqa: F401  (tail of the priority order)
    from . import q_round7  # noqa: F401  (tail of the priority order)
    from . import q_round7b  # noqa: F401  (tail of the priority order)
    from . import q_round7c  # noqa: F401  (tail of the priority order)
    from . import q_round7d  # noqa: F401  (tail of the priority order)
    from . import q_round7e  # noqa: F401  (tail of the priority order)
    from . import q_round7f  # noqa: F401  (tail of the priority order)
    from . import q_round7g  # noqa: F401  (tail of the priority order)
    from . import q_round7h  # noqa: F401  (tail of the priority order)
    from . import q_round7i  # noqa: F401  (tail of the priority order)
    from . import q_round7j  # noqa: F401  (tail of the priority order)
    from . import q_round8  # noqa: F401  (tail of the priority order)
    from . import q_round8b  # noqa: F401  (tail of the priority order)
    from . import q_round8c  # noqa: F401  (tail of the priority order)
    from . import q_round8d  # noqa: F401  (tail of the priority order)
    from . import q_round9  # noqa: F401  (tail of the priority order)
    from . import q_round9b  # noqa: F401  (tail of the priority order)
    from . import q_round9c  # noqa: F401  (tail of the priority order)
    from . import q_round9d  # noqa: F401  (tail of the priority order)
    from . import q_round9e  # noqa: F401  (tail of the priority order)
    from . import q_round9f  # noqa: F401  (tail of the priority order)
    from . import q_round9g  # noqa: F401  (tail of the priority order)
    from . import q_round10  # noqa: F401  (tail of the priority order)
    from . import q_round11  # noqa: F401  (tail of the priority order)
    from . import q_round11b  # noqa: F401  (tail of the priority order)
    from . import q_round11c  # noqa: F401  (tail of the priority order)
    from . import q_round11d  # noqa: F401  (tail of the priority order)
    from . import q_round11e  # noqa: F401  (tail of the priority order)
    from . import q_round11f  # noqa: F401  (tail of the priority order)
    from . import q_round11g  # noqa: F401  (tail of the priority order)
    from . import q_round11h  # noqa: F401  (tail of the priority order)
    from . import q_round11i  # noqa: F401  (tail of the priority order)
    from . import q_round11j  # noqa: F401  (tail of the priority order)
    from . import q_round11k  # noqa: F401  (tail of the priority order)
    from . import q_round11l  # noqa: F401  (tail of the priority order)
    from . import q_round11m  # noqa: F401  (tail of the priority order)
    from . import q_round11n  # noqa: F401  (tail of the priority order)
    from . import q_round11o  # noqa: F401  (tail of the priority order)
    from . import q_round11p  # noqa: F401  (tail of the priority order)
    from . import q_round11q  # noqa: F401  (tail of the priority order)
    from . import q_round11r  # noqa: F401  (tail of the priority order)
    from . import q_round11s  # noqa: F401  (tail of the priority order)
    from . import q_round11t  # noqa: F401  (tail of the priority order)


# The driver verifies queries in dict order with a bounded per-round
# budget (rounds 1 and 2 each checked exactly the first 50 ids). The
# committed CORRECTNESS_r*.json files record every id the driver has
# ever checked, so the priority order is computed from them directly:
#   0. ids whose most recent driver row FAILED (fixes must re-verify),
#   1. oracle-bearing ids the driver has never reached,
#   2. rows-only ids the driver has never reached (weaker check),
#   3. ids with a green driver row already (re-check last).
# Each round's CORRECTNESS file is committed, so the order self-rotates:
# next round's budget automatically lands on whatever this round missed.


def _driver_history() -> tuple[set, set, set]:
    """(ever_checked, last_row_failed, last_row_rows_only) from
    committed CORRECTNESS files."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    checked: set = set()
    failed: set = set()
    rows_only: set = set()
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            checked.add(name)
            # A rows-only check records err="no_oracle" with null match
            # fields and a spark_rows count; that is a pass, not a fail.
            err = row.get("err") if isinstance(row, dict) else "bad row"
            ok = (isinstance(row, dict)
                  and row.get("rows_match") is not False
                  and row.get("schema_match") is not False
                  and row.get("hash_match") is not False
                  and (not err or err == "no_oracle")
                  and row.get("spark_rows") is not None)
            if ok:
                failed.discard(name)
            else:
                failed.add(name)
            if ok and err == "no_oracle":
                rows_only.add(name)
            else:
                rows_only.discard(name)
    return checked, failed, rows_only


def _ordered_ids() -> list[str]:
    load_all()
    reg_order = {name: i for i, name in enumerate(QUERIES)}
    checked, failed, rows_only_latest = _driver_history()

    def key(name: str) -> tuple:
        if name in failed:
            return (0, reg_order[name])
        if name not in checked:
            return (1 if name in ORACLES else 2, reg_order[name])
        # Round 11 (VERDICT r10 ask 8): an id whose LATEST driver row is
        # a round-1 rows-only record but which has since gained a SQL
        # oracle (scan_binary, agg_approx_distinct, agg_hll_sketch_merge)
        # re-queues AHEAD of green ids — after the never-checked backlog
        # drains, so fresh coverage still comes first — to upgrade the
        # stale record of record to a hash-green one.
        if name in rows_only_latest and name in ORACLES:
            return (3, reg_order[name])
        return (4, reg_order[name])
    return sorted(QUERIES, key=key)


def queries():
    return {name: QUERIES[name] for name in _ordered_ids()}


def oracles():
    order = _ordered_ids()
    return {name: ORACLES[name] for name in order if name in ORACLES}
