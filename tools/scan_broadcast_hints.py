#!/usr/bin/env python
"""Scan every registered query's ANALYZED plan for static broadcast
hints over SF-SCALING inputs (VERDICT r9 finding 1: ~16 TPC-H-family
joins hinted customer/supplier/part — tables that grow linearly with
scale factor — as broadcast build sides; a static hint FORCES the
broadcast at any size, so at cluster scale it builds a driver-side
hash relation of a grown table and OOMs. The engine's two-threshold
posture (session.py: static 10 MB / AQE runtime 64 MB) exists so a
genuinely-small side EARNS its broadcast from actual bytes).

Rule enforced — a `ResolvedHint (strategy=broadcast)` subtree is
allowed ONLY when its cardinality is bounded independent of scale
factor, i.e. it contains at least one of:
  * a bounding logical node (Aggregate / Deduplicate / GlobalLimit /
    LocalLimit / LocalRelation / OneRowRelation / Range) — the
    aggregate-then-broadcast pattern (q18's HAVING side, 1-row
    scalar crossJoins, top-k vocabularies). Aggregates whose group
    count itself scales remain the author's docstring burden; the
    mechanical ban targets raw-relation hints.
  * only bounded-domain dim scans (nation = 25 rows, region = 5 rows
    at ANY TPC-H scale factor — identified by their column prefixes).

Prints one line per violation and a summary; exit 1 on violations.
Usage: python tools/scan_broadcast_hints.py [sf_dir] [ids...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestor_and_features_creator_spark import plans  # noqa: E402
from data_ingestor_and_features_creator_spark.session import get_spark  # noqa: E402

BOUNDING = {"Aggregate", "Deduplicate", "DeduplicateWithinWatermark",
            "GlobalLimit", "LocalLimit", "LocalRelation",
            "OneRowRelation", "Range", "CommandResult"}

# Column-name prefixes that identify the two bounded-domain dims. Any
# other leaf relation (customer/supplier/part/orders/lineitem/events/
# documents/embeddings, or an external scan) is assumed SF-scaling.
BOUNDED_DIM_PREFIXES = ("n_", "r_")


def _children(node):
    return [node.children().apply(i) for i in range(node.children().size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _leaf_relation_cols(node) -> list[list[str]]:
    """First column name of every leaf relation in the subtree."""
    out = []
    for n in _walk(node):
        if _cls(n) in ("LogicalRelation", "LogicalRDD", "HiveTableRelation",
                       "UnresolvedRelation", "DataSourceV2Relation"):
            cols = [n.output().apply(i).name()
                    for i in range(min(3, n.output().size()))]
            out.append(cols)
    return out


def find_scaling_broadcast_hints(df) -> list[str]:
    """One description per broadcast ResolvedHint in df's analyzed
    plan whose subtree is neither cardinality-bounded nor composed
    solely of bounded-domain dim scans."""
    plan = df._jdf.queryExecution().analyzed()
    bad = []
    for node in _walk(plan):
        if _cls(node) != "ResolvedHint":
            continue
        if "broadcast" not in node.hints().toString().lower():
            continue
        child = node.children().apply(0)
        subtree = {_cls(n) for n in _walk(child)}
        if subtree & BOUNDING:
            continue
        rels = _leaf_relation_cols(child)
        if rels and all(
            cols and cols[0].startswith(BOUNDED_DIM_PREFIXES)
            for cols in rels
        ):
            continue
        bad.append(
            f"broadcast hint over unbounded subtree "
            f"{sorted(subtree)[:6]} rels={rels[:3]}")
    return bad


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = get_spark("scan_broadcast_hints")
    qs = plans.queries()
    ids = args or sorted(qs)
    violations = {}
    for name in ids:
        try:
            bad = find_scaling_broadcast_hints(qs[name](spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — report, don't abort scan
            violations[name] = [f"SCAN ERROR: {ex}"]
            continue
        if bad:
            violations[name] = bad
            print(f"VIOLATION {name}: {bad}", flush=True)
    print(f"DONE violations: {sorted(violations)}")
    spark.stop()
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
