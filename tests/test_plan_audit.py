"""Exhaustive executed-plan hygiene gate: EVERY contract query's final
(post-AQE) physical plan is free of the scale anti-patterns a 100 TB
reviewer flags first — partitionless Windows, cartesian products,
non-allowlisted nested-loop joins, row-at-a-time Python. The per-query
representative gates live in test_plans.py; this sweep catches a regression
in ANY of the ~60 queries (tools/plan_audit.py holds the walker and the
justified allowlists)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF = "/root/testdata/sf0.001"


def test_every_contract_query_plan_is_clean(spark):
    from plan_audit import run_audit

    results = run_audit(spark, SF)
    flagged = {k: v["flags"] for k, v in results.items() if v["flags"]}
    assert flagged == {}, flagged
    # the blocked near-dup must really plan as a hash-equi join on the
    # block key, not fall back to a nested loop
    c = results["dedup_embedding_blocked"]["counts"]
    assert not c.get("BroadcastNestedLoopJoinExec") and not c.get("CartesianProductExec")
    assert c.get("BroadcastHashJoinExec", 0) + c.get("SortMergeJoinExec", 0) + c.get(
        "ShuffledHashJoinExec", 0
    ) >= 1, c
