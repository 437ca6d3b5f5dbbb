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


def test_curation_safety_plan_shapes(spark):
    """The round-2c additions keep their intended physical shapes:
    contamination's membership test is a broadcast hash join (the corpus
    side must not shuffle for it), and the per-document repetition/PII
    scans are single-pass — no exchange, no join, whole-stage codegen."""
    from plan_audit import run_audit

    results = run_audit(
        spark, SF, names=["contamination_ngram", "text_repetition_signals", "text_pii_redact"]
    )
    cont = results["contamination_ngram"]["counts"]
    assert cont.get("BroadcastHashJoinExec", 0) >= 1, cont
    assert not cont.get("SortMergeJoinExec") and not cont.get("BroadcastNestedLoopJoinExec"), cont
    for narrow in ("text_repetition_signals", "text_pii_redact"):
        c = results[narrow]["counts"]
        joins = sum(c.get(k, 0) for k in (
            "BroadcastHashJoinExec", "SortMergeJoinExec",
            "ShuffledHashJoinExec", "BroadcastNestedLoopJoinExec"))
        assert joins == 0 and not c.get("ShuffleExchangeExec"), (narrow, c)
