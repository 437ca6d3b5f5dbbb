"""Executed-plan hygiene sweep over EVERY contract query.

SURVEY.md §4's claims (pushdown, broadcast, codegen, no global sorts) are
gated per-query for a handful of representative plans in tests/test_plans.py;
this tool is the exhaustive version: run every query in contract.Q at a
small SF dir, resolve the FINAL physical plan (post-AQE), and flag the
scale anti-patterns a 100 TB reviewer looks for first:

  * WindowExec family with an EMPTY partitionSpec — Spark moves the whole
    input through one task ("Moving all data to a single partition");
  * CartesianProductExec — an unbounded all-pairs join;
  * BroadcastNestedLoopJoin outside the documented allowlist — theta-joins
    are only acceptable when one side is a bounded dictionary (the
    substring-containment joins of the mention scan family);
  * row-at-a-time Python (BatchEvalPython / ArrowEvalPython / PythonUDF) —
    the north rule keeps the hot path JVM-side; Arrow-batched whole-
    partition nodes (MapInPandas / FlatMapGroupsInPandas) are allowed only
    where the operator is *documented* as a Pandas-batch operator
    (multimodal decode plumbing, Aho-Corasick scan path).

Usage:  python tools/plan_audit.py [sf_dir] [--write-md]
Exits nonzero if any flag fires. --write-md refreshes PLAN_AUDIT.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries whose PLAN legitimately contains a BroadcastNestedLoopJoin: the
# join predicate is substring containment against a broadcast *dictionary*
# side that is bounded by construction (gazetteer keywords / tiny literal
# dims), so the nested loop is O(rows x dict) with a small constant — the
# documented JVM fast path of the mention scan (operators/mentions.py).
BNLJ_ALLOWED = {
    # substring-containment join vs the broadcast keyword dictionary
    "f2_keyword_match",
    "kg_mention_scan_driver",
    "kg_mentions_synthetic",
    # centroid assignment: corpus x broadcast(n_cells=8 rows) — the nested
    # loop side is a CONSTANT-size centroid table (similarity.py ivf_topk /
    # kmeans_centroids / ivf_pq_topk's coarse stage)
    "ann_ivf_topk",
    "ann_ivf_kmeans",
    "ann_ivf_pq_topk",
    # documented EXACT all-pairs baseline (task spec: "brute-force ... as
    # the baseline"); dedup_embedding_blocked is the banded-LSH scale path
    # and must NOT appear here
    "dedup_embedding_cosine",
    # slice-pair theta-join (slice_a < slice_b) over PER-SLICE KMV SKETCH
    # rows — #slices rows of k-hash arrays, never the corpus itself
    # (sketch.kmv_slice_jaccard; the corpus is touched once upstream)
    "text_kmv_slice_jaccard",
}

# Queries whose plan legitimately contains Arrow-batched Pandas nodes
# (documented mapInPandas operators — never row-at-a-time Python).
PANDAS_ALLOWED = {
    "multimodal_metadata",  # decode plumbing is mapInPandas by design
    # the mapInPandas node is the synthetic-corpus GENERATOR (input
    # synthesis, corpus.py generate_documents_df); the mention scan itself
    # is the JVM path (gated by test_plans.test_mentions_has_no_python_udf)
    "kg_mentions_synthetic",
}


def _walk(node, visit) -> None:
    """Depth-first over a physical plan, descending into AQE wrappers,
    query stages, reused exchanges, cached subplans (InMemoryTableScan's
    cachedPlan — children() is empty there, so a naive walk would report a
    plan 'clean' while the anti-pattern hides inside the cache build), and
    scalar/IN-subquery plans (SparkPlan.subqueries)."""
    name = node.getClass().getSimpleName()
    visit(node, name)
    # every SparkPlan may carry subquery expressions with their own plans
    try:
        subs = node.subqueries()
        for i in range(subs.length()):
            _walk(subs.apply(i), visit)
    except Exception:
        pass
    if name == "AdaptiveSparkPlanExec":
        # after execution this returns the final (re-optimized) plan;
        # before execution it raises — fall back to the initial plan
        try:
            _walk(node.executedPlan(), visit)
        except Exception:
            _walk(node.initialPlan(), visit)
        return
    if name.endswith("QueryStageExec"):
        _walk(node.plan(), visit)
        return
    if name == "ReusedExchangeExec":
        _walk(node.child(), visit)
        return
    if name == "InMemoryTableScanExec":
        try:
            _walk(node.relation().cachedPlan(), visit)
        except Exception:
            pass
    children = node.children()
    for i in range(children.length()):
        _walk(children.apply(i), visit)


def audit_df(df) -> dict:
    """Execute `df` and inventory its final (post-AQE) physical plan."""
    t0 = time.time()
    # collect() runs THIS Dataset's own queryExecution, so its
    # AdaptiveSparkPlanExec is finalized for the walk below (df.count()
    # would build a derived Dataset and leave df's plan un-finalized)
    df.collect()
    sec = time.time() - t0

    counts: dict[str, int] = {}
    flags: list[str] = []

    def visit(node, name: str) -> None:
        counts[name] = counts.get(name, 0) + 1
        if "Window" in name:
            try:
                if node.partitionSpec().isEmpty():
                    flags.append(f"partitionless:{name}")
            except Exception:
                pass

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    return {"sec": round(sec, 2), "counts": counts, "flags": flags}


def audit_query(spark, name: str, fn, sf_dir: str) -> dict:
    res = audit_df(fn(spark, sf_dir))
    c = res["counts"]
    if c.get("CartesianProductExec"):
        res["flags"].append("cartesian")
    if c.get("BroadcastNestedLoopJoinExec") and name not in BNLJ_ALLOWED:
        res["flags"].append("bnlj")
    for bad in ("BatchEvalPythonExec", "ArrowEvalPythonExec"):
        if c.get(bad):
            res["flags"].append(f"row_python:{bad}")
    for pand in (
        "MapInPandasExec",
        "FlatMapGroupsInPandasExec",
        "FlatMapGroupsInPandasWithStateExec",
        "FlatMapCoGroupsInPandasExec",
        "AggregateInPandasExec",
        "WindowInPandasExec",
        "MapInArrowExec",
        "PythonMapInArrowExec",
    ):
        if c.get(pand) and name not in PANDAS_ALLOWED:
            res["flags"].append(f"pandas:{pand}")
    return res


def run_audit(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from entity_extractor_spark import contract

    out: dict[str, dict] = {}
    for name, fn in contract.Q.items():
        if names and name not in names:
            continue
        try:
            out[name] = audit_query(spark, name, fn, sf_dir)
        except Exception as e:  # a query that cannot even run is a flag
            out[name] = {"sec": -1, "counts": {}, "flags": [f"error:{type(e).__name__}"]}
    return out


_JOIN_NODES = [
    ("BroadcastHashJoinExec", "BHJ"),
    ("SortMergeJoinExec", "SMJ"),
    ("ShuffledHashJoinExec", "SHJ"),
    ("BroadcastNestedLoopJoinExec", "BNLJ"),
]


def to_markdown(results: dict[str, dict], sf_dir: str) -> str:
    lines = [
        "# PLAN_AUDIT — executed-plan hygiene, every contract query",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir} --write-md`.",
        "Final (post-AQE) physical plans. Flags checked: partitionless Window,",
        "CartesianProduct, non-allowlisted BroadcastNestedLoopJoin, row-at-a-time",
        "Python, non-allowlisted Pandas nodes. `joins` counts broadcast-hash /",
        "sort-merge / shuffled-hash / broadcast-nested-loop joins; `xchg` counts",
        "shuffle exchanges; `wscg` = WholeStageCodegen spans in the final plan.",
        "",
        "| query | sec | joins BHJ/SMJ/SHJ/BNLJ | xchg | wscg | flags |",
        "|---|---|---|---|---|---|",
    ]
    for name in sorted(results):
        r = results[name]
        c = r["counts"]
        joins = "/".join(str(c.get(k, 0)) for k, _ in _JOIN_NODES)
        lines.append(
            f"| {name} | {r['sec']} | {joins} | {c.get('ShuffleExchangeExec', 0)} |"
            f" {c.get('WholeStageCodegenExec', 0)} | {', '.join(r['flags']) or 'clean'} |"
        )
    flagged = {k: v["flags"] for k, v in results.items() if v["flags"]}
    lines += ["", f"**{len(results)} queries audited; {len(flagged)} flagged.**"]
    return "\n".join(lines) + "\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
    from entity_extractor_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    results = run_audit(spark, sf_dir)
    md = to_markdown(results, sf_dir)
    print(md)
    if "--write-md" in sys.argv:
        with open(os.path.join(REPO, "PLAN_AUDIT.md"), "w") as f:
            f.write(md)
    spark.stop()
    if any(v["flags"] for v in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
