"""Benchmark harness (driver contract).

Runs the headline workload on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name: sec},
"sf", plus extra context keys (triples_per_sec, docs, cpus)}.

Headline = the KG-construction pipeline (BASELINE.json metric is triples/sec
end-to-end on the synthetic interleaved-doc corpus) + a representative slice
of the relational/training-data operator queries at the sf dir. Scaling
(N vs 4N cores) is measured separately by tools/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# ~sf-proportional synthetic corpus: sf0.1 -> 12k interleaved docs.
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "12000"))

# sf marker parsed from the dir name, e.g. ".../sf0.1" -> 0.1
def _sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


# Representative per-operator queries (one per SURVEY.md §2 family + the
# training-data ops). Full 32-query coverage is exercised by
# tools/check_contract.py; bench keeps the set small enough to be a fast
# feedback loop while still touching every physical pattern: scan+filter
# pushdown, broadcast join, multiway shuffle join, window top-k, groupBy agg,
# minhash UDF, ANN cosine, text scoring.
BENCH_QUERIES = [
    "j1_multiway_join_agg",
    "j2_broadcast_dim",
    "j5_link_cascade",
    "a1_group_counts",
    "w1_topk_per_group",
    "f2_keyword_match",
    "dedup_minhash",
    "dedup_simhash",
    "ann_brute_topk",
    "text_quality_score",
    # round-2 additions: degree-ordered triangle join, as-of union+window,
    # incremental new-vs-index LSH dedup, fixed-point lift term stats
    "graph_triangles",
    "w6_asof_join",
    "dedup_incremental_lsh",
    "text_distinctive_terms",
    # round-3 additions: int8-quantized integer-dot ANN (the 4x-bandwidth
    # compression path), per-doc OOV rate vs a frequency-rank vocab
    "ann_quantized_topk",
    "text_oov_rate",
    # round-3 additions (second wave): keyless bucketed range join (the
    # BNLJ-shape killer) and capped-middle common-neighbor link prediction
    # (the deliberate heavy wedge-join workload)
    "w8_range_join",
    "graph_common_neighbors",
    # round-3 additions (third wave): exact prefix-filtered set-similarity
    # join (the provably-complete dedup path) and the 3-round k-truss peel
    # (triangle-support recount per round — the heaviest graph shape here)
    "dedup_setsim_join",
    "graph_k_truss",
    # round-3 additions (fourth wave): BPE tokenization with a ranked merge
    # list — 3 literal replaces per merge fused into one codegen projection
    # over the exploded words (the tokenizer-apply hot path)
    "text_bpe_apply",
]


def main() -> None:
    from pyspark.sql import functions as F

    from entity_extractor_spark import contract
    from entity_extractor_spark.corpus import CorpusConfig, gazetteer_rows, generate_documents_df
    from entity_extractor_spark.plans.pipeline import run_pipeline
    from entity_extractor_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries: dict[str, float] = {}

    # -- warmup: a tiny pipeline run triggers JIT/codegen/Arrow init so the
    # timed run measures steady-state throughput (what a long-lived cluster
    # job actually sustains), not one JVM's first-run compilation. The
    # excluded cost is reported as warmup_sec, not hidden.
    wu_dir = tempfile.mkdtemp(prefix="kg_bench_warmup_")
    t0 = time.time()
    try:
        run_pipeline(
            spark,
            generate_documents_df(spark, CorpusConfig(n_docs=300)),
            wu_dir,
            gazetteer=gazetteer_rows(CorpusConfig(n_docs=300)),
            resume=False,
        )["triples"].count()
    finally:
        shutil.rmtree(wu_dir, ignore_errors=True)
    warmup_sec = round(time.time() - t0, 3)

    # -- headline: end-to-end KG construction on the synthetic corpus --------
    cfg = CorpusConfig(n_docs=N_DOCS)
    out_dir = tempfile.mkdtemp(prefix="kg_bench_")
    try:
        docs = generate_documents_df(spark, cfg).cache()
        n_in = docs.count()  # materialize input outside the timed window
        t0 = time.time()
        tables = run_pipeline(
            spark, docs, out_dir, gazetteer=gazetteer_rows(cfg), resume=False
        )
        n_triples = tables["triples"].count()
        kg_sec = time.time() - t0
        docs.unpersist()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    queries["kg_pipeline_e2e"] = round(kg_sec, 3)
    triples_per_sec = n_triples / kg_sec if kg_sec > 0 else 0.0

    # -- operator queries at the sf dir --------------------------------------
    for name in BENCH_QUERIES:
        fn = contract.Q[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        # force full execution without driver materialization cost
        df.agg(F.count(F.lit(1))).collect()
        queries[name] = round(time.time() - t0, 3)

    # -- ANN recall report: single- vs multi-probe LSH against exact top-10 --
    # (VERDICT r2 "ANN recall is unmeasured"): average recall@10 over 8 query
    # vectors on the sf embeddings; signatures computed once and cached so
    # the loop times probe+re-rank, not signature recompute.
    from entity_extractor_spark.operators import similarity as SIM

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    bucketed = emb.withColumn(
        "bucket", SIM.hyperplane_signature(F.col("embedding"), 64, 6)
    ).cache()
    bucketed.count()
    qids = [r[0] for r in emb.select("vec_id").orderBy("vec_id").limit(8).collect()]
    t0 = time.time()
    rec_single = rec_multi = rec_quant = rec_pq = rec_rp = 0.0
    # all 8 query vectors in ONE job (not one scan per query)
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(qids))
        .select("vec_id", "embedding")
        .collect()
    }
    # one corpus scale for the two lossy integer rankers (r3 additions);
    # quantize + PQ-encode the corpus ONCE and cache — the k_c*m-centroid
    # assignment is the expensive plan to build/run, and it is
    # query-independent. Per query only the tiny ADC LUT changes.
    corpus_ma = SIM.corpus_max_abs(emb)
    coded = SIM.quantize_embeddings(emb, max_abs=corpus_ma).cache()
    coded.count()
    books = SIM.pq_codebooks(coded)
    enc = SIM.pq_encode(coded, books).cache()
    enc.count()
    proj = SIM.rp_project_coded(coded, in_dim=64, out_dim=16).cache()
    proj.count()
    for qid in qids:
        qv = qvecs[qid]
        rest = bucketed.where(F.col("vec_id") != qid)
        exact = {
            r[0]
            for r in SIM.brute_force_topk(rest, qv, "vec_id", "embedding", 10)
            .select("vec_id")
            .collect()
        }
        qsig = SIM.query_signature(qv, bits=6)
        single = {
            r[0]
            for r in SIM.brute_force_topk(
                rest.where(F.col("bucket") == qsig), qv, "vec_id", "embedding", 10
            ).select("vec_id").collect()
        }
        probes = SIM.hamming_ball(qsig, radius=1)
        multi = {
            r[0]
            for r in SIM.brute_force_topk(
                rest.where(F.col("bucket").isin(probes)), qv, "vec_id", "embedding", 10
            ).select("vec_id").collect()
        }
        rec_single += len(exact & single) / len(exact)
        rec_multi += len(exact & multi) / len(exact)
        # the two lossy integer rankers, each vs ITS exact-metric counterpart
        # (int8 dot vs float dot, PQ-ADC L2 vs float L2) so the number is the
        # COMPRESSION loss, not the dot-vs-cosine metric difference
        qlit = F.array(*[F.lit(v) for v in qv])
        exact_dot = {
            r[0]
            for r in rest.select(
                "vec_id", SIM.dot(F.col("embedding"), qlit).alias("s")
            )
            .orderBy(F.desc("s"), F.asc("vec_id"))
            .limit(10)
            .collect()
        }
        exact_l2 = {
            r[0]
            for r in SIM.brute_force_topk(
                rest, qv, "vec_id", "embedding", 10, metric="l2"
            ).select("vec_id").collect()
        }
        q8 = SIM.quantize_query(qv, corpus_ma)
        quant = {
            r[0]
            for r in SIM.quantized_topk_coded(
                coded.where(F.col("vec_id") != qid), q8, k=10
            ).select("vec_id").collect()
        }
        pq = {
            r[0]
            for r in SIM.pq_topk_encoded(
                enc, books, q8, k=10, exclude_ids=[qid]
            ).select("vec_id").collect()
        }
        rec_quant += len(exact_dot & quant) / len(exact_dot)
        rec_pq += len(exact_l2 & pq) / len(exact_l2)
        # JL projection loss in isolation: vs the UNprojected int8 ranking
        # (quant), not the float ranking — quant already carries the
        # quantization loss line above
        rp = {
            r[0]
            for r in SIM.rp_topk(
                proj.where(F.col("vec_id") != qid), SIM.rp_query(q8, 16), k=10
            ).select("vec_id").collect()
        }
        rec_rp += len(quant & rp) / len(quant)
    # reported as its own context key, NOT in queries{}: the queries map and
    # summed "value" stay like-for-like comparable with earlier rounds
    ann_recall_sec = round(time.time() - t0, 3)
    bucketed.unpersist()
    coded.unpersist()
    enc.unpersist()
    proj.unpersist()
    ann_lsh_recall = round(rec_single / len(qids), 3)
    ann_multiprobe_recall = round(rec_multi / len(qids), 3)
    ann_quantized_recall = round(rec_quant / len(qids), 3)
    ann_pq_recall = round(rec_pq / len(qids), 3)
    ann_rp_recall = round(rec_rp / len(qids), 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg_construct_e2e_plus_operator_suite",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": _sf(SF_DIR),
                "triples_per_sec": round(triples_per_sec, 1),
                "kg_triples": n_triples,
                "kg_docs": n_in,
                "warmup_sec": warmup_sec,
                "ann_lsh_recall_at_10": ann_lsh_recall,
                "ann_multiprobe_recall_at_10": ann_multiprobe_recall,
                "ann_quantized_recall_at_10_vs_exact_dot": ann_quantized_recall,
                "ann_pq_recall_at_10_vs_exact_l2": ann_pq_recall,
                "ann_rp_recall_at_10_vs_int8_dot": ann_rp_recall,
                "ann_recall_report_sec": ann_recall_sec,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
