"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same KG-construction job is
run at two parallelism levels — local[8] (N) and local[32] (4N) — on the
SAME deterministic synthetic corpus, and efficiency is reported as

    efficiency = throughput_4N / (4 * throughput_N)

Each level runs in its own subprocess (fresh JVM) with a warmup pass so JIT
and codegen warmup don't pollute the comparison. Results are printed as one
JSON line and appended to BASELINE.md's measured table by --update-baseline.

Usage: python tools/bench_scaling.py [--docs 24000] [--update-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from entity_extractor_spark.session import get_spark
from entity_extractor_spark.corpus import CorpusConfig, gazetteer_rows, generate_documents_df
from entity_extractor_spark.plans.pipeline import run_pipeline

cores = {cores}
n_docs = {n_docs}
spark = get_spark("scaling_%d" % cores, master="local[%d]" % cores, shuffle_partitions=cores)
cfg = CorpusConfig(n_docs=n_docs)
docs = generate_documents_df(spark, cfg, partitions=cores).cache()
n_in = docs.count()  # materialize input outside the timed window
gaz = gazetteer_rows(cfg)

# warmup: full pipeline on a small prefix corpus (JIT + codegen + Arrow init)
wcfg = CorpusConfig(n_docs=500)
wdocs = generate_documents_df(spark, wcfg, partitions=cores)
wout = tempfile.mkdtemp(prefix="kg_scale_warm_")
run_pipeline(spark, wdocs, wout, gazetteer=gazetteer_rows(wcfg), resume=False)["triples"].count()
shutil.rmtree(wout, ignore_errors=True)

out = tempfile.mkdtemp(prefix="kg_scale_")
t0 = time.time()
tables = run_pipeline(spark, docs, out, gazetteer=gaz, resume=False)
n_triples = tables["triples"].count()
dt = time.time() - t0
shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{"cores": cores, "docs": n_in, "sec": round(dt, 2),
                               "triples": n_triples,
                               "triples_per_sec": round(n_triples / dt, 1)}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, n_docs=n_docs)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from local[{cores}] run:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "24000")))
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    n = run_level(8, args.docs)
    n4 = run_level(32, args.docs)
    eff = n4["triples_per_sec"] / (4 * n["triples_per_sec"])
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "N": n,
        "4N": n4,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_scaling.json"), "w") as f:
        json.dump(result, f, indent=1)

    if args.update_baseline:
        path = os.path.join(REPO, "BASELINE.md")
        with open(path) as f:
            text = f.read()
        marker = "<!-- scaling-measured -->"
        block = (
            f"{marker}\n"
            f"## (c) Measured (tools/bench_scaling.py, local[8] vs local[32], same corpus)\n\n"
            f"| level | docs | wall sec | triples | triples/sec |\n|---|---|---|---|---|\n"
            f"| N = local[8] | {n['docs']} | {n['sec']} | {n['triples']} | {n['triples_per_sec']} |\n"
            f"| 4N = local[32] | {n4['docs']} | {n4['sec']} | {n4['triples']} | {n4['triples_per_sec']} |\n\n"
            f"**Scaling efficiency N→4N = {eff:.3f}** (target ≥ 0.8: "
            f"{'PASS' if eff >= 0.8 else 'FAIL'}).\n"
        )
        if marker in text:
            text = text[: text.index(marker)] + block
        else:
            text = text.rstrip() + "\n\n" + block
        with open(path, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
