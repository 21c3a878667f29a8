"""Two-cluster-size scaling evidence (sandbox stand-in for N vs 4N executors).

Runs the flagship extraction job (and a headline relational mix) twice on
IDENTICAL input: local[8] and local[32]. Reports docs/s at both and the
scaling efficiency (throughput_32 / throughput_8) / 4, appending a markdown
row to BENCH.md. Each run is a fresh subprocess so JVM/session state can't
leak between sizes.

Usage: python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The extraction must run long enough (minutes, not seconds) that fixed
# overheads (session, stage scheduling) don't swamp the throughput signal —
# so the corpus is replicated REPL x with remapped doc_ids before timing.
RUNNER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from chapterbridge_ocr_worker_spark.conf import get_spark
from chapterbridge_ocr_worker_spark.pipeline import run_extraction
from chapterbridge_ocr_worker_spark.sources.interleave import interleaveify_cached

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark(f"scaling-{{cores}}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

flat = spark.read.parquet(f"{{sf_dir}}/documents.parquet").select("doc_id", "text")
big = flat
for i in range(1, repl):
    big = big.unionByName(
        flat.select((F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text")
    )
key = sf_dir.strip("/").replace("/", "_") + f"_x{{repl}}"
# cache build is OUTSIDE the timed section: identical materialized input
# for both cluster sizes
docs, media = interleaveify_cached(big, key)

extract_s = None
for _ in range(2):  # best-of-2: the sandbox shares a host; single shots swing +-40%
    t0 = time.time()
    n = run_extraction(spark, docs, media).output.count()
    dt = time.time() - t0
    extract_s = dt if extract_s is None else min(extract_s, dt)

from chapterbridge_ocr_worker_spark.queries import QUERIES
t0 = time.time()
for q in ["q1_pricing_summary", "q3_topk_revenue", "dedup_exact", "emb_cosine_topk"]:
    tq = time.time()
    QUERIES[q].fn(spark, sf_dir).count()
    print(f"# rel {{q}}: {{time.time()-tq:.1f}}s")
rel_s = time.time() - t0
print(json.dumps({{"cores": cores, "docs": n, "extract_s": round(extract_s, 2),
                  "docs_per_sec": round(n / extract_s, 2), "relational_s": round(rel_s, 2)}}))
spark.stop()
"""


def run(cores: int, sf_dir: str, repl: int) -> dict:
    code = RUNNER.format(root=ROOT)
    env = dict(os.environ)
    # emulate a compute-bound recognizer (see engine/stub.py _burn): the
    # scaling criterion is about OCR throughput, which in production is
    # per-image compute, not Spark overhead.
    # ~35 ms/image — still 30-80x LIGHTER than the reference's real engine
    # (1-3 s/image on an A5000), so the efficiency we report is conservative:
    # heavier per-image compute only improves the compute:overhead ratio.
    env.setdefault("OCR_STUB_COST", "64")
    # Pin CPU affinity: local[N] bounds task SLOTS, not CPUs — each task is
    # a JVM thread plus a Python worker process, so an unpinned "8-core" leg
    # quietly uses ~2x the CPUs and understates the measured scaling. The
    # pinned run is the honest analogue of an N-core executor.
    cmd = [sys.executable, "-c", code, str(cores), sf_dir, str(repl)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, env=env,
    )
    for l in out.stdout.splitlines():
        if l.startswith("#"):
            print(" ", l)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = int(sys.argv[4]) if len(sys.argv) > 4 else n_small * 4
    factor = n_big / n_small
    # interleave sizes to decorrelate from slow drift in shared-host load
    runs_s, runs_b = [], []
    for _ in range(2):
        runs_s.append(run(n_small, sf_dir, repl))
        print(f"local[{n_small}]: ", runs_s[-1])
        runs_b.append(run(n_big, sf_dir, repl))
        print(f"local[{n_big}]:", runs_b[-1])
    rs = max(runs_s, key=lambda r: r["docs_per_sec"])
    rb = max(runs_b, key=lambda r: r["docs_per_sec"])
    eff = (rb["docs_per_sec"] / rs["docs_per_sec"]) / factor
    rel_speedup = rs["relational_s"] / rb["relational_s"]
    summary = {
        "sf_dir": sf_dir,
        f"n{n_small}": rs,
        f"n{n_big}": rb,
        "extract_scaling_efficiency": round(eff, 3),
        "sizes": [n_small, n_big],
        "relational_speedup": round(rel_speedup, 2),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(summary))
    with open(os.path.join(ROOT, "BENCH.md"), "a") as f:
        f.write(
            f"\n| {summary['ts']} | {sf_dir} | {rs['docs_per_sec']} docs/s @{n_small}c "
            f"| {rb['docs_per_sec']} docs/s @{n_big}c | eff={eff:.3f} "
            f"| relational x{rel_speedup:.2f} |\n"
        )


if __name__ == "__main__":
    main()
