"""Dedup-family scale stress: 1x vs 10x the sf0.1 documents table.

The claim under test is the 100-TB shape: pair discovery cost and output
should grow ~linearly with corpus size when the near-dup RATE is constant,
because candidates come from capped LSH band buckets, never an all-pairs
join. The 10x corpus replicates sf0.1 ten times with per-slice token
salting (slice r suffixes every token with 'x{r}'), so slices share no
tokens: the internal near-dup structure of each slice is identical to the
original corpus and the expected pair count is exactly 10x. A superlinear
wall or pair blow-up would mean the banding/cap hygiene failed.

Usage: python tools/bench_dedup_scale.py [sf_dir] [cores]
Appends a markdown table to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark.conf import get_spark
from chapterbridge_ocr_worker_spark.operators.cache import release_caches
from chapterbridge_ocr_worker_spark.operators.dedup import (
    jaccard_keep,
    jaccard_pairs_lsh,
    minhash_candidates,
    neardup_clusters,
    simhash_neardup_pairs,
)

OPS = {
    "jaccard_pairs": lambda df: jaccard_pairs_lsh(df, threshold=0.6),
    "jaccard_keep": lambda df: jaccard_keep(df, threshold=0.6),
    # closure over the pair relation: output must stay LINEAR (one row per
    # doc) and the iterative rounds must not grow with corpus size (salted
    # slices keep component structure constant)
    "clusters": lambda df: neardup_clusters(df, threshold=0.6),
    "minhash_candidates": lambda df: minhash_candidates(df),
    "simhash_pairs": lambda df: simhash_neardup_pairs(df, max_hamming=3),
}


def build_10x(spark, sf_dir: str, path: str):
    if not os.path.isdir(path):
        flat = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        salted = None
        for r in range(10):
            sl = flat.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                F.when(F.lit(r == 0), F.col("text"))
                .otherwise(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.trim("text"), r"\s+"),
                            lambda t: F.concat(t, F.lit(f"x{r}")),
                        ),
                    )
                )
                .alias("text"),
            )
            salted = sl if salted is None else salted.unionByName(sl)
        salted.repartition(64).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def best_of(fn, n=2):
    runs = []
    for _ in range(n):
        release_caches()
        t0 = time.time()
        rows = fn()
        runs.append(time.time() - t0)
    return min(runs), rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("dedup-scale", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    one = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ten_path = f"/tmp/dedup_scale_10x_{sf_dir.strip('/').replace('/', '_')}"
    ten = build_10x(spark, sf_dir, ten_path)
    n1, n10 = one.count(), ten.count()

    out: dict[str, dict] = {}
    for name, op in OPS.items():
        w1, r1 = best_of(lambda: op(one).count())
        w10, r10 = best_of(lambda: op(ten).count())
        out[name] = {
            "rows_1x": r1,
            "rows_10x": r10,
            "rows_ratio": round(r10 / max(r1, 1), 2),
            "wall_1x_s": round(w1, 2),
            "wall_10x_s": round(w10, 2),
            "wall_ratio": round(w10 / w1, 2),
        }
        print(f"# {name}: {out[name]}", flush=True)
    release_caches()

    summary = {"docs_1x": n1, "docs_10x": n10, "cores": cores, "ops": out,
               "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(summary))
    with open(os.path.join(ROOT, "BENCH.md"), "a") as f:
        f.write(
            f"\n### Dedup scale stress ({summary['ts']}, {n1} -> {n10} docs, "
            f"local[{cores}])\n\n"
            "| operator | rows 1x | rows 10x | rows ratio | wall 1x | "
            "wall 10x | wall ratio |\n|---|---|---|---|---|---|---|\n"
        )
        for name, s in out.items():
            f.write(
                f"| {name} | {s['rows_1x']} | {s['rows_10x']} | "
                f"x{s['rows_ratio']} | {s['wall_1x_s']} s | {s['wall_10x_s']} s "
                f"| x{s['wall_ratio']} |\n"
            )
    spark.stop()
    shutil.rmtree(ten_path, ignore_errors=True)


if __name__ == "__main__":
    main()
