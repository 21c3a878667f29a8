"""Round-6 kernel-family scale stress: 1x vs 10x the sf1.0 inputs.

The r6 optimization round moved the embedding/ANN scoring, the near-dup
pair blocks, and the substring-dedup hashing into Arrow/NumPy kernels.
The claim under test here is that those kernels keep the operators'
~linear scale shape (bounded per-bucket blocks, corpus-linear scans,
query-side broadcast) — a superlinear wall at 10x would mean a kernel
smuggled in a quadratic or a memory blow-up.

10x corpora are salted replications of the sf1.0 tables:
- embeddings: slice r shifts every dimension by 0.01*r (direction
  changes, so LSH/IVF bucket structure stays realistic instead of
  collapsing all copies into identical buckets) and offsets vec_id by
  r * 10^6;
- documents: slice r suffixes every token with 'x{r}' (slices share no
  tokens; per-slice duplicate structure identical to the original).

Usage: python tools/bench_r06_scale.py [sf_dir] [cores]
Prints one JSON line with 1x/10x walls per operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark.conf import get_spark
from chapterbridge_ocr_worker_spark.operators.cache import release_caches
from chapterbridge_ocr_worker_spark.operators.dedup import (
    duplicate_substring_spans,
)
from chapterbridge_ocr_worker_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
    ivfpq_topk,
    pq_topk,
)


def _scaled_emb(emb, factor: int):
    slices = []
    for r in range(factor):
        slices.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(0.01 * r).cast("float")
                ).alias("embedding"),
            )
        )
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out


def _scaled_docs(docs, factor: int):
    slices = []
    for r in range(factor):
        slices.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{r}").alias(
                    "text"
                ),
            )
        )
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("r06-scale", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # materialize the salted 10x inputs to parquet so the timed region
    # measures the operator, not the salting expressions
    scale_root = "/tmp/r06_scale"
    emb10_path = f"{scale_root}/emb10.parquet"
    docs10_path = f"{scale_root}/docs10.parquet"
    if not os.path.isdir(emb10_path):
        _scaled_emb(emb1, 10).repartition(cores).write.mode("overwrite").parquet(
            emb10_path
        )
    if not os.path.isdir(docs10_path):
        _scaled_docs(docs1, 10).repartition(cores).write.mode(
            "overwrite"
        ).parquet(docs10_path)
    emb10 = spark.read.parquet(emb10_path)
    docs10 = spark.read.parquet(docs10_path)

    def q_slice(e):
        return e.filter(F.col("vec_id") % 100 == 0)

    ops = {
        "cosine_topk": lambda e: cosine_topk(e, q_slice(e), k=10),
        "ivf_topk": lambda e: ivf_topk(e, q_slice(e), k=10, n_centroids=16,
                                       nprobe=4),
        "pq_topk": lambda e: pq_topk(e, q_slice(e), k=10),
        "ivfpq_topk": lambda e: ivfpq_topk(e, q_slice(e), k=10,
                                           n_centroids=16, nprobe=4),
        "cosine_neardup": lambda e: cosine_neardup_pairs(e, threshold=0.95),
    }
    out: dict[str, dict] = {}
    for name, fn in ops.items():
        rec = {}
        for tag, e in (("1x", emb1), ("10x", emb10)):
            release_caches()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r06-scale {name} {tag}")
            t0 = time.time()
            n = fn(e).count()
            rec[tag] = round(time.time() - t0, 2)
            rec[f"{tag}_rows"] = n
        rec["ratio"] = round(rec["10x"] / max(rec["1x"], 0.001), 2)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    rec = {}
    for tag, d in (("1x", docs1), ("10x", docs10)):
        release_caches()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"r06-scale substring_spans {tag}")
        t0 = time.time()
        n = duplicate_substring_spans(d).count()
        rec[tag] = round(time.time() - t0, 2)
        rec[f"{tag}_rows"] = n
    rec["ratio"] = round(rec["10x"] / max(rec["1x"], 0.001), 2)
    out["substring_spans"] = rec
    print(json.dumps({"substring_spans": rec}), flush=True)
    print(json.dumps({"r06_scale": out}))
    spark.stop()


if __name__ == "__main__":
    main()
