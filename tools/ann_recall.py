"""ANN recall instrumentation: measure every approximate path against the
exact brute-force top-k on the same embeddings table, so the
recall-vs-scan-fraction trade is a recorded number, not an assertion.

    python tools/ann_recall.py [sf_dir] [k]

Prints one JSON line: recall@k per method (fraction of exact top-k
neighbors the approximate method returned, averaged over queries) plus
each method's corpus-touch model. Methods: LSH (depth-2 multi-probe),
IVF (nprobe=4/16 cells), PQ (full scan of 8-byte codes), IVF-PQ (probed
cells x codes). Query set = vec_id % 100 == 0, matching the registry
queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chapterbridge_ocr_worker_spark.conf import get_spark  # noqa: E402


def recall_at_k(exact_rows, approx_rows) -> float:
    exact: dict[int, set] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx: dict[int, set] = {}
    for r in approx_rows:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    fracs = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact if exact[q]
    ]
    return round(sum(fracs) / len(fracs), 3) if fracs else 0.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-recall", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from chapterbridge_ocr_worker_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(emb, qs, k=k).collect()

    # PQ/IVF-PQ rank by L2, the exact oracle by cosine: on unnormalized
    # vectors these orders differ, so ALSO measure against the exact L2
    # top-k for an apples-to-apples quantization-loss number.
    from pyspark.sql.window import Window

    from chapterbridge_ocr_worker_spark.operators.similarity import dot

    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").cast("array<double>").alias("cvec"))
    q2 = qs.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").cast("array<double>").alias("qvec"))
    sq = (c.crossJoin(F.broadcast(q2))
          .filter(F.col("neighbor_id") != F.col("query_id"))
          .select("query_id", "neighbor_id",
                  (dot(F.col("qvec"), F.col("qvec")) -
                   2 * dot(F.col("qvec"), F.col("cvec")) +
                   dot(F.col("cvec"), F.col("cvec"))).alias("d2")))
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(),
                                               F.col("neighbor_id").asc())
    exact_l2 = (sq.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k).collect())

    out: dict = {"sf_dir": sf_dir, "k": k, "n_queries": qs.count()}
    t0 = time.time()
    out["lsh_d2_vs_cos"] = recall_at_k(
        exact, ann_topk_lsh(emb, qs, k=k, bits=8, probe_depth=2).collect()
    )
    out["ivf_np4_vs_cos"] = recall_at_k(
        exact, ivf_topk(emb, qs, k=k, n_centroids=16, nprobe=4).collect()
    )
    from chapterbridge_ocr_worker_spark.operators.similarity import ivf_topk_kmeans

    out["ivf_kmeans2_np4_vs_cos"] = recall_at_k(
        exact,
        ivf_topk_kmeans(emb, qs, k=k, n_centroids=16, nprobe=4, iters=2).collect(),
    )
    pq_rows = pq_topk(emb, qs, k=k).collect()
    out["pq_vs_l2"] = recall_at_k(exact_l2, pq_rows)
    out["pq_vs_cos"] = recall_at_k(exact, pq_rows)
    ivfpq_rows = ivfpq_topk(emb, qs, k=k, n_centroids=16, nprobe=4).collect()
    out["ivfpq_vs_l2"] = recall_at_k(exact_l2, ivfpq_rows)
    out["ivfpq_vs_cos"] = recall_at_k(exact, ivfpq_rows)
    out["wall_s"] = round(time.time() - t0, 1)
    out["touch_model"] = {
        "lsh_d2": "37/256 buckets ~ 14% of corpus, full vectors",
        "ivf_np4": "4/16 cells ~ 25% of corpus, full vectors",
        "pq": "100% of corpus, 8-byte codes (32x compression)",
        "ivfpq": "4/16 cells ~ 25% of corpus, 8-byte codes",
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
