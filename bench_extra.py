"""Round-6 optimization harness (guide §1): per-query isolated timing and
plan capture OUTSIDE the frozen bench.py.

- times each named query with the same ``.count()`` methodology bench.py
  uses (that is what the driver grades), best-of-N with cache release
  between runs;
- optionally also times a ``noop``-sink run (guide §1.4) so compute is
  separated from the count short-circuit;
- writes ``.explain("formatted")`` to plans/r06/<query>_<tag>.txt;
- labels jobs via setJobDescription (guide §1.5).

Usage:
    python bench_extra.py [--sf DIR] [--tag before|after] [--runs N]
                          [--noop] [--plans] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chapterbridge_ocr_worker_spark.conf import get_spark
from chapterbridge_ocr_worker_spark.operators.cache import release_caches
from chapterbridge_ocr_worker_spark.queries import (
    QUERIES,
    ensure_bm25_index,
    ensure_dedup_prior_state,
    ensure_emb_prior_sigs,
    ensure_ivf_index,
    ensure_ivfpq_index,
    ensure_pq_index,
    ensure_segment_prior_set,
    ensure_zordered_events,
    streaming_scratch_dirs,
)

_STREAMING_SCRATCH = {"stream_hourly_append", "stream_session_windows"}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = "before"
    runs = 2
    do_noop = False
    do_plans = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--noop":
            do_noop = True
            i += 1
        elif a == "--plans":
            do_plans = True
            i += 1
        else:
            names.append(a)
            i += 1

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # same out-of-timed-region prebuilds as bench.py
    from pyspark.sql import functions as F

    from chapterbridge_ocr_worker_spark.queries import _cache_key
    from chapterbridge_ocr_worker_spark.sources.interleave import interleaveify_cached

    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    interleaveify_cached(flat, _cache_key(sf_dir, "_full"))
    interleaveify_cached(
        flat.filter(F.col("doc_id") < 100), _cache_key(sf_dir, "_lt100")
    )
    ensure_dedup_prior_state(spark, sf_dir)
    ensure_emb_prior_sigs(spark, sf_dir)
    ensure_ivf_index(spark, sf_dir)
    ensure_pq_index(spark, sf_dir)
    ensure_ivfpq_index(spark, sf_dir)
    ensure_bm25_index(spark, sf_dir)
    ensure_segment_prior_set(spark, sf_dir)
    ensure_zordered_events(spark, sf_dir)
    release_caches()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        qd = QUERIES[name]
        rec: dict = {}

        def one(mode: str) -> float:
            release_caches()
            spark.catalog.clearCache()
            if name in _STREAMING_SCRATCH:
                for d in streaming_scratch_dirs(sf_dir):
                    shutil.rmtree(d, ignore_errors=True)
            spark.sparkContext.setJobDescription(f"r06 {tag} {name} [{mode}]")
            t0 = time.time()
            df = qd.fn(spark, sf_dir)
            if mode == "count":
                rec["rows"] = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            return dt

        samples = [one("count") for _ in range(runs)]
        rec["count_best"] = round(min(samples), 3)
        rec["count_samples"] = [round(s, 3) for s in samples]
        if do_noop:
            nsamples = [one("noop") for _ in range(runs)]
            rec["noop_best"] = round(min(nsamples), 3)
        if do_plans:
            release_caches()
            spark.catalog.clearCache()
            df = qd.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
        release_caches()

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
