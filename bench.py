"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Queries cover the flagship extraction pipeline (interleave-ify -> explode ->
vectorized OCR -> reassemble) plus the heaviest relational / training-data
operators. Methodology (shaped by two rounds of contaminated recordings on
this shared host — single shots swing ±40%):

- each query runs >= 2 times; heavy queries (best > 5 s) get a third sample;
- headline "queries" = BEST of the runs (steady-state), "median_queries" =
  median (what a contended sweep really sees), "cold_queries" = first run;
- PHANTOM-PROOFING (r3 adjudication: two recorded medians were 5-17x
  host-steal phantoms): (a) every sample records the /proc/stat CPU steal
  fraction over its own window; a query whose min-steal sample exceeds 5%
  is listed in "contaminated" — its numbers are the host's, not the
  code's; (b) when the median drifts >3x above the best, the query is
  resampled (up to 5 runs total) so one stolen sample can't become the
  recorded median;
- operator-internal signature caches are released AFTER each timed run
  (operators.cache.release_caches) so queries can't bleed executor storage
  into each other — round 2 recorded a 12x phantom on dedup_jaccard_pairs
  from exactly that accumulation;
- the streaming append queries' checkpoints/sinks are wiped before every
  timed run: they persist across processes by design (idempotent
  re-trigger), so without the wipe the "work" is a parquet read-back;
- the interleave derivation cache is pre-built OUTSIDE the timed region —
  it is stored-corpus synthesis, not extraction work, and billing it to
  the first extraction run hid the real cold/warm spread.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chapterbridge_ocr_worker_spark.conf import get_spark
from chapterbridge_ocr_worker_spark.operators.cache import release_caches
from chapterbridge_ocr_worker_spark.queries import (
    QUERIES,
    _cache_key,
    ensure_dedup_prior_state,
    ensure_emb_prior_sigs,
    ensure_ivf_index,
    ensure_bm25_index,
    ensure_ivfpq_index,
    ensure_pq_index,
    ensure_segment_prior_set,
    ensure_zordered_events,
    streaming_scratch_dirs,
)

BENCH_QUERIES = [
    "extract_e2e_full",
    "q1_pricing_summary",
    "q3_topk_revenue",
    "q5_region_revenue",
    "q18_big_orders",
    "w3_keep_oldest",
    "w5_sessionize",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_candidates",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_jaccard_keep",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_exact_incremental",
    "stream_dedup_exact",
    "emb_cosine_neardup",
    "emb_neardup_incremental",
    "emb_ivf_topk",
    "emb_ivf_indexed",
    "emb_pq_topk",
    "emb_pq_indexed",
    "emb_ivfpq_topk",
    "emb_ivfpq_indexed",
    "f13_output_docs",
    "emb_cosine_topk",
    "emb_ann_lsh",
    "text_quality",
    "text_lang_id",
    "corpus_lang_stats",
    "curate_topk_per_lang",
    "stream_hourly_agg",
    "stream_hourly_append",
    "asof_last_view_before_purchase",
    "rollup_revenue",
    "html_strip_tags",
    "html_main_content",
    "pdf_layout_parse",
    "text_repetition",
    "decontam_overlap",
    "text_pii_scan",
    "curate_mix_sample",
    "curate_shard_pack",
    "curate_source_quality",
    "curate_segment_dedup",
    "curate_segment_dedup_incremental",
    "text_lm_score",
    "text_lm_score_frozen",
    "url_dedup_keep",
    "text_quality_classifier",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_bm25_indexed",
    "table_zorder_box",
    "emb_semdedup",
    "dedup_substring_spans",
    "dedup_substring_excise",
    "dedup_bloom_gate",
    "url_frontier_gate",
]

# queries whose cross-process scratch state must be wiped per timed run
_STREAMING_SCRATCH = {"stream_hourly_append", "stream_session_windows"}


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — steal is time the
    hypervisor ran someone else while this VM wanted the CPU, the exact
    contamination mode behind r2/r3's phantom recordings."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _prebuild_interleave(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from chapterbridge_ocr_worker_spark.sources.interleave import (
        interleaveify_cached,
    )

    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    interleaveify_cached(flat, _cache_key(sf_dir, "_full"))
    interleaveify_cached(
        flat.filter(F.col("doc_id") < 100), _cache_key(sf_dir, "_lt100")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    _prebuild_interleave(spark, sf_dir)
    # "last week's" dedup state for the incremental query: the prior run's
    # cost, built outside the timed region (same rationale as the
    # interleave cache); the timed query is the weekly increment only
    ensure_dedup_prior_state(spark, sf_dir)
    ensure_emb_prior_sigs(spark, sf_dir)  # prior embedding batch's cost
    ensure_ivf_index(spark, sf_dir)  # index build = the indexing run's cost
    ensure_pq_index(spark, sf_dir)  # PQ encode pass = the indexing run's cost
    ensure_ivfpq_index(spark, sf_dir)  # fused assign+encode = the indexing run's cost
    ensure_bm25_index(spark, sf_dir)  # tokenize+tf postings = the indexing run's cost
    ensure_segment_prior_set(spark, sf_dir)  # prior crawl's segment set
    ensure_zordered_events(spark, sf_dir)  # clustered rewrite = the layout job's cost
    release_caches()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    cold: dict[str, float] = {}
    steal_fracs: dict[str, float] = {}
    contaminated: list[str] = []
    extra: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qd = QUERIES[name]

        def one_run():
            # isolate queries from each other: drop operator-internal
            # signature caches AND anything else cached, and wipe streaming
            # scratch so every run does real work
            release_caches()
            spark.catalog.clearCache()
            if name in _STREAMING_SCRATCH:
                for d in streaming_scratch_dirs(sf_dir):
                    shutil.rmtree(d, ignore_errors=True)
            s0, t0_ticks = _cpu_ticks()
            t0 = time.time()
            n = qd.fn(spark, sf_dir).count()
            dt = time.time() - t0
            s1, t1_ticks = _cpu_ticks()
            steal = (s1 - s0) / max(1, t1_ticks - t0_ticks)
            return dt, n, steal

        runs, steals = [], []
        for _ in range(2):
            dt, n, st = one_run()
            runs.append(dt)
            steals.append(st)
        # this shared host swings single shots +-40%; when both runs of a
        # heavy query look slow, buy one more sample before recording it
        if min(runs) > 5.0:
            dt, n, st = one_run()
            runs.append(dt)
            steals.append(st)
        # phantom-proof the MEDIAN: a median >3x the best means at least
        # one sample was stolen — resample until the median is honest or
        # the budget (5 runs) is spent
        while (
            statistics.median(runs) > 3.0 * min(runs)
            and min(runs) > 0.2
            and len(runs) < 5
        ):
            dt, n, st = one_run()
            runs.append(dt)
            steals.append(st)
        best = min(runs)
        timings[name] = round(best, 3)
        medians[name] = round(statistics.median(runs), 3)
        cold[name] = round(runs[0], 3)
        steal_fracs[name] = round(min(steals), 4)
        if min(steals) > 0.05:
            contaminated.append(name)
        if name == "extract_e2e_full":
            extra["extract_docs"] = n
            extra["extract_docs_per_sec"] = round(n / best, 2) if best > 0 else 0.0
        if name == "table_zorder_box":
            # the layout's actual claim, measured: fraction of data files a
            # 2-D box predicate opens under the z-clustered layout
            from chapterbridge_ocr_worker_spark.sources.tables import (
                pruned_selection,
                table_path,
            )

            sel = pruned_selection(
                table_path(ensure_zordered_events(spark, sf_dir), "events"),
                {"event_id": (150, 399), "user_id": (3, 7)},
            )
            extra["zorder_files_kept"] = sel["files_kept"]
            extra["zorder_files_total"] = sel["files_total"]
        release_caches()
    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # diagnostics line FIRST (medians/cold/steal are bulky); the recorder
    # keeps the stdout TAIL, and r4's capture lost the headline best-times
    # when this grew — so the compact headline JSON is printed LAST and is
    # small enough (~1 KB) that tail-truncation can never eat it
    print(
        json.dumps(
            {
                "detail": "per-run diagnostics (headline JSON is the last line)",
                "median_queries": medians,
                "cold_queries": cold,
                "steal_frac": steal_fracs,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "contaminated": contaminated,
                "sf": sf_val,
                "cpus": cpus,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
