"""spark-submit entrypoint for INCREMENTAL corpus deduplication.

The weekly-crawl workflow: each run takes one new crawl slice, judges it
against everything deduped before, and updates the persistent dedup state —
without recomputing a single prior signature or pair.

    spark-submit --master <cluster> jobs/dedup_job.py \
        --documents /data/crawl_2026_w33.parquet \
        --state /data/dedup_state \
        --out /data/dedup_out/w33 \
        [--threshold 0.6] [--cores 8]

State directory (owned by this job, carried run-to-run):
    signatures/   MinHash signature table (id, toks, sig, bands) of every
                  doc ever processed — appended per run as a crash-safe
                  snapshot (sources.tables.append_snapshot), never rewritten
    clusters/     (id, cluster_id) labels — the FULL refreshed relabeling
                  appended per run, read back latest-wins per id, so a new
                  doc chaining two prior clusters updates the prior
                  members' labels too (no stale labels between runs)

Outputs under --out:
    decisions/    (id, keep, cluster_id) for THIS run's docs

First run bootstraps: full neardup_clusters + jaccard_keep over the slice.
Every later run hashes ONLY the new slice, band-joins it against the
materialized union buckets (operators.dedup.incremental_dedup), and emits
keep/drop + cluster labels. Prior decisions are frozen (docs already
shipped to training are never retro-dropped). Both state tables auto-
compact once they accumulate more than COMPACT_AFTER snapshots — clusters
with keys=["id"] so latest-wins survives the rewrite and superseded label
rows are physically dropped.

Caller contract: doc_ids are unique across slices and crawl-ordered (new
ids greater than all prior ids) — what any ingest sequence number gives.

Prints one JSON stats line on stdout (logs on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow `python jobs/dedup_job.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chapterbridge_ocr_worker_spark.conf import get_spark  # noqa: E402

# compact a state table once it exceeds this many live snapshots
COMPACT_AFTER = 4


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="incremental corpus dedup job")
    ap.add_argument("--documents", required=True, help="new crawl slice parquet")
    ap.add_argument("--state", required=True, help="persistent dedup state dir")
    ap.add_argument("--out", required=True, help="output dir for this run")
    ap.add_argument("--threshold", type=float, default=0.6, help="near-dup Jaccard")
    ap.add_argument("--cores", type=int, default=None, help="local[] cores (dev only)")
    args = ap.parse_args(argv)

    spark = get_spark("dedup-job", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    # reliable checkpoints for the connected-components rounds
    spark.sparkContext.setCheckpointDir(os.path.join(args.state, "_checkpoints"))

    from chapterbridge_ocr_worker_spark.operators.cache import release_caches
    from chapterbridge_ocr_worker_spark.operators.dedup import (
        incremental_dedup,
        jaccard_keep,
        minhash_signatures,
        neardup_clusters,
    )
    from chapterbridge_ocr_worker_spark.sources import tables

    docs = spark.read.parquet(args.documents).select("doc_id", "text")

    # RESUME anti-join (the extraction pipeline's skip rule, applied to
    # dedup state): docs whose ids are already in the signature table were
    # committed by a previous run — a rerun of the same slice (crash
    # recovery, accidental resubmit) must not re-append their signatures,
    # which would double bucket counts and skew every later cap decision.
    n_in = docs.count()
    prior_sigs = tables.read_table(spark, args.state, "signatures")
    if prior_sigs is not None:
        docs = docs.join(
            prior_sigs.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        )
    n_skipped = n_in - docs.count()

    if prior_sigs is not None and n_skipped == n_in:
        # full rerun of an already-committed slice: answer from state,
        # mutate nothing (idempotent recovery path)
        print(
            json.dumps(
                {
                    "mode": "resume-noop",
                    "docs_in": 0,
                    "skipped_done": n_skipped,
                    "kept": 0,
                    "dropped_as_dups": 0,
                    "corpus_total": prior_sigs.count(),
                    "compacted": {},
                }
            )
        )
        spark.stop()
        return 0

    new_sigs = minhash_signatures(docs)
    new_ids = docs.select(F.col("doc_id").alias("id"))

    if prior_sigs is None:
        # bootstrap: full dedup of the first slice
        mode = "bootstrap"
        clusters = neardup_clusters(docs, threshold=args.threshold)
        kept = jaccard_keep(docs, threshold=args.threshold).withColumn(
            "keep", F.lit(1)
        )
        all_labels = (
            clusters.join(kept.select("id", "keep"), "id", "left")
            .select(
                "id",
                F.coalesce("keep", F.lit(0)).alias("keep"),
                "cluster_id",
            )
        )
    else:
        mode = "incremental"
        prior_clusters = tables.read_table_latest(
            spark, args.state, "clusters", keys=["id"]
        )
        all_labels = incremental_dedup(
            docs, prior_sigs, prior_clusters, threshold=args.threshold,
            scope="all",
        )

    all_labels = all_labels.persist()
    decisions = all_labels.join(new_ids, "id", "left_semi")
    n_new = decisions.count()  # materialize before state mutation
    n_kept = decisions.filter("keep = 1").count()
    decisions.write.mode("overwrite").parquet(os.path.join(args.out, "decisions"))

    # commit this run's rows into the rolling state: crash-safe snapshot
    # appends — a killed run leaves state readable at the previous commit.
    # clusters gets the FULL refreshed relabeling; the latest-wins reader
    # above makes the newest label win per id on the next run
    tables.append_snapshot(new_sigs, args.state, "signatures")
    tables.append_snapshot(
        all_labels.select("id", "cluster_id"), args.state, "clusters"
    )
    n_corpus = tables.read_table(spark, args.state, "signatures").count()
    all_labels.unpersist()
    release_caches()

    # small-file hygiene: weekly appends accumulate snapshots; compact once
    # they pile up (clusters with keys so latest-wins survives the rewrite
    # and superseded label rows are physically dropped)
    compacted = {}
    for tbl, keys in (("signatures", None), ("clusters", ["id"])):
        path = tables.table_path(args.state, tbl)
        live = tables._live_snapshots(path) or []
        if len(live) > COMPACT_AFTER:
            stats = tables.compact_table(spark, args.state, tbl, keys=keys)
            compacted[tbl] = stats["snapshots_before"]

    print(
        json.dumps(
            {
                "mode": mode,
                "docs_in": n_new,
                "skipped_done": n_skipped,
                "kept": n_kept,
                "dropped_as_dups": n_new - n_kept,
                "corpus_total": n_corpus,
                "compacted": compacted,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
