"""spark-submit entrypoint for INCREMENTAL EXACT deduplication.

The exact-hash sibling of jobs/dedup_job.py (MinHash near-dup): each run
takes one new crawl slice, drops docs whose normalized-content hash was
already seen — in any prior run or earlier in this slice — and updates
the persistent state, never re-hashing a prior document.

    spark-submit --master <cluster> jobs/exactdedup_job.py \
        --documents /data/crawl_2026_w33.parquet \
        --state /data/exactdedup_state \
        --out /data/exactdedup_out/w33 \
        [--m-bits 262144] [--k 5] [--cores 8]

State directory (owned by this job, carried run-to-run):
    hashes/   (id, h) — the 33-byte/doc exact-dedup state, appended per
              run as a crash-safe snapshot with id min/max stats. Appended
              LAST: it is the RESUME MARKER (anti-join below), so a rerun
              after a mid-commit crash redoes the run instead of silently
              skipping the bloom append.
    bloom_params.json  the (m_bits, k) the bitmap was built with —
              persisted at bootstrap and read back by every later run,
              because bit positions are functions of these values: a
              probe with mismatched params can false-NEGATIVE and keep a
              duplicate. A conflicting --m-bits/--k on a later run is
              refused (exit 2) instead of corrupting answers.
    bloom/    (widx, word) Bloom-bitmap words over each slice's hashes,
              one snapshot per run, folded at read time with bit_or
              (bloom_build(A) ∪ bloom_build(B) folds to bloom_build(A∪B)
              — pinned by test). The weekly probe reads THIS bounded
              table, never rebuilds the bitmap from the corpus; the full
              hashes table is touched only by the confirm join's
              bloom-positive sliver. A crash-rerun's duplicate bloom
              snapshot only re-sets bits that are already set — the fold
              is idempotent, and answers are exact regardless (the bloom
              is a prefilter, never the verdict).

Outputs under --out:
    decisions/  (id, keep) for THIS run's docs

Prior reads are pruned to `id < min(new ids)` via the manifest's id stats
(caller contract as in dedup_job: doc_ids unique and crawl-ordered), so a
post-crash rerun is bit-identical to a clean run. The bloom table needs
no such filter — extra bits cost false-positive confirms, never answers.

At 100 TB: the bitmap is ~10 bits per prior key (1.2 GB of longs at 10^9
keys — broadcastable) and the per-run state growth is one bounded bloom
snapshot plus |new| hash rows; the only corpus-sized artifact any run
scans is the hashes table, and only for the bloom-positive sliver.

Prints one JSON stats line on stdout (logs on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow `python jobs/exactdedup_job.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chapterbridge_ocr_worker_spark.conf import get_spark  # noqa: E402

# compact a state table once it exceeds this many live snapshots
COMPACT_AFTER = 4


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="incremental exact dedup job")
    ap.add_argument("--documents", required=True, help="new crawl slice parquet")
    ap.add_argument("--state", required=True, help="persistent state dir")
    ap.add_argument("--out", required=True, help="output dir for this run")
    ap.add_argument("--m-bits", type=int, default=None, help="bloom bitmap bits")
    ap.add_argument("--k", type=int, default=None, help="bloom probes per key")
    ap.add_argument("--cores", type=int, default=None, help="local[] cores (dev only)")
    args = ap.parse_args(argv)

    spark = get_spark("exactdedup-job", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    from chapterbridge_ocr_worker_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_M_BITS,
        bloom_build,
        bloom_gated_incremental_exact,
        exact_hashes,
    )
    from chapterbridge_ocr_worker_spark.sources import tables

    # BITMAP PARAMS ARE STATE: bit positions are functions of (m_bits, k),
    # so every run MUST probe with the values the bitmap was built with —
    # a mismatched probe can false-NEGATIVE and silently keep a duplicate.
    # Bootstrap persists the choice next to the tables; later runs read it
    # back and refuse a conflicting override instead of corrupting answers.
    params_path = os.path.join(args.state, "bloom_params.json")
    persisted = None
    if os.path.exists(params_path):
        with open(params_path) as f:
            persisted = json.load(f)
        for flag, key in (("m_bits", "m_bits"), ("k", "k")):
            given = getattr(args, flag)
            if given is not None and given != persisted[key]:
                print(
                    f"--{flag.replace('_', '-')} {given} conflicts with the "
                    f"state's persisted {key}={persisted[key]}; the bitmap "
                    "was built with the persisted value — rebuild state to "
                    "change it",
                    file=sys.stderr,
                )
                spark.stop()
                return 2
        m_bits, k = persisted["m_bits"], persisted["k"]
    else:
        m_bits = args.m_bits or BLOOM_M_BITS
        k = args.k or BLOOM_K

    docs = spark.read.parquet(args.documents).select("doc_id", "text")

    # RESUME anti-join: docs already in the hashes table were committed by
    # a previous run — re-appending them would duplicate state rows.
    n_in = docs.count()
    prior_any = tables.read_table(spark, args.state, "hashes")
    if prior_any is not None:
        docs = docs.join(
            prior_any.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        )
    n_skipped = n_in - docs.count()

    if prior_any is not None and n_skipped == n_in:
        print(
            json.dumps(
                {
                    "mode": "resume-noop",
                    "docs_in": 0,
                    "skipped_done": n_skipped,
                    "kept": 0,
                    "dropped_as_dups": 0,
                    "corpus_total": prior_any.count(),
                    "compacted": {},
                }
            )
        )
        spark.stop()
        return 0

    new_h = exact_hashes(docs).persist()

    if prior_any is None:
        # bootstrap: exact dedup within the first slice (keep-first per hash)
        mode = "bootstrap"
        first = new_h.groupBy("h").agg(F.min("id").alias("first_new"))
        decisions = new_h.join(first, "h").select(
            "id",
            F.when(F.col("id") == F.col("first_new"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("keep"),
        )
    else:
        mode = "incremental"
        # CRASH-WINDOW BOUNDARY: prune the confirm-join side to ids below
        # this slice (metadata-level skip of a crashed attempt's own rows);
        # the bloom fold needs no filter — duplicate snapshots are
        # idempotent under bit_or and cost only false-positive confirms.
        min_new_id = docs.agg(F.min("doc_id")).first()[0]
        prior_h = tables.read_table_pruned(
            spark, args.state, "hashes", "id", None, min_new_id - 1
        )
        words = (
            tables.read_table(spark, args.state, "bloom")
            .groupBy("widx")
            .agg(F.bit_or("word").alias("word"))
        )
        decisions = bloom_gated_incremental_exact(
            docs, prior_h, m_bits=m_bits, k=k, bloom_words=words
        )

    decisions = decisions.persist()
    n_new = decisions.count()  # materialize before state mutation
    n_kept = decisions.filter("keep = 1").count()
    decisions.write.mode("overwrite").parquet(os.path.join(args.out, "decisions"))

    # state commits: params first (idempotent — same content every run),
    # then bloom, hashes LAST (the resume marker) — a crash between any
    # two makes the rerun redo the run, and the bloom table absorbs its
    # duplicate snapshot idempotently.
    if persisted is None:
        os.makedirs(args.state, exist_ok=True)
        tmp = params_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"m_bits": m_bits, "k": k}, f)
        os.replace(tmp, params_path)
    tables.append_snapshot(bloom_build(new_h, m_bits, k), args.state, "bloom")
    tables.append_snapshot(new_h, args.state, "hashes", stats_cols=["id"])
    n_corpus = tables.read_table(spark, args.state, "hashes").count()
    new_h.unpersist()
    decisions.unpersist()

    # small-file hygiene: bloom snapshots fold at read time but their row
    # count grows per append; compaction pre-folds them into one snapshot
    # of at most m/64 word rows. Hashes compact by plain union (no
    # superseded rows — the resume anti-join guarantees unique ids).
    compacted = {}
    for tbl, agg_fold in (("hashes", False), ("bloom", True)):
        path = tables.table_path(args.state, tbl)
        live = tables._live_snapshots(path) or []
        if len(live) > COMPACT_AFTER:
            stats = tables.compact_table(
                spark,
                args.state,
                tbl,
                fold=(
                    (lambda d: d.groupBy("widx").agg(F.bit_or("word").alias("word")))
                    if agg_fold
                    else None
                ),
            )
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
