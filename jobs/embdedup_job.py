"""spark-submit entrypoint for INCREMENTAL embedding near-dup detection,
with optional IVF-index maintenance — the weekly workflow of the
similarity family, mirroring jobs/spandedup_job.py for text spans.

Each run takes one new embedding batch, finds every near-duplicate pair
with at least one new side against the corpus's FROZEN prior signature
state (operators.similarity.incremental_cosine_neardup — the prior corpus
is never re-hashed), emits the pairs + a keep decision for the new batch,
and appends the batch's signatures to the persistent state.

    spark-submit --master <cluster> jobs/embdedup_job.py \
        --embeddings /data/emb_2026_w33.parquet \
        --state /data/emb_state \
        --out /data/emb_out/w33 \
        [--threshold 0.95] [--bits 10] [--cores 8] \
        [--ivf-index /data/ivf] [--rebuild-if-skewed]

State directory (owned by this job, carried run-to-run):
    sigs/   (id, vec, bucket) — the materialized LSH signature of every
            vector the corpus has committed. Appended per run as a
            crash-safe snapshot; keys=["id"] compaction drops the
            byte-identical duplicates a crash-rerun can add.
    vecs/   (id) — the committed-batch marker table, appended LAST: the
            RESUME anti-join. A crash between the sigs append and the
            vecs append leaves the marker absent, so the rerun REDOES the
            batch — and because every prior-state read filters
            id < min(new ids), the crashed attempt's orphaned signature
            rows are invisible to the redo, which is bit-identical to a
            clean run (same crash discipline as jobs/dedup_job.py and
            jobs/spandedup_job.py).

Outputs under --out:
    pairs/  (id_a, id_b, cos_r) near-dup pairs with >=1 new side
    keep/   (id, is_dup) keep decision for THIS batch: a new vector is a
            dup when it pairs with any prior vector or with a smaller-id
            new vector (keep-oldest, matching the dedup family).

IVF maintenance (--ivf-index): the batch is also appended to the
materialized IVF index (assigned to EXISTING centroids, one snapshot
append) and the index's health stats (operators.similarity.ivf_index_stats)
are printed with the run stats — the drift signal a long-running pipeline
must watch. With --rebuild-if-skewed, a rebuild_recommended verdict
triggers ivf_rebuild_index inline (one corpus-sized pass, paid only when
the skew stat says recall is at risk).

Caller contract (same as the sibling jobs): vec_ids are unique across
batches and arrival-ordered — every new id greater than all committed ids.

Prints one JSON stats line on stdout (logs on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow `python jobs/embdedup_job.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chapterbridge_ocr_worker_spark.conf import get_spark  # noqa: E402

# compact the sigs table once it exceeds this many live snapshots
COMPACT_AFTER = 4


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="incremental embedding near-dup job")
    ap.add_argument("--embeddings", required=True, help="new embedding batch parquet")
    ap.add_argument("--state", required=True, help="persistent signature state dir")
    ap.add_argument("--out", required=True, help="output dir for this run")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--bits", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None, help="local[] cores (dev only)")
    ap.add_argument("--ivf-index", default=None, help="materialized IVF index to maintain")
    ap.add_argument(
        "--rebuild-if-skewed",
        action="store_true",
        help="run ivf_rebuild_index when the health stats recommend it",
    )
    args = ap.parse_args(argv)

    spark = get_spark("embdedup-job", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    from chapterbridge_ocr_worker_spark.operators.cache import release_caches
    from chapterbridge_ocr_worker_spark.operators.similarity import (
        cosine_neardup_pairs,
        incremental_cosine_neardup,
        ivf_append_index,
        ivf_index_stats,
        ivf_rebuild_index,
        vector_signatures,
    )
    from chapterbridge_ocr_worker_spark.sources import tables

    batch = spark.read.parquet(args.embeddings).select("vec_id", "embedding")

    # RESUME anti-join on the committed-batch marker table
    n_in = batch.count()
    done = tables.read_table(spark, args.state, "vecs")
    if done is not None:
        batch = batch.join(
            done.select(F.col("id").alias("vec_id")), "vec_id", "left_anti"
        )
    n_skipped = n_in - batch.count()

    if done is not None and n_skipped == n_in:
        print(
            json.dumps(
                {
                    "mode": "resume-noop",
                    "vectors_in": 0,
                    "skipped_done": n_skipped,
                    "pairs": 0,
                    "dups": 0,
                    "corpus_vectors": done.count(),
                    "compacted": {},
                    "ivf": None,
                }
            )
        )
        spark.stop()
        return 0

    prior = tables.read_table(spark, args.state, "sigs")
    n_orphans = 0
    if prior is None:
        mode = "bootstrap"
        pairs = cosine_neardup_pairs(
            batch, threshold=args.threshold, bits=args.bits
        )
    else:
        mode = "incremental"
        # CRASH-WINDOW BOUNDARY: filter the prior read by the batch's min
        # id so a redo after a crash between the two appends cannot see
        # the crashed attempt's own signature rows as "prior". Orphans
        # (ids at/after the boundary) mean this IS a crash redo: our own
        # append will then duplicate those rows, and duplicate sig rows
        # would inflate future runs' union-wide bucket counts — so their
        # presence forces a keys=["id"] compaction after the commit,
        # restoring one-row-per-id before any future run reads the table.
        min_new_id = batch.agg(F.min("vec_id")).first()[0]
        n_orphans = prior.filter(F.col("id") >= min_new_id).count()
        prior = prior.filter(F.col("id") < min_new_id)
        pairs = incremental_cosine_neardup(
            batch, prior, threshold=args.threshold, bits=args.bits
        )

    pairs = pairs.persist()
    n_pairs = pairs.count()  # materialize before state mutation
    pairs.write.mode("overwrite").parquet(os.path.join(args.out, "pairs"))

    # keep decision for THIS batch: dup iff the pair links it to an older id
    # (prior vector, or smaller-id new vector). id_a < id_b by construction,
    # so the dup side of every pair is id_b when id_b is in the batch.
    dup_ids = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    keep = batch.select("vec_id").join(
        dup_ids.withColumn("is_dup", F.lit(True)), "vec_id", "left"
    ).select("vec_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep"))
    n_dups = keep.filter("is_dup").count()

    # commit: sigs FIRST, vecs marker LAST (see module docstring)
    tables.append_snapshot(
        vector_signatures(batch, bits=args.bits), args.state, "sigs",
        stats_cols=["id"],
    )
    tables.append_snapshot(
        batch.select(F.col("vec_id").alias("id")), args.state, "vecs",
        stats_cols=["id"],
    )
    n_corpus = tables.read_table(spark, args.state, "vecs").count()
    pairs.unpersist()
    release_caches()

    ivf = None
    if args.ivf_index:
        ivf_append_index(batch, args.ivf_index)
        ivf = ivf_index_stats(spark, args.ivf_index)
        ivf["rebuilt"] = False
        if ivf["rebuild_recommended"] and args.rebuild_if_skewed:
            ivf = ivf_rebuild_index(spark, args.ivf_index)
            ivf["rebuilt"] = True

    compacted = {}
    for tbl, keys in (("sigs", ["id"]), ("vecs", ["id"])):
        path = tables.table_path(args.state, tbl)
        live = tables._live_snapshots(path) or []
        force = tbl == "sigs" and n_orphans > 0  # crash-redo dedup (above)
        if len(live) > COMPACT_AFTER or force:
            stats = tables.compact_table(spark, args.state, tbl, keys=keys)
            compacted[tbl] = stats["snapshots_before"]

    print(
        json.dumps(
            {
                "mode": mode,
                "vectors_in": n_in - n_skipped,
                "skipped_done": n_skipped,
                "pairs": n_pairs,
                "dups": n_dups,
                "corpus_vectors": n_corpus,
                "crash_orphans": n_orphans,
                "compacted": compacted,
                "ivf": ivf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
