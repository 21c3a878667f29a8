"""merge_upsert (MERGE INTO stand-in) and the stateful streaming operator."""

from pyspark.sql import functions as F

from chapterbridge_ocr_worker_spark.sources import tables
from chapterbridge_ocr_worker_spark.streaming.stateful import running_totals_per_type


def test_merge_upsert(spark, tmp_path):
    root = str(tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "k", "v"]
    )
    tables.write_table(base, root, "links")
    updates = spark.createDataFrame(
        [(2, "b", 99), (4, "d", 40)], ["id", "k", "v"]
    )
    tables.merge_upsert(spark, root, "links", updates, keys=["id"])
    rows = {
        r["id"]: r["v"] for r in tables.read_table(spark, root, "links").collect()
    }
    assert rows == {1: 10, 2: 99, 3: 30, 4: 40}  # matched updated, new inserted

    # idempotent re-apply
    tables.merge_upsert(spark, root, "links", updates, keys=["id"])
    assert tables.read_table(spark, root, "links").count() == 4


def test_merge_upsert_creates_missing_table(spark, tmp_path):
    root = str(tmp_path)
    updates = spark.createDataFrame([(1, 5)], ["id", "v"])
    tables.merge_upsert(spark, root, "fresh", updates, keys=["id"])
    assert tables.read_table(spark, root, "fresh").count() == 1


def test_stateful_running_totals(spark, tmp_path):
    src = str(tmp_path / "events_in")
    ev1 = spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("view", 5.0)], ["event_type", "value"]
    )
    ev1.coalesce(1).write.mode("append").parquet(src)
    schema = ev1.schema
    ckpt = str(tmp_path / "ckpt")

    def run_once(qname):
        # memory sink can't recover from a checkpoint; foreachBatch can
        collected = {}

        def sink(batch_df, epoch_id):
            for r in batch_df.collect():
                collected[r["event_type"]] = (r["total_events"], r["total_value"])

        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_totals_per_type(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    out1 = run_once("stateful_out1")
    assert out1["click"] == (2, 3.0)
    assert out1["view"] == (1, 5.0)

    # second batch: state carries over across triggers via checkpoint
    ev2 = spark.createDataFrame([("click", 10.0)], ["event_type", "value"])
    ev2.coalesce(1).write.mode("append").parquet(src)
    out2 = run_once("stateful_out2")
    assert out2["click"] == (3, 13.0)  # running total, not per-batch


def test_compact_table_preserves_rows(spark, tmp_path):
    from chapterbridge_ocr_worker_spark import datagen, schemas
    from chapterbridge_ocr_worker_spark.pipeline import write_run

    docs, media = datagen.generate_corpus(n_docs=12, seed=41, corrupt_fraction=0.0)
    mdf = spark.createDataFrame(media, schema=schemas.MEDIA)
    wh = str(tmp_path / "wh_compact")
    # two runs -> two snapshot dirs per table, many small files
    write_run(spark, spark.createDataFrame(docs[:6], schema=schemas.DOCUMENTS), mdf, wh)
    write_run(spark, spark.createDataFrame(docs, schema=schemas.DOCUMENTS), mdf, wh)
    before = tables.read_table(spark, wh, "ocr_output")
    rows_before = {r["doc_id"] for r in before.select("doc_id").collect()}

    stats = tables.compact_table(spark, wh, "ocr_output", target_files=2)
    assert stats["snapshots_before"] == 2
    assert stats["files_after"] <= 2 < stats["files_before"]

    after = tables.read_table(spark, wh, "ocr_output")
    assert {r["doc_id"] for r in after.select("doc_id").collect()} == rows_before
    assert after.count() == 12
    # resume still works against the compacted lineage
    tables.compact_table(spark, wh, "lineage", target_files=1)
    s = write_run(spark, spark.createDataFrame(docs, schema=schemas.DOCUMENTS), mdf, wh)
    assert s["docs"] == 0


def test_compact_crash_window_never_duplicates(spark, tmp_path):
    """The manifest is the commit point: an unregistered snapshot directory
    (what a compaction crashed mid-write leaves behind) is invisible to
    readers — at no point does the old+new union surface duplicated rows —
    and the next compaction garbage-collects the orphan."""
    import os

    root = str(tmp_path)
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "k"])
    tables.append_snapshot(df, root, "t")
    assert tables.read_table(spark, root, "t").count() == 2

    # simulate a compaction that wrote its data but died before the
    # manifest swap: a full copy of the table in an unregistered dir
    orphan = os.path.join(root, "t", "snap-9999999999999-deadbeef")
    df.write.mode("overwrite").parquet(orphan)
    assert tables.read_table(spark, root, "t").count() == 2  # NOT 4

    stats = tables.compact_table(spark, root, "t", target_files=1)
    assert stats["snapshots_before"] == 1
    assert tables.read_table(spark, root, "t").count() == 2
    assert not os.path.isdir(orphan)  # orphan collected


def test_read_table_latest_after_force_rerun(spark, tmp_path):
    """force=True appends duplicate doc_ids across snapshots (documented);
    read_table_latest gives downstream readers latest-snapshot-wins."""
    import time as _time

    from chapterbridge_ocr_worker_spark import datagen, schemas
    from chapterbridge_ocr_worker_spark.pipeline import write_run

    docs, media = datagen.generate_corpus(n_docs=6, seed=7, corrupt_fraction=0.0)
    ddf = spark.createDataFrame(docs, schema=schemas.DOCUMENTS)
    mdf = spark.createDataFrame(media, schema=schemas.MEDIA)
    wh = str(tmp_path / "wh_force")
    write_run(spark, ddf, mdf, wh)
    _time.sleep(0.01)  # distinct snapshot timestamps
    write_run(spark, ddf, mdf, wh, force=True)

    plain = tables.read_table(spark, wh, "ocr_output")
    assert plain.count() == 12  # duplicates surfaced, as documented
    latest = tables.read_table_latest(spark, wh, "ocr_output", keys=["doc_id"])
    assert latest.count() == 6
    assert latest.select("doc_id").distinct().count() == 6

    # value-level: with CONFLICTING snapshots the newest value wins per key
    root = str(tmp_path)
    tables.append_snapshot(
        spark.createDataFrame([(1, "old"), (2, "old"), (3, "old")], ["id", "v"]),
        root,
        "t2",
    )
    _time.sleep(0.01)
    tables.append_snapshot(
        spark.createDataFrame([(2, "new")], ["id", "v"]), root, "t2"
    )
    got = {
        r["id"]: r["v"]
        for r in tables.read_table_latest(spark, root, "t2", keys=["id"]).collect()
    }
    assert got == {1: "old", 2: "new", 3: "old"}


def test_concurrent_appends_lose_no_snapshot(spark, tmp_path):
    """Two appenders racing the manifest read-modify-write: without the
    fcntl commit lock the second publish drops the first's snapshot (lost
    update). With it, both snapshots land and readers see the union."""
    import threading

    root = str(tmp_path)
    dfs = [
        spark.createDataFrame([(i * 10 + j, "w%d" % i) for j in range(5)], ["id", "w"])
        for i in range(4)
    ]
    barrier = threading.Barrier(4)
    errs = []

    def append(df):
        try:
            barrier.wait(timeout=60)
            tables.append_snapshot(df, root, "race")
        except Exception as e:  # surfaced below — a swallowed error would
            errs.append(e)  # make the count assertion pass vacuously

    threads = [threading.Thread(target=append, args=(d,)) for d in dfs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    got = tables.read_table(spark, root, "race")
    assert got.count() == 20
    assert tables._live_snapshots(tables.table_path(root, "race"))
    assert len(tables._live_snapshots(tables.table_path(root, "race"))) == 4


def test_compact_with_keys_preserves_latest_wins(spark, tmp_path):
    """compact_table(keys=...) resolves per-key winners during the rewrite,
    so read_table_latest reads identically before and after compaction."""
    import time as _time

    root = str(tmp_path)
    tables.append_snapshot(
        spark.createDataFrame([(1, "old"), (2, "old")], ["id", "v"]), root, "t"
    )
    _time.sleep(0.01)
    tables.append_snapshot(
        spark.createDataFrame([(2, "new"), (3, "new")], ["id", "v"]), root, "t"
    )
    want = {(1, "old"), (2, "new"), (3, "new")}
    before = tables.read_table_latest(spark, root, "t", keys=["id"])
    assert {(r["id"], r["v"]) for r in before.collect()} == want

    stats = tables.compact_table(spark, root, "t", target_files=1, keys=["id"])
    assert stats["snapshots_before"] == 2
    after = tables.read_table_latest(spark, root, "t", keys=["id"])
    assert {(r["id"], r["v"]) for r in after.collect()} == want
    # superseded row physically gone, not just masked
    assert tables.read_table(spark, root, "t").count() == 3


def test_compact_without_keys_refuses_latest_wins_readers(spark, tmp_path):
    """A plain compact merges snapshots and destroys provenance; the
    manifest records it and read_table_latest raises instead of silently
    resurrecting superseded duplicate keys (ADVICE r3)."""
    import time as _time

    import pytest

    root = str(tmp_path)
    tables.append_snapshot(spark.createDataFrame([(1, "old")], ["id", "v"]), root, "t")
    _time.sleep(0.01)
    tables.append_snapshot(spark.createDataFrame([(1, "new")], ["id", "v"]), root, "t")
    tables.compact_table(spark, root, "t", target_files=1)
    assert tables.read_table(spark, root, "t").count() == 2  # union kept
    with pytest.raises(RuntimeError, match="compacted"):
        tables.read_table_latest(spark, root, "t", keys=["id"])


def test_compact_handles_missing_snapshot_dirs(spark, tmp_path):
    """Manifest lists snapshots whose dirs are gone (manual deletion /
    partial restore): compact must early-return empty stats, not crash on
    read_table() -> None (ADVICE r3)."""
    import shutil

    root = str(tmp_path)
    snap = tables.append_snapshot(
        spark.createDataFrame([(1, "a")], ["id", "v"]), root, "t"
    )
    shutil.rmtree(snap)
    stats = tables.compact_table(spark, root, "t")
    assert stats["files_after"] == 0
    stats = tables.compact_table(spark, root, "t", keys=["id"])
    assert stats["files_after"] == 0


def test_append_adopts_legacy_toplevel_files(spark, tmp_path):
    """A plain-parquet table (write_table) later appended to: adoption must
    fold the top-level files into a snapshot so their rows STAY VISIBLE —
    the old subdir-only adoption stranded them in no snapshot (readers
    silently dropped them and compaction deleted them unrecoverably)."""
    import os

    root = str(tmp_path)
    path = tables.write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1),
        root,
        "t",
    )
    assert any(f.endswith(".parquet") for f in os.listdir(path))
    tables.append_snapshot(spark.createDataFrame([(3, "c")], ["id", "v"]), root, "t")
    # no loose top-level parquet remains, and ALL rows survive adoption
    assert not any(
        f.endswith(".parquet")
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
    )
    assert tables.read_table(spark, root, "t").count() == 3
    # legacy rows rank OLDEST under latest-wins: an appended update beats
    # the pre-adoption row for the same key
    tables.append_snapshot(
        spark.createDataFrame([(1, "new")], ["id", "v"]), root, "t"
    )
    got = {
        r["id"]: r["v"]
        for r in tables.read_table_latest(spark, root, "t", keys=["id"]).collect()
    }
    assert got == {1: "new", 2: "b", 3: "c"}
    # compaction preserves everything (no data-deleting legacy GC)
    stats = tables.compact_table(spark, root, "t", target_files=1, keys=["id"])
    assert stats["legacy_files_adopted"] == 0  # adopted at append time
    got2 = {
        r["id"]: r["v"]
        for r in tables.read_table_latest(spark, root, "t", keys=["id"]).collect()
    }
    assert got2 == got


def test_compact_adopts_legacy_toplevel_files(spark, tmp_path):
    """Mixed layout left by OLDER code (manifest exists, loose top-level
    parquet invisible to it): compaction folds the stranded rows into the
    rewrite instead of deleting them (ADVICE r4)."""
    import json
    import os

    root = str(tmp_path)
    tables.append_snapshot(spark.createDataFrame([(3, "c")], ["id", "v"]), root, "t")
    path = tables.table_path(root, "t")
    # simulate the old bug: loose parquet at top level, not in any snapshot
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    # (the append above must not have touched the manifest)
    m = json.load(open(os.path.join(path, "_live_snapshots.json")))
    assert len(m["snapshots"]) == 1
    assert tables.read_table(spark, root, "t").count() == 1  # rows stranded
    stats = tables.compact_table(spark, root, "t", target_files=1)
    assert stats["legacy_files_adopted"] >= 1
    assert tables.read_table(spark, root, "t").count() == 3  # recovered
    assert not any(
        f.endswith(".parquet")
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
    )


def test_read_table_latest_same_millisecond_commits(spark, tmp_path):
    """Two snapshots committed in the same millisecond: latest-wins must
    rank by manifest APPEND ORDER, not by the name string (whose random hex
    suffix would tie-break nondeterministically) (ADVICE r4)."""
    import json
    import os

    root = str(tmp_path)
    path = tables.table_path(root, "t")
    # hex chosen so the NEWER commit sorts lexically SMALLER: a string-max
    # tie-break would resurrect the older row
    older, newer = "snap-1000-ffffffff", "snap-1000-aaaaaaaa"
    spark.createDataFrame([(1, "old")], ["id", "v"]).coalesce(1).write.parquet(
        os.path.join(path, older)
    )
    spark.createDataFrame([(1, "new")], ["id", "v"]).coalesce(1).write.parquet(
        os.path.join(path, newer)
    )
    with open(os.path.join(path, "_live_snapshots.json"), "w") as f:
        json.dump({"snapshots": [older, newer]}, f)
    got = tables.read_table_latest(spark, root, "t", keys=["id"]).collect()
    assert [(r["id"], r["v"]) for r in got] == [(1, "new")]


def test_operator_cache_release(spark, tmp_path):
    from chapterbridge_ocr_worker_spark.operators.cache import release_caches
    from chapterbridge_ocr_worker_spark.operators.dedup import minhash_candidates

    docs = spark.createDataFrame(
        [(i, f"common tokens here plus {i}") for i in range(30)],
        ["doc_id", "text"],
    )
    release_caches()  # drop anything earlier tests left behind
    minhash_candidates(docs).count()
    assert release_caches() == 1  # the signature cache was tracked + freed
    assert release_caches() == 0  # idempotent


def test_time_travel_snapshot_and_timestamp(spark, tmp_path):
    """Iceberg-parity time travel: as-of a snapshot name returns exactly the
    commit-prefix union; as-of a timestamp resolves to the last commit at or
    before it; list_snapshots reports commit order."""
    import time as _time

    from chapterbridge_ocr_worker_spark.sources import tables

    root = str(tmp_path)
    batches = [[(1, "a")], [(2, "b")], [(3, "c")]]
    for rows in batches:
        tables.append_snapshot(
            spark.createDataFrame(rows, ["id", "v"]), root, "tt"
        )
        _time.sleep(0.005)  # distinct commit millis for the timestamp leg

    snaps = tables.list_snapshots(root, "tt")
    assert [s["ordinal"] for s in snaps] == [0, 1, 2]
    millis = [s["commit_millis"] for s in snaps]
    assert millis == sorted(millis) and None not in millis

    def ids(df):
        return sorted(r["id"] for r in df.collect())

    assert ids(tables.read_table_asof(spark, root, "tt", snapshot=snaps[1]["name"])) == [1, 2]
    assert ids(tables.read_table_asof(spark, root, "tt", snapshot=snaps[2]["name"])) == [1, 2, 3]
    # timestamp between commit 0 and 1 -> only the first batch
    assert ids(tables.read_table_asof(spark, root, "tt", as_of_millis=millis[0])) == [1]
    # before any commit -> None; unknown snapshot -> loud
    assert tables.read_table_asof(spark, root, "tt", as_of_millis=millis[0] - 10_000) is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="never existed or compaction"):
        tables.read_table_asof(spark, root, "tt", snapshot="snap-0-deadbeef")
    with _pytest.raises(ValueError, match="exactly one"):
        tables.read_table_asof(spark, root, "tt")


def test_time_travel_history_expires_on_compaction(spark, tmp_path):
    """compact_table is the retention policy: pre-compaction snapshots
    leave the live history and as-of reads on them raise instead of
    silently returning post-compaction data."""
    import pytest as _pytest

    from chapterbridge_ocr_worker_spark.sources import tables

    root = str(tmp_path)
    for rows in ([(1, "a")], [(2, "b")]):
        tables.append_snapshot(
            spark.createDataFrame(rows, ["id", "v"]), root, "tt2"
        )
    old = tables.list_snapshots(root, "tt2")[0]["name"]
    tables.compact_table(spark, root, "tt2")
    snaps = tables.list_snapshots(root, "tt2")
    assert len(snaps) == 1  # history collapsed
    with _pytest.raises(ValueError, match="compaction expired"):
        tables.read_table_asof(spark, root, "tt2", snapshot=old)
    # the compacted snapshot itself still time-travels (full data)
    df = tables.read_table_asof(spark, root, "tt2", snapshot=snaps[0]["name"])
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_snapshot_stats_prune_file_skipping(spark, tmp_path):
    """Manifest min/max stats (Iceberg column-stats analogue): a range read
    via read_table_pruned must (a) equal read_table + filter exactly,
    (b) physically touch ONLY the snapshot directories whose recorded
    range intersects the predicate, (c) always read stats-less snapshots
    (conservative), and (d) return an empty frame with the right schema
    when every snapshot is provably disjoint."""
    root = str(tmp_path)
    mk = lambda lo, n: spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    s1 = tables.append_snapshot(mk(0, 100), root, "docs", stats_cols=["doc_id"])
    s2 = tables.append_snapshot(mk(1000, 100), root, "docs", stats_cols=["doc_id"])
    s3 = tables.append_snapshot(mk(2000, 100), root, "docs", stats_cols=["doc_id"])

    got = tables.read_table_pruned(spark, root, "docs", "doc_id", 1010, 1050)
    want = (
        tables.read_table(spark, root, "docs")
        .filter("doc_id between 1010 and 1050")
    )
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    # (b) only the middle snapshot's files are in the scan
    files = got.inputFiles()
    assert files and all(s2.split("/")[-1] in f for f in files)
    assert not any(s1.split("/")[-1] in f or s3.split("/")[-1] in f for f in files)

    # inclusive bounds: the exact min/max edges of a snapshot still match
    edge = tables.read_table_pruned(spark, root, "docs", "doc_id", 2099, None)
    assert [r["doc_id"] for r in edge.collect()] == [2099]

    # (c) a stats-less append is never skipped
    tables.append_snapshot(mk(5000, 10), root, "docs")
    got2 = tables.read_table_pruned(spark, root, "docs", "doc_id", 5000, 5004)
    assert got2.count() == 5

    # (d) all-pruned range: empty, schema intact
    none = tables.read_table_pruned(spark, root, "docs", "doc_id", 9_000_000, None)
    assert none.count() == 0 and none.columns == ["doc_id", "v"]


def test_snapshot_stats_survive_commit_merges_and_compaction(spark, tmp_path):
    """Stats ride the manifest through other writers' commits; compaction
    (which merges snapshots and rewrites the manifest) drops them, after
    which pruned reads degrade to conservative full reads — never wrong."""
    root = str(tmp_path)
    mk = lambda lo, n: spark.range(lo, lo + n).select(F.col("id").alias("doc_id"))
    tables.append_snapshot(mk(0, 50), root, "t", stats_cols=["doc_id"])
    tables.append_snapshot(mk(100, 50), root, "t")  # no stats
    tables.append_snapshot(mk(200, 50), root, "t", stats_cols=["doc_id"])
    m = tables._read_manifest(tables.table_path(root, "t"))
    assert len(m.get("column_stats", {})) == 2  # both stats appends kept

    before = sorted(
        r["doc_id"]
        for r in tables.read_table_pruned(spark, root, "t", "doc_id", 0, 49).collect()
    )
    tables.compact_table(spark, root, "t")
    after_df = tables.read_table_pruned(spark, root, "t", "doc_id", 0, 49)
    assert sorted(r["doc_id"] for r in after_df.collect()) == before


def _grid_df(spark, n=512):
    """Deterministic 2-D grid: x and y decorrelated so neither is a
    function of the other (the honest case for multi-dim clustering).
    y must NOT be an affine function of x — (id*37)%64 would collapse to
    37x mod 64 within each x class — so it hashes the full id."""
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(64)).alias("y"),
    )


def test_zorder_box_read_equals_plain_filter(spark, tmp_path):
    df = _grid_df(spark)
    root = str(tmp_path / "wh")
    tables.write_table_zordered(df, root, "grid", ["x", "y"], n_partitions=16)
    got = tables.read_table_pruned_box(
        spark, root, "grid", {"x": (10, 20), "y": (30, 50)}
    )
    want = df.filter((F.col("x").between(10, 20)) & (F.col("y").between(30, 50)))
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )


def test_zorder_huge_magnitude_column(spark, tmp_path):
    """Z-ordering on an epoch-microsecond-scale column (span ~1.7e18):
    the quantizer's (col - mn) * levels long multiply overflowed int64
    and threw ARITHMETIC_OVERFLOW under ANSI mode. The double fallback
    only changes the z-key (layout), never results — file min/max stats
    guarantee the box read, so the pruned read must still equal a plain
    filter."""
    base = 1_700_000_000_000_000_000
    df = spark.range(512).select(
        F.col("id"),
        (F.lit(base) + F.col("id") * F.lit(3_300_000_000_000_000)).alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(64)).alias("y"),
    )
    root = str(tmp_path / "wh")
    tables.write_table_zordered(df, root, "huge", ["ts", "y"], n_partitions=8)
    lo, hi = base + 100 * 3_300_000_000_000_000, base + 200 * 3_300_000_000_000_000
    got = tables.read_table_pruned_box(
        spark, root, "huge", {"ts": (lo, hi), "y": (10, 40)}
    )
    want = df.filter(
        (F.col("ts").between(lo, hi)) & (F.col("y").between(10, 40))
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )


def test_zorder_prunes_nonleading_dimension(spark, tmp_path):
    """The layout claim itself: a predicate on y ALONE (the non-leading
    dimension of a 1-D sort) prunes files under the z-order layout but
    cannot prune a layout sorted by x — this is what z-ordering buys at
    100 TB over plain sorting."""
    df = _grid_df(spark)
    root = str(tmp_path / "wh")
    tables.write_table_zordered(df, root, "zgrid", ["x", "y"], n_partitions=16)
    tables.append_snapshot(
        df.repartitionByRange(16, "x").sortWithinPartitions("x"),
        root,
        "xgrid",
        stats_cols=["x", "y"],
        file_stats_cols=["x", "y"],
    )
    preds = {"y": (0, 7)}  # 1/8 of the y range, all of x
    zsel = tables.pruned_selection(tables.table_path(root, "zgrid"), preds)
    xsel = tables.pruned_selection(tables.table_path(root, "xgrid"), preds)
    assert zsel["files_kept"] < zsel["files_total"] / 2
    assert xsel["files_kept"] == xsel["files_total"]
    # pruning never changes answers
    got = tables.read_table_pruned_box(spark, root, "zgrid", preds).count()
    assert got == df.filter(F.col("y").between(0, 7)).count()


def test_box_all_pruned_preserves_schema(spark, tmp_path):
    df = _grid_df(spark)
    root = str(tmp_path / "wh")
    tables.write_table_zordered(df, root, "grid", ["x", "y"], n_partitions=4)
    got = tables.read_table_pruned_box(
        spark, root, "grid", {"x": (1000, 2000)}
    )
    assert got.count() == 0
    assert got.columns == ["id", "x", "y"]


def test_box_statless_snapshot_is_conservative(spark, tmp_path):
    """A snapshot appended without file stats mixed into a z-ordered table
    must always be read (no wrong skips), and the union stays correct."""
    df = _grid_df(spark)
    root = str(tmp_path / "wh")
    tables.write_table_zordered(df, root, "grid", ["x", "y"], n_partitions=4)
    late = spark.createDataFrame([(9999, 10, 40)], "id: long, x: long, y: long")
    tables.append_snapshot(late, root, "grid")  # no stats at all
    got = tables.read_table_pruned_box(
        spark, root, "grid", {"x": (10, 10), "y": (40, 40)}
    ).collect()
    assert 9999 in {r["id"] for r in got}
    want = df.filter((F.col("x") == 10) & (F.col("y") == 40)).count() + 1
    assert len(got) == want
