"""Table IO layer — parquet-backed here, Iceberg in production.

Production target is an Iceberg catalog (`df.writeTo(...).append()`,
`MERGE INTO` for the segment-link upsert, snapshot isolation for resume —
SURVEY.md §1.1). The Iceberg runtime jar isn't in this container, so the
same interface is backed by parquet directories; every call site goes
through this module, making the swap a one-file change.

Scale notes baked in:
- documents/media/output are written partitioned or bucketed by hash of the
  key they're joined/grouped on, so re-reads co-locate;
- appends use unique subdirectories per job run (Iceberg snapshot analogue)
  so a killed job never corrupts previous commits — resume reads the union.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


_MANIFEST = "_live_snapshots.json"
_MANIFEST_LOCK = "_manifest.lock"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _read_manifest(path: str) -> dict | None:
    """Manifest dict {"snapshots": [...], "compacted": {...}?}, or None when
    the table has no manifest (legacy layout / plain parquet directory):
    readers then fall back to listing."""
    import json

    try:
        with open(_manifest_path(path)) as f:
            m = json.load(f)
            m["snapshots"]  # schema check
            return m
    except (OSError, ValueError, KeyError):
        return None


def _live_snapshots(path: str) -> list[str] | None:
    m = _read_manifest(path)
    return None if m is None else m["snapshots"]


def _write_manifest(path: str, snapshots: list[str], **extra) -> None:
    """Atomically publish the live-snapshot list (os.replace = the commit
    point; the Iceberg metadata-pointer-swap analogue)."""
    import json

    tmp = _manifest_path(path) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"snapshots": snapshots, **extra}, f)
    os.replace(tmp, _manifest_path(path))


class _manifest_lock:
    """fcntl advisory lock serializing manifest read-modify-write commits.

    Two concurrent append_snapshot writers both do read-manifest -> write
    -> publish; without the lock the second publish drops the first's
    snapshot (lost update). The lock makes the commit section a CAS-like
    critical region — the Iceberg analogue is the catalog's atomic
    compare-and-swap of the metadata pointer. Data writes stay OUTSIDE the
    lock (each snapshot is a unique directory), so writers only serialize
    on the few-ms manifest swap, not on each other's I/O."""

    def __init__(self, path: str):
        os.makedirs(path, exist_ok=True)
        self._path = os.path.join(path, _MANIFEST_LOCK)

    def __enter__(self):
        import fcntl

        self._f = open(self._path, "w")
        fcntl.flock(self._f, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        import fcntl

        fcntl.flock(self._f, fcntl.LOCK_UN)
        self._f.close()
        return False


def _list_snapshot_dirs(path: str) -> list[str]:
    """Committed snapshot dirs. Dot-prefixed dirs are in-flight writes
    (another appender's data, not yet renamed+committed under the lock) and
    must never be adopted, read, or GC'd as if they were snapshots."""
    return sorted(
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and not d.startswith(".")
    )


def _adopt_legacy_files(path: str) -> str | None:
    """Fold top-level parquet files (pre-manifest plain layout, e.g. a
    write_table output later appended to) into a synthetic snapshot dir so
    their rows stay visible to manifest readers — without this, adoption
    listed subdirs only and the legacy rows existed in NO snapshot: readers
    silently dropped them and compaction's GC deleted them unrecoverably.

    Must be called while holding _manifest_lock. Returns the synthetic
    snapshot name (caller registers it FIRST in the manifest — legacy rows
    predate every append, so latest-wins must treat them as oldest), or
    None when there is nothing to adopt."""
    files = [
        f
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
        and (f.endswith(".parquet") or f == "_SUCCESS")
    ]
    if not any(f.endswith(".parquet") for f in files):
        return None
    snap_name = f"snap-{int(time.time() * 1000)}-legacy00"
    snap = os.path.join(path, snap_name)
    os.makedirs(snap, exist_ok=True)
    for f in files:
        os.rename(os.path.join(path, f), os.path.join(snap, f))
    return snap_name


def _snapshot_order(path: str) -> list[str]:
    """Snapshot names in COMMIT order — the manifest's append order, which
    is what latest-wins must rank by. Two snapshots committed in the same
    millisecond would tie-break on random hex under a name sort; the
    manifest list position is the true commit sequence. Tables without a
    manifest fall back to the sorted listing (name order ~ commit order,
    best available)."""
    live = _live_snapshots(path)
    return live if live is not None else _list_snapshot_dirs(path)


def write_table(df: DataFrame, root: str, name: str, mode: str = "overwrite") -> str:
    path = table_path(root, name)
    df.write.mode(mode).parquet(path)
    return path


def _json_safe_stat(v):
    """min/max values must survive a JSON round-trip; anything exotic
    (timestamps, decimals) degrades to its string form — consistent on
    write and on prune-compare, which is all skipping needs."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


def append_snapshot(
    df: DataFrame,
    root: str,
    name: str,
    stats_cols: list[str] | None = None,
    file_stats_cols: list[str] | None = None,
) -> str:
    """Append as a new immutable snapshot directory (atomic-commit stand-in
    for Iceberg's append). Readers union LIVE snapshots via read_table.
    The manifest update after the data write is the commit point: a crash
    mid-write leaves an orphan directory no reader ever sees (cleaned by
    the next compact_table). CONCURRENT appenders are safe: the data write
    happens outside the lock (unique directory per snapshot), then the
    manifest read-modify-write runs under _manifest_lock so no commit can
    drop another writer's snapshot.

    ``stats_cols``: record per-snapshot min/max of these columns in the
    manifest (the Iceberg manifest-file column-stats analogue). The stats
    are aggregated from the just-written parquet — a footer-stats-backed
    scan of only those columns — and let read_table_pruned skip whole
    snapshot directories whose range cannot match a predicate. A snapshot
    appended WITHOUT stats is simply never skipped (conservative).

    ``file_stats_cols``: additionally record per-PARQUET-FILE min/max of
    these columns (the Iceberg data-file-stats analogue, one level below
    the snapshot stats). This is what makes a clustered layout pay off:
    after write_table_zordered, a 2-D box predicate prunes most FILES of
    a surviving snapshot, not just whole snapshots. Computed in the same
    footer-backed pass, grouped by input_file_name; keyed by basename so
    the inflight->snap directory rename keeps them valid."""
    snap_name = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
    path = table_path(root, name)
    snap = os.path.join(path, snap_name)
    # write to a dot-prefixed in-flight dir: a concurrent appender adopting
    # a legacy (manifest-less) table must not mistake this uncommitted data
    # for a committed snapshot, and listings/GC skip dotted dirs
    inflight = os.path.join(path, f".inflight-{snap_name}")
    df.write.mode("overwrite").parquet(inflight)
    snap_stats = None
    if stats_cols:
        from pyspark.sql import functions as F

        row = (
            df.sparkSession.read.parquet(inflight)
            .agg(
                *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(stats_cols)],
                *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(stats_cols)],
            )
            .collect()[0]
        )
        snap_stats = {
            c: [_json_safe_stat(row[f"mn_{i}"]), _json_safe_stat(row[f"mx_{i}"])]
            for i, c in enumerate(stats_cols)
        }
    snap_file_stats = None
    if file_stats_cols:
        from pyspark.sql import functions as F

        frows = (
            df.sparkSession.read.parquet(inflight)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(file_stats_cols)],
                *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(file_stats_cols)],
            )
            .collect()
        )
        snap_file_stats = {
            os.path.basename(r["f"]): {
                c: [
                    _json_safe_stat(r[f"mn_{i}"]),
                    _json_safe_stat(r[f"mx_{i}"]),
                ]
                for i, c in enumerate(file_stats_cols)
            }
            for r in frows
        }
    with _manifest_lock(path):
        m = _read_manifest(path)
        if m is None:  # adopt whatever legacy listing readers were seeing
            live = _list_snapshot_dirs(path)
            extra = {}
            # fold loose top-level parquet (plain write_table layout) into a
            # synthetic OLDEST snapshot — otherwise those rows are in no
            # snapshot and vanish from every manifest reader
            legacy = _adopt_legacy_files(path)
            if legacy is not None:
                live = [legacy] + live
        else:
            live = m["snapshots"]
            extra = {k: v for k, v in m.items() if k != "snapshots"}
        if snap_stats is not None:
            stats_map = dict(extra.get("column_stats", {}))
            stats_map[snap_name] = snap_stats
            extra["column_stats"] = stats_map
        if snap_file_stats is not None:
            fstats_map = dict(extra.get("file_stats", {}))
            fstats_map[snap_name] = snap_file_stats
            extra["file_stats"] = fstats_map
        os.rename(inflight, snap)  # data becomes visible only with the commit
        _write_manifest(path, live + [snap_name], **extra)
    return snap


def read_table(
    spark: SparkSession, root: str, name: str, schema: T.StructType | None = None
) -> DataFrame | None:
    """Read a table (all LIVE snapshots). Returns None if it doesn't exist
    yet. Tables without a manifest (legacy / plain parquet dirs) fall back
    to directory listing."""
    path = table_path(root, name)
    if not os.path.isdir(path):
        return None
    live = _live_snapshots(path)
    if live is not None:
        parquet_dirs = [
            os.path.join(path, d)
            for d in live
            if os.path.isdir(os.path.join(path, d))
        ]
        if not parquet_dirs:
            return None
    else:
        sub = [os.path.join(path, d) for d in _list_snapshot_dirs(path)]
        parquet_dirs = sub or [path]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*parquet_dirs)


def read_table_pruned(
    spark: SparkSession,
    root: str,
    name: str,
    col: str,
    lo=None,
    hi=None,
    schema: T.StructType | None = None,
) -> DataFrame | None:
    """Read rows with ``lo <= col <= hi`` (either bound may be None),
    SKIPPING every live snapshot whose manifest min/max range cannot
    intersect the predicate — Iceberg's manifest-level file pruning. At
    100 TB this is the difference between a point-in-range query that
    opens last week's snapshot and one that lists and footer-reads every
    snapshot ever committed: the skip decision is driver-side manifest
    arithmetic, no file is touched.

    Semantics are exactly read_table(...).filter(between): the row-level
    filter is still applied to the surviving directories (pruning is a
    file-skipping optimization, never a filter substitute). Snapshots
    without recorded stats for ``col`` are always read (conservative), so
    mixing stats-less appends in costs correctness nothing. Delegates to
    read_table_pruned_box — snapshots that also carry per-FILE stats are
    additionally pruned file-by-file."""
    return read_table_pruned_box(spark, root, name, {col: (lo, hi)}, schema)


def _range_disjoint(rng, lo, hi) -> bool:
    """True iff a recorded [mn, mx] range provably cannot intersect
    [lo, hi]. Missing/None stats or JSON-degraded incomparable values
    never prune — a wrong skip loses rows, a kept scan only costs IO."""
    if rng is None or rng[0] is None or rng[1] is None:
        return False
    mn, mx = rng
    try:
        return (hi is not None and mn > hi) or (lo is not None and mx < lo)
    except TypeError:
        # stats were JSON-degraded to strings (exotic column type) but the
        # bounds are not comparable to them: never crash a read over a
        # skip decision — fall back to scanning
        return False


def pruned_selection(path: str, preds: dict) -> dict | None:
    """Driver-side manifest arithmetic shared by the pruned readers (and
    inspectable by tests/benchmarks without running a query): which
    snapshot dirs / parquet files survive a conjunction of range
    predicates ``{col: (lo, hi)}``. Snapshot-level column_stats prune
    whole directories; file_stats (when the snapshot recorded them) prune
    individual files inside surviving directories. Returns
    ``{paths, dirs_total, files_total, files_kept}`` or None for a
    manifest-less legacy table."""
    m = _read_manifest(path)
    if m is None:
        return None
    stats = m.get("column_stats", {})
    fstats = m.get("file_stats", {})
    paths: list[str] = []
    dirs_total = files_total = files_kept = 0
    for s in m["snapshots"]:
        d = os.path.join(path, s)
        if not os.path.isdir(d):
            continue
        dirs_total += 1
        listing = [f for f in os.listdir(d) if f.endswith(".parquet")]
        files_total += len(listing)
        srng = stats.get(s, {})
        if any(
            _range_disjoint(srng.get(c), lo, hi) for c, (lo, hi) in preds.items()
        ):
            continue  # whole snapshot provably disjoint
        fs = fstats.get(s)
        if not fs:
            paths.append(d)
            files_kept += len(listing)
            continue
        for f in listing:
            frng = fs.get(f, {})
            if any(
                _range_disjoint(frng.get(c), lo, hi)
                for c, (lo, hi) in preds.items()
            ):
                continue
            paths.append(os.path.join(d, f))
            files_kept += 1
    return {
        "paths": paths,
        "dirs_total": dirs_total,
        "files_total": files_total,
        "files_kept": files_kept,
    }


def read_table_pruned_box(
    spark: SparkSession,
    root: str,
    name: str,
    preds: dict,
    schema: T.StructType | None = None,
) -> DataFrame | None:
    """Read rows matching a conjunction of range predicates
    ``{col: (lo, hi)}`` (either bound may be None), skipping snapshot
    directories via manifest column_stats and individual parquet files via
    file_stats — the multi-dimensional pruning that makes a
    write_table_zordered layout pay: a 2-D box over a z-clustered table
    opens only the files whose hyper-rectangle intersects the box.
    Row-level filters are always applied to whatever survives."""
    from pyspark.sql import functions as F

    path = table_path(root, name)
    if not os.path.isdir(path):
        return None

    def _pred():
        out = F.lit(True)
        for c, (lo, hi) in preds.items():
            if lo is not None:
                out = out & (F.col(c) >= F.lit(lo))
            if hi is not None:
                out = out & (F.col(c) <= F.lit(hi))
        return out

    sel = pruned_selection(path, preds)
    if sel is None:  # legacy table: no stats anywhere, plain filtered read
        full = read_table(spark, root, name, schema)
        return None if full is None else full.filter(_pred())
    if sel["dirs_total"] == 0:
        return None
    reader = spark.read.schema(schema) if schema is not None else spark.read
    if not sel["paths"]:  # everything pruned: empty result, schema preserved
        live = _live_snapshots(path) or []
        first = next(
            (os.path.join(path, d) for d in live if os.path.isdir(os.path.join(path, d))),
            None,
        )
        return reader.parquet(first).limit(0).filter(_pred())
    return reader.parquet(*sel["paths"]).filter(_pred())


def _snap_millis(snap_name: str) -> int | None:
    """Commit milliseconds embedded in a snapshot name, or None for names
    this module didn't mint (legacy fallback listings)."""
    try:
        return int(snap_name.split("-")[1])
    except (IndexError, ValueError):
        return None


def list_snapshots(root: str, name: str) -> list[dict]:
    """The table's committed snapshots in COMMIT order (manifest position) —
    the Iceberg `table.snapshots()` analogue. Each entry carries the name,
    its ordinal, the embedded commit timestamp, and the parquet file count.
    Metadata-only: no data is read, so this is O(snapshots) at any scale."""
    path = table_path(root, name)
    if not os.path.isdir(path):
        return []
    out = []
    for i, s in enumerate(_snapshot_order(path)):
        d = os.path.join(path, s)
        if not os.path.isdir(d):
            continue
        out.append(
            {
                "name": s,
                "ordinal": i,
                "commit_millis": _snap_millis(s),
                "n_files": sum(1 for f in os.listdir(d) if f.endswith(".parquet")),
            }
        )
    return out


def read_table_asof(
    spark: SparkSession,
    root: str,
    name: str,
    snapshot: str | None = None,
    as_of_millis: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame | None:
    """TIME TRAVEL: read the table as it was at a past commit — the union of
    the live-snapshot prefix up to and including ``snapshot`` (a name from
    list_snapshots) or the last snapshot committed at or before
    ``as_of_millis``. The Iceberg `VERSION AS OF` / `TIMESTAMP AS OF`
    analogue: pure metadata selection over the manifest's commit order, no
    data rewrite, so it costs the same as a current read at any scale.

    History retention is the compaction policy: compact_table collapses all
    live snapshots into one (Iceberg `expire_snapshots`), after which as-of
    reads older than the compaction raise — loudly, because silently
    returning the post-compaction union would misrepresent history.

    Returns None when the table doesn't exist or no snapshot had been
    committed at ``as_of_millis``.
    """
    if (snapshot is None) == (as_of_millis is None):
        raise ValueError("pass exactly one of snapshot= or as_of_millis=")
    path = table_path(root, name)
    if not os.path.isdir(path):
        return None
    order = _snapshot_order(path)
    if snapshot is not None:
        if snapshot not in order:
            raise ValueError(
                f"snapshot {snapshot!r} is not in table {name!r}'s live "
                f"history ({len(order)} snapshots) — either it never "
                "existed or compaction expired it"
            )
        idx = order.index(snapshot)
    else:
        eligible = [
            i
            for i, s in enumerate(order)
            if (_snap_millis(s) or 0) <= as_of_millis
        ]
        if not eligible:
            return None
        idx = max(eligible)
    dirs = [
        os.path.join(path, s)
        for s in order[: idx + 1]
        if os.path.isdir(os.path.join(path, s))
    ]
    if not dirs:
        return None
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*dirs)


def read_table_latest(
    spark: SparkSession, root: str, name: str, keys: list[str]
) -> DataFrame | None:
    """read_table with LATEST-SNAPSHOT-WINS per key.

    Snapshot directory names embed a millisecond commit timestamp, so row
    provenance (input_file_name) orders rows by commit time; for each key
    only the newest containing snapshot's rows survive. This is the reader
    for tables a forced reprocess (pipeline.write_run force=True) appended
    duplicate doc_ids into — the Iceberg equivalent of reading after MERGE
    instead of after a plain append.

    Compaction interplay: compact_table merges all live snapshots into ONE
    directory, which destroys the per-snapshot provenance this reader
    depends on — unless the compaction already applied the per-key dedup
    (compact_table(keys=...)). The manifest records how the table was
    compacted; a mismatch raises here instead of silently resurrecting
    superseded rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = read_table(spark, root, name)
    if df is None:
        return None
    m = _read_manifest(table_path(root, name))
    if m is not None and "compacted" in m:
        ckeys = m["compacted"].get("keys")
        if ckeys is None or list(ckeys) != list(keys):
            raise RuntimeError(
                f"table {name!r} was compacted with keys={ckeys} — snapshot "
                f"provenance for latest-wins on keys={keys} is gone. "
                "Compact with compact_table(..., keys=...) to preserve "
                "latest-wins semantics."
            )
    # rank snapshots by COMMIT order (manifest list position), not by name:
    # same-millisecond commits would otherwise tie-break on the random hex
    # suffix and latest-wins could pick the older commit nondeterministically
    order = _snapshot_order(table_path(root, name))
    ordinal = F.create_map(
        *[x for i, s in enumerate(order) for x in (F.lit(s), F.lit(i))]
    )
    snap = F.regexp_extract(F.input_file_name(), r"/(snap-\d+-[0-9a-z]+)/", 1)
    # rows outside any known snapshot (shouldn't happen post-adoption) rank
    # oldest rather than erroring
    ord_col = F.coalesce(ordinal[snap], F.lit(-1))
    latest = F.max("_snap_ord").over(Window.partitionBy(*keys))
    return (
        df.withColumn("_snap_ord", ord_col)
        .withColumn("_latest", F.col("_snap_ord") == latest)
        .filter(F.col("_latest"))
        .drop("_snap_ord", "_latest")
    )


def compact_table(
    spark: SparkSession,
    root: str,
    name: str,
    target_files: int | None = None,
    keys: list[str] | None = None,
    fold=None,
) -> dict:
    """Rewrite all of a table's snapshots into one compacted snapshot —
    the Iceberg `rewrite_data_files` analogue. Every append_snapshot adds a
    directory with shuffle-partition-count files, so a long-running
    incremental pipeline accumulates thousands of small files and every
    read pays the listing + open cost; compaction restores big-file scans.

    ``keys``: compaction MERGES snapshots, which destroys the per-snapshot
    provenance read_table_latest's latest-wins depends on. For tables that
    carry superseded rows (force=True reruns appending duplicate doc_ids),
    pass the latest-wins keys: the per-key winners are resolved DURING
    compaction, so the compacted table reads identically before and after.
    Without keys, rows are unchanged (plain union semantics) and the
    manifest records that provenance is gone — read_table_latest refuses
    such tables instead of silently resurrecting superseded rows.

    CRASH-SAFE via the manifest: the compacted data is written to a new
    (unregistered) snapshot directory first, then ONE atomic manifest swap
    (os.replace, under _manifest_lock) makes it live, then dead directories
    are dropped. A crash before the swap leaves readers on the old
    snapshots (the new dir is an invisible orphan, removed by the next
    compaction); a crash after the swap leaves orphan OLD dirs readers
    also never see — no reader ever observes duplicated rows.

    CONCURRENT APPEND SAFE: the commit re-reads the manifest under the
    lock and keeps any snapshot committed after compaction started
    (new manifest = [compacted] + late arrivals), so an appender running
    during the (long) rewrite never loses its commit. Run ONE compactor at
    a time (two concurrent compactions of the same table would each fold
    the other's output).

    ``fold``: optional DataFrame -> DataFrame transform applied to the
    unioned rows before the rewrite, for tables whose read-time semantics
    are an aggregate over snapshots (e.g. a Bloom bitmap folded with
    bit_or): fold(union of snapshots) must read identically to the union
    under the table's own reader. Mutually exclusive with ``keys`` (a
    folded table has no per-snapshot provenance to preserve).
    """
    if fold is not None and keys is not None:
        raise ValueError("compact_table: fold and keys are mutually exclusive")
    import shutil

    path = table_path(root, name)
    empty = {"files_before": 0, "files_after": 0, "snapshots_before": 0,
             "legacy_files_adopted": 0}
    if not os.path.isdir(path):
        return empty
    # fold any loose top-level parquet (mixed legacy layout this module's
    # older versions left behind) into a synthetic OLDEST snapshot before
    # reading, so the rewrite includes those rows instead of the GC deleting
    # data that existed in no snapshot
    legacy_adopted = 0
    with _manifest_lock(path):
        m = _read_manifest(path)
        legacy = _adopt_legacy_files(path)
        if legacy is not None:
            legacy_adopted = sum(
                1 for f in os.listdir(os.path.join(path, legacy))
                if f.endswith(".parquet")
            )
            if m is not None:
                extra = {k: v for k, v in m.items() if k != "snapshots"}
                snaps, extra = m["snapshots"], extra
            else:  # manifest-less mixed layout: adopt the listing too
                snaps = [d for d in _list_snapshot_dirs(path) if d != legacy]
                extra = {}
            _write_manifest(path, [legacy] + snaps, **extra)
    live = _live_snapshots(path)
    if live is None:
        live = _list_snapshot_dirs(path)
    old_snaps = [os.path.join(path, d) for d in live]

    def n_files(dirs):
        return sum(
            1
            for d in dirs
            if os.path.isdir(d)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    files_before = n_files(old_snaps)
    df = read_table_latest(spark, root, name, keys) if keys else read_table(
        spark, root, name
    )
    if df is None:  # manifest exists but every listed dir is gone
        return empty
    if fold is not None:
        df = fold(df)
    target = target_files or max(1, spark.sparkContext.defaultParallelism)
    # write the compacted snapshot WITHOUT registering it: a reader during
    # this window still unions exactly the old live set
    snap_name = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
    new_snap = os.path.join(path, snap_name)
    df.repartition(target).write.mode("overwrite").parquet(new_snap)
    with _manifest_lock(path):
        # CAS-style commit: keep snapshots appended while we were rewriting
        now_live = _live_snapshots(path)
        late = [
            d for d in (now_live if now_live is not None else [])
            if d not in live and d != snap_name
        ]
        _write_manifest(
            path, [snap_name] + late, compacted={"keys": keys}
        )
        # freeze the dead list WHILE holding the lock: an appender blocked
        # on the lock right now will rename+commit its snapshot the moment
        # we release — its dir is still dot-prefixed (invisible to the
        # listing) at this instant, so it can never land in `dead`.
        # Deleting a post-release listing instead would race exactly that
        # commit and rmtree a manifest-referenced directory.
        dead = [
            d for d in _list_snapshot_dirs(path)
            if d != snap_name and d not in late
        ]
    # everything frozen above is dead: the old live dirs plus any orphans a
    # previously crashed append/compaction left behind
    for d in dead:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    # dotted in-flight dirs belong to LIVE concurrent appenders — GC only
    # stale ones (a crashed writer's abandoned data; 1 h is far beyond any
    # single snapshot write)
    for d in os.listdir(path):
        dp = os.path.join(path, d)
        if d.startswith(".inflight-") and os.path.isdir(dp):
            if time.time() - os.path.getmtime(dp) > 3600:
                shutil.rmtree(dp, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": n_files([new_snap]),
        "snapshots_before": len(old_snaps),
        "legacy_files_adopted": legacy_adopted,
    }


def zorder_key(cols: list, ranges: list, bits: int = 4):
    """Bit-interleaved Z-curve value of numeric columns: each column is
    linearly quantized to 2^bits levels over its [mn, mx] range, then the
    quantized values' bits are interleaved (col0 gets bit positions
    0, k, 2k, ...). Nearby z-values are nearby in EVERY dimension, which
    is the whole trick: range-partitioning on z makes each output file a
    tight hyper-rectangle in all zcols at once, where a plain sort gives
    tight ranges in only the leading column. Pure column expressions —
    no UDF, stays in whole-stage codegen."""
    from pyspark.sql import functions as F

    k = len(cols)
    z = F.lit(0).cast("long")
    levels = 1 << bits
    for ci, (c, (mn, mx)) in enumerate(zip(cols, ranges)):
        if mn is None or mx is None:
            raise ValueError(f"zorder_key: column {c} has no min/max (all null?)")
        col = F.col(c) if isinstance(c, str) else c
        span = max(int(mx) - int(mn) + 1, 1)
        if span <= (1 << 62) // levels:
            # exact int64 multiply (bit-identical to the original layout)
            scaled = (col.cast("long") - F.lit(int(mn))) * F.lit(levels)
        else:
            # huge-magnitude columns (epoch-microsecond spans ~1.7e18):
            # the long multiply overflows int64 and throws under ANSI mode.
            # Quantize in double instead — the rounding noise only moves a
            # value across a cell boundary, which cannot break reads: file
            # min/max stats, not the z-key, guarantee pruning correctness.
            scaled = (col.cast("long") - F.lit(int(mn))).cast("double") * F.lit(
                float(levels)
            )
        q = F.floor(scaled / F.lit(span)).cast("long")
        q = F.least(F.lit(levels - 1), F.greatest(F.lit(0), q))
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * k + ci
            )
    return z


def write_table_zordered(
    df: DataFrame,
    root: str,
    name: str,
    zcols: list[str],
    n_partitions: int = 8,
    bits: int = 4,
) -> str:
    """Append a snapshot Z-ORDER clustered on ``zcols`` with per-file
    stats — the Iceberg `rewrite_data_files(strategy => 'sort',
    sort_order => zorder(...))` analogue.

    One footer-backed agg computes the global min/max per zcol (driver
    round-trip of 2*len(zcols) scalars), every row gets a z-curve key,
    and repartitionByRange + sortWithinPartitions on that key lays the
    data out so each parquet file covers a tight hyper-rectangle in ALL
    zcols. append_snapshot then records snapshot- and file-level min/max,
    and read_table_pruned_box turns a multi-column box predicate into
    opening only the few intersecting files. At 100 TB this is the
    difference between a (user, time)-box query scanning one leading-
    column stripe (everything in the time range, every user) and scanning
    ~box-volume worth of bytes."""
    from pyspark.sql import functions as F

    row = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(zcols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(zcols)],
    ).collect()[0]
    ranges = [(row[f"mn_{i}"], row[f"mx_{i}"]) for i in range(len(zcols))]
    clustered = (
        df.withColumn("_z", zorder_key(zcols, ranges, bits))
        .repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    return append_snapshot(
        clustered, root, name, stats_cols=zcols, file_stats_cols=zcols
    )


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write a catalog table hash-bucketed (and optionally sorted) on its
    join key. Both sides of an equi-join bucketed on the key with the same
    bucket count join SHUFFLE-FREE (and sort-free if sortBy'd) — the
    pipeline's media-blob join is the target: bucket media and the span
    table by media_ref and the byte-carrying exchange disappears
    (pinned by tests/test_plans.test_bucketed_join_is_shuffle_free).
    Iceberg analogue: a `bucket(N, col)` partition transform + SPJ
    (storage-partitioned joins)."""
    import shutil

    spark = df.sparkSession
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directory persists; a leftover location makes saveAsTable
    # fail with LOCATION_ALREADY_EXISTS — drop both
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    loc = os.path.join(wh, name.lower())
    if wh and os.path.isdir(loc):
        shutil.rmtree(loc)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def merge_upsert(
    spark: SparkSession, root: str, name: str, updates: DataFrame, keys: list[str]
) -> None:
    """MERGE INTO stand-in (Iceberg: WHEN MATCHED UPDATE / NOT MATCHED INSERT;
    reference upserts segment_assets on conflict keys,
    supabase_client.py:205-213). Parquet has no row-level ops, so: keep
    existing rows whose keys DON'T collide (anti-join), union the updates,
    rewrite via a staging directory and atomic-ish swap."""
    import shutil

    existing = read_table(spark, root, name)
    if existing is None:
        write_table(updates, root, name)
        return
    merged = existing.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    ).unionByName(updates)
    staging = table_path(root, f".{name}.staging")
    merged.write.mode("overwrite").parquet(staging)
    final = table_path(root, name)
    old = table_path(root, f".{name}.old")
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(final, old)
    os.rename(staging, final)
    shutil.rmtree(old)
