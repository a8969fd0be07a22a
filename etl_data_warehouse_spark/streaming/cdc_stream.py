"""Streaming CDC apply: fold a change stream into materialized state.

Streaming twin of ``operators/cdc.py``: ``readStream`` over a
changelog directory, ``foreachBatch`` compaction — each microbatch is
net-effected locally (``apply_changelog``: last writer per key within
the batch) and then merged onto the persisted snapshot
(``merge_changelog``: cross-batch last-writer-wins by the same seq
columns, tombstones delete). The reference's loaders implement only
the insert/update half of this on full snapshots
(reference: loaders/warehouse_loader.py:63-69, 124-128).

Exactly-once effectiveness: the snapshot merge is idempotent — replaying
a microbatch reproduces the same state because ordering is by the
changelog's OWN seq columns (retained in the snapshot), not arrival
time. Run with AvailableNow for the reference's batch cadence.

100 TB posture: per microbatch ONE shuffle on the key (the fold
window) + a snapshot-sized co-partitioned merge; with a partitioned
snapshot the merge drops to O(touched partitions) exactly like
``merge_upsert_partitioned`` (sources/sinks.py).
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cdc import apply_changelog, merge_changelog

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("change_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("op", T.StringType()),
    ]
)

KEY_COLS = ["key"]
SEQ_COLS = ["ts", "change_id"]


def read_change_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


# The snapshot is a directory of VERSIONED parquet dirs plus a pointer
# file. A new version is fully written before the pointer moves
# (os.replace is atomic on POSIX), so a failed write can never destroy
# the only copy of the state — the previous version stays referenced
# until the swap commits, then is garbage-collected best-effort.
_POINTER = "_CURRENT"


def _current_version_dir(snapshot_path: str) -> str | None:
    pointer = os.path.join(snapshot_path, _POINTER)
    if not os.path.exists(pointer):
        # No pointer. A directory that nonetheless CONTAINS snapshot
        # data is corruption (a lost pointer file, or data written by a
        # different/older layout) — treating it as "no snapshot yet"
        # would silently rebuild state from the current batch alone.
        # Only in-flight staging dirs (.tmp-*) and the pointer's own
        # tmp file are expected without a pointer; anything else raises.
        if os.path.isdir(snapshot_path):
            leftovers = [
                e
                for e in os.listdir(snapshot_path)
                if not e.startswith(".tmp-") and e != _POINTER + ".tmp"
            ]
            if leftovers:
                raise RuntimeError(
                    f"CDC snapshot at {snapshot_path} has data "
                    f"({leftovers[:3]}…) but no {_POINTER} pointer — "
                    "refusing to silently reset state. Restore the "
                    "pointer or clear the directory to start fresh."
                )
        return None
    with open(pointer, "r", encoding="utf-8") as fh:
        version = fh.read().strip()
    return os.path.join(snapshot_path, version)


def _read_snapshot(spark: SparkSession, path: str) -> DataFrame | None:
    version_dir = _current_version_dir(path)
    if version_dir is None:
        return None
    # A pointed-at version that fails to read is real corruption, not
    # "no snapshot yet" — re-raise rather than silently dropping state.
    return spark.read.parquet(version_dir)


def _version_sort_key(name: str) -> tuple[int, int]:
    """(batch_id, retry) parsed from 'v{batch:012d}[-r{retry}]'.

    Sorting on the PARSED pair, not the raw name: a lexicographic sort
    would order '-r10' before '-r2' once a batch replays ten times.
    Unparseable v* names sort last (they are debris, and committed-set
    membership checks don't care about their position)."""
    body = name[1:]
    batch, _, retry = body.partition("-r")
    try:
        return (int(batch), int(retry) if retry else 0)
    except ValueError:
        return (sys.maxsize, sys.maxsize)


# Explicit record of committed version names. Inferring commit status
# from sort-key <= pointer is wrong in one corner: a crash-orphan v{B}
# (rename done, pointer swap not) would become "committed"
# retroactively once batch B replays and commits v{B}-r1, since
# (B,0) <= (B,1) — surfacing state no reader was ever pointed at.
# The log is rewritten atomically AFTER each pointer swap; a crash
# between swap and log write leaves the pointed version missing from
# the log, so the committed set is always log ∪ {pointed}.
_COMMITLOG = "_COMMITS"


def _read_commitlog(snapshot_path: str) -> list[str] | None:
    p = os.path.join(snapshot_path, _COMMITLOG)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return [ln.strip() for ln in fh if ln.strip()]


def _write_commitlog(snapshot_path: str, names: list[str]) -> None:
    tmp = os.path.join(snapshot_path, _COMMITLOG + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("\n".join(names) + "\n")
    os.replace(tmp, os.path.join(snapshot_path, _COMMITLOG))


def _pointed_version(snapshot_path: str) -> str | None:
    pointer = os.path.join(snapshot_path, _POINTER)
    if not os.path.exists(pointer):
        return None
    with open(pointer, encoding="utf-8") as fh:
        return fh.read().strip()


def _committed_versions(snapshot_path: str) -> list[str]:
    """COMMITTED version dir names, oldest → newest commit order.

    The committed set is the explicit commit log (``_COMMITS``) plus
    the currently pointed version (covers a crash between pointer swap
    and log write), restricted to dirs still on disk. A v* dir on disk
    but in neither — a crash artifact whose rename happened but whose
    pointer swap did not — is excluded: time travel and replay guards
    must never surface state no reader was ever pointed at, even after
    its batch replays under a ``-r{n}`` name. Snapshots created before
    the commit log existed fall back to the sort-key <= pointer
    inference."""
    if not os.path.isdir(snapshot_path):
        return []
    on_disk = {
        e
        for e in os.listdir(snapshot_path)
        if e.startswith("v") and not e.startswith(".tmp-")
    }
    log = _read_commitlog(snapshot_path)
    pointed = _pointed_version(snapshot_path)
    if log is None:
        # legacy layout (no commit log): infer from the pointer
        names = sorted(on_disk, key=_version_sort_key)
        if pointed is not None:
            cutoff = _version_sort_key(pointed)
            names = [n for n in names if _version_sort_key(n) <= cutoff]
        return names
    committed = [n for n in log if n in on_disk]
    if pointed and pointed in on_disk and pointed not in committed:
        committed.append(pointed)
    return sorted(committed, key=_version_sort_key)


def _commit_snapshot(
    snapshot_path: str,
    batch_id: int,
    state: DataFrame,
    retain_versions: int = 1,
) -> str:
    os.makedirs(snapshot_path, exist_ok=True)
    # At-least-once replay: if this batch already committed (crash
    # between the pointer swap and the stream's checkpoint commit), the
    # pointer now points AT v{batch_id} — the very directory the merge
    # plan is reading. Overwriting it raises "Cannot overwrite a path
    # that is also being read from" on every retry and wedges recovery,
    # so always commit into a dir that does not yet exist and swap the
    # pointer onto it.
    base = f"v{batch_id:012d}"
    version, retry = base, 0
    while os.path.exists(os.path.join(snapshot_path, version)):
        retry += 1
        version = f"{base}-r{retry}"
    version_dir = os.path.join(snapshot_path, version)
    # Stage under a .tmp- name so a crash mid-write leaves only debris
    # the corruption check in _current_version_dir ignores; the
    # rename→pointer-swap pair is two metadata ops (local/HDFS rename is
    # atomic — on object stores use a rename-capable committer). A crash
    # exactly between them leaves an unpointed v* dir, which the next
    # read raises on: indistinguishable from a lost pointer, and the
    # operator (not the code) must decide which it was.
    staging = os.path.join(snapshot_path, f".tmp-{version}")
    state.write.mode("overwrite").parquet(staging)
    os.rename(staging, version_dir)
    # Committed history BEFORE this commit (old pointer still current):
    # computed now so a crash-orphan sibling of `version` (same batch,
    # lower retry, never pointed) can never be inferred committed.
    prior = [
        n for n in _committed_versions(snapshot_path) if n != version
    ]
    tmp_pointer = os.path.join(snapshot_path, _POINTER + ".tmp")
    with open(tmp_pointer, "w", encoding="utf-8") as fh:
        fh.write(version)
    os.replace(tmp_pointer, os.path.join(snapshot_path, _POINTER))
    # best-effort GC: keep the newest ``retain_versions`` committed
    # versions (the fresh one included) as a time-travel window; older
    # versions and stale staging dirs are garbage. retain_versions=1 is
    # the classic latest-only snapshot. The commit log records exactly
    # the kept set (rewritten atomically, after the pointer swap so the
    # log never lists an unpointed version).
    committed = prior + [version]
    keep_list = committed[-max(1, retain_versions):]
    if version not in keep_list:
        keep_list.append(version)
    _write_commitlog(snapshot_path, keep_list)
    keep = set(keep_list)
    for entry in os.listdir(snapshot_path):
        if entry == _POINTER or entry in keep:
            continue
        if entry.startswith("v") or entry.startswith(".tmp-"):
            shutil.rmtree(
                os.path.join(snapshot_path, entry), ignore_errors=True
            )
    return version_dir


def list_snapshot_versions(snapshot_path: str) -> list[str]:
    """Retained (time-travel-readable) versions, oldest → newest."""
    return _committed_versions(snapshot_path)


def read_cdc_state(
    spark: SparkSession, snapshot_path: str, version: str | None = None
) -> DataFrame:
    """Live state (snapshot minus tombstones) — current by default, or
    a retained historical ``version`` (time travel; see
    ``start_cdc_stream(retain_versions=...)`` and
    :func:`list_snapshot_versions`)."""
    from ..operators.cdc import DELETE_OP

    if version is not None:
        vdir = os.path.join(snapshot_path, version)
        if version not in _committed_versions(snapshot_path):
            raise FileNotFoundError(
                f"version {version!r} not retained at {snapshot_path}; "
                f"available: {_committed_versions(snapshot_path)}"
            )
        snap = spark.read.parquet(vdir)
    else:
        snap = _read_snapshot(spark, snapshot_path)
        if snap is None:
            raise FileNotFoundError(
                f"no CDC snapshot committed at {snapshot_path}"
            )
    return snap.filter(F.col("op") != DELETE_OP).drop("op")


def start_cdc_stream(
    spark: SparkSession,
    input_dir: str,
    snapshot_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files: int = 16,
    retain_versions: int = 1,
):
    """Start (or drain with AvailableNow) the CDC materializer.

    ``retain_versions`` > 1 keeps that many committed snapshot versions
    on disk as a time-travel window (read them with
    ``read_cdc_state(..., version=...)``) — the Delta/Iceberg
    time-travel affordance expressed on plain Parquet."""

    def compact_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # Net-effect the batch first (one tombstone-retaining row per
        # touched key), then merge onto the snapshot. Tombstones stay
        # IN the snapshot so late out-of-order upserts cannot resurrect
        # deleted keys; read_cdc_state filters them out.
        net = apply_changelog(
            batch_df, KEY_COLS, SEQ_COLS, keep_tombstones=True
        ).drop("n_changes")
        snapshot = _read_snapshot(sess, snapshot_path)
        if snapshot is None:
            state = net
        else:
            state = merge_changelog(
                snapshot, net, KEY_COLS, SEQ_COLS, keep_tombstones=True
            ).drop("n_changes")
        # Write the NEW version next to the old one and swap the pointer
        # only once it is fully on disk: the old snapshot (which feeds
        # this very plan) is never deleted before its successor exists.
        _commit_snapshot(
            snapshot_path, batch_id, state, retain_versions=retain_versions
        )

    writer = (
        read_change_stream(spark, input_dir, max_files=max_files)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(compact_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
