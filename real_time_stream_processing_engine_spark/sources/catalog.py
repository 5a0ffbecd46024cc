"""Storage-plane parity (SURVEY.md §2.4) — HyDFS operations mapped onto
a real filesystem + Spark IO.

The reference hand-rolls a replicated file store: SHA-1-ring placement
(``RainStorm.java:487-497``), 3-way replication with successor repair
(``RainStorm.java:770-825``), client-serialized appends with per-node
version vectors (``RainStorm.java:552-580``), and a 3-way line merge for
replica convergence (``RainStorm.java:651-768``).  On Spark every one of
those concerns is the filesystem's job (HDFS/S3 replicate, repair, and
version); what remains is the thin catalog surface below — the verbs a
HyDFS user actually typed (create/get/append/ls/merge) expressed as
Spark IO, each a one-liner because durability is delegated.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

#: sibling-directory suffixes used by the replace_contents swap protocol.
#: The shared uuid token PAIRS a tmp dir with the old dir it displaced so
#: :func:`recover_swap` can tell "swap in flight" from stale scratch.
_SWAP_TMP = "__swap_tmp_"
_SWAP_OLD = "__swap_old_"


def create(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """HyDFS ``create`` (``RainStorm.java:468-485``): first write wins;
    fails if the file already exists (errorifexists mode)."""
    getattr(df.write.mode("errorifexists"), fmt)(path)


def get(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """HyDFS ``get`` (``RainStorm.java:487-527``): read from any replica
    — replica choice, caching, and consistency are the FS's job."""
    return getattr(spark.read, fmt)(path)


def append(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """HyDFS ``append`` (``RainStorm.java:552-580``): new files in the
    same directory.  Spark's committer orders nothing ACROSS jobs — like
    HyDFS, concurrent appends land in arrival order; unlike HyDFS, each
    append is atomic (no torn lines, no per-node version vectors to
    merge)."""
    getattr(df.write.mode("append"), fmt)(path)


def ls(spark: SparkSession, path: str) -> list[dict]:
    """HyDFS ``ls`` (``RainStorm.java:582-614``): file listing with
    sizes.  Block/replica locations are intentionally NOT surfaced —
    that is the FS's concern, and plans should never depend on them."""
    # Hadoop FS API via the JVM gateway so the listing matches exactly
    # what Spark's scans will see (globbing, hidden-file rules aside).
    from .fsmeta import fs_and_path

    fs, p = fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        out.append(
            {
                "path": st.getPath().toString(),
                "bytes": st.getLen(),
                "is_dir": st.isDirectory(),
                "modified_ms": st.getModificationTime(),
            }
        )
    return sorted(out, key=lambda d: d["path"])


def merge(spark: SparkSession, path: str, fmt: str = "parquet", target_files: int | None = None) -> None:
    """HyDFS ``merge`` (``RainStorm.java:651-768``) re-converged replicas.

    With durability delegated there is nothing to converge; the useful
    surviving semantic is COMPACTION — many small append files rewritten
    to few large ones (the small-files problem is the 100 TB analogue of
    replica sprawl).  Rewrites via a temp dir + atomic rename.

    FLAT LAYOUTS ONLY: a hive-partitioned table (key=value subdirs)
    would silently coalesce to ONE unpartitioned file, destroying the
    layout partition pruning depends on — refused up front; compact
    partitioned tables per-partition instead (r5 review catch).
    EXCLUSIVE WRITER during the merge: an append racing the rewrite
    window lands its files in the directory the swap renames aside
    and deletes — same single-compactor discipline every file-based
    table format requires (a lakehouse format's optimistic commit
    protocol is the upgrade path)."""
    entries = ls(spark, path)
    if any(
        e["is_dir"] and "=" in os.path.basename(e["path"]) for e in entries
    ):
        raise ValueError(
            f"merge({path}): hive-partitioned layout — compacting would "
            "flatten it; rewrite per-partition instead"
        )
    # NON-hive subdirectories refused too (r8 review): Spark's default
    # parquet read lists only TOP-LEVEL files under a non-partitioned
    # dir (verified: nested batch dirs are silently skipped), so
    # compacting a nested drop-zone would rewrite the table from the
    # top-level slice and the swap would DELETE every nested batch —
    # silent data loss, not a flattening.
    nested = sorted(
        os.path.basename(e["path"]) for e in entries if e["is_dir"]
    )
    if nested:
        raise ValueError(
            f"merge({path}): nested layout (subdirectories {nested[:5]}) — "
            "the default reader sees only top-level files, so compaction "
            "would silently drop the nested batches; compact each "
            "subdirectory, or flatten the layout first"
        )
    df = get(spark, path, fmt)
    # target size from the FILE listing (cheap metadata), not
    # df.rdd.getNumPartitions() — that forces an RDD conversion + plan
    # analysis just to count inputs the FS already knows
    n_files = sum(
        1
        for e in entries
        if not e["is_dir"]
        and not os.path.basename(e["path"]).startswith(("_", "."))
    )
    n = target_files or max(1, n_files // 8)
    replace_contents(df.coalesce(n), path, fmt)


def replace_contents(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """Atomically replace a table directory with ``df``'s contents.

    The df must be readable while ``path`` still holds the OLD data
    (read-modify-write), so the write lands in a sibling temp dir first
    and swaps in via FS rename — readers see old-or-new, never a
    half-written mix.  On HDFS the rename is atomic; on S3 a real
    deployment swaps a catalog/manifest pointer instead (same call
    site, different FS contract).

    Swap protocol (each step atomic; the uuid ``token`` pairs the dirs
    and isolates concurrent callers' scratch writes):

    1. write df          -> ``{path}__swap_tmp_{token}``  (slow; dst untouched)
    2. rename dst        -> ``{path}__swap_old_{token}``
    3. rename tmp        -> dst
    4. delete old

    No step deletes the target before its replacement is in place, so a
    crash at ANY point leaves either the old or the new contents fully
    recoverable: between 2 and 3 the target is briefly missing, but the
    (old, tmp) sibling pair survives and — because step 2 only starts
    after the tmp write completed — :func:`recover_swap` can always
    finish the swap forward.  Callers that reseed a missing target
    (``streaming/runner.py`` CDC) MUST call :func:`recover_swap` first,
    otherwise a crash in that window would silently resurrect a
    pristine seed over committed batches."""
    spark = df.sparkSession
    token = uuid.uuid4().hex
    base = path.rstrip("/")
    tmp = f"{base}{_SWAP_TMP}{token}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(tmp)
    from .fsmeta import fs_and_path, rename_or_raise

    fs, src = fs_and_path(spark, tmp)
    _, dst = fs_and_path(spark, base)
    _, oldp = fs_and_path(spark, f"{base}{_SWAP_OLD}{token}")
    # every rename CHECKED: Hadoop rename reports failure by returning
    # false, and an unchecked step-2 failure would nest the tmp dir
    # INSIDE the live table at step 3 (r5 review catch)
    if fs.exists(dst):
        rename_or_raise(fs, dst, oldp)
    rename_or_raise(fs, src, dst)
    # step-4 delete CHECKED: a silently-failed delete leaves a stale
    # __swap_old_ beside the healthy target, and a LATER crashed swap
    # would then face an ambiguous recovery (r7 review — recover_swap
    # now prefers paired sets, but the stale dir should never exist)
    if not fs.delete(oldp, True) and fs.exists(oldp):
        raise IOError(f"failed to delete swap leftover {oldp}")


def recover_swap(
    spark: SparkSession, path: str, drop_stale_tmps: bool = False
) -> bool:
    """Complete (or roll back) an interrupted :func:`replace_contents`.

    Returns True iff ``path`` holds a complete table on return.  Scans
    the parent directory for this table's ``__swap_old_`` /
    ``__swap_tmp_`` siblings:

    - target missing + paired (old, tmp): the tmp write finished before
      the old rename began, so finish FORWARD — rename tmp to the
      target, drop old (the committed batches in tmp win).
    - target missing + old only: roll back — rename old to the target.
    - target present: leftover ``__swap_old_`` dirs are an unfinished
      step-4 delete of a COMPLETED swap — drop them.  Leftover
      ``__swap_tmp_`` dirs are NOT touched by default (r9 review): a
      tmp is indistinguishably either stale scratch from a crashed
      step-1 write or a concurrent :func:`replace_contents`' IN-FLIGHT
      step-1 write, and deleting a live writer's tmp mid-write strands
      its step-3 rename with the table already moved aside.  Pass
      ``drop_stale_tmps=True`` — an explicit no-concurrent-writer
      assertion — to reclaim orphaned tmp scratch.

    Idempotent and safe to call before every read-or-seed decision
    while a single writer may be live; concurrent swaps on one target
    remain unsupported (two paired sets raise)."""
    from .fsmeta import fs_and_path, rename_or_raise

    base = path.rstrip("/")
    fs, dst = fs_and_path(spark, base)
    parent, name = dst.getParent(), dst.getName()
    olds: dict[str, object] = {}
    tmps: dict[str, object] = {}
    if parent is not None and fs.exists(parent):
        for st in fs.listStatus(parent):
            n = st.getPath().getName()
            if n.startswith(name + _SWAP_OLD):
                olds[n[len(name + _SWAP_OLD):]] = st.getPath()
            elif n.startswith(name + _SWAP_TMP):
                tmps[n[len(name + _SWAP_TMP):]] = st.getPath()
    if not fs.exists(dst):
        # Prefer a PAIRED (old, tmp) set over any lone old: step 2 only
        # runs after the tmp write completed, so a pair's tmp is the
        # newest committed data and finishing FORWARD is always right.
        # A lone old beside a pair is stale scratch from an unchecked
        # step-4 delete — rolling IT back (the old sorted-first-token
        # behavior) would resurrect the pre-swap snapshot and the
        # cleanup below would delete the newest data (r7 review).
        paired = sorted(t for t in olds if t in tmps)
        if len(paired) > 1:  # pragma: no cover - two in-flight swaps
            raise RuntimeError(
                f"ambiguous swap recovery for {base}: multiple paired "
                f"(old, tmp) sets {paired} — concurrent swaps on one "
                "target are unsupported; resolve manually"
            )
        if paired:
            token = paired[0]
            # the delete of old runs ONLY after the forward rename
            # SUCCEEDED — an unchecked false return here would
            # destroy the only surviving copy (r5 review catch)
            rename_or_raise(fs, tmps.pop(token), dst)
            fs.delete(olds.pop(token), True)
        elif len(olds) == 1:
            ((token, oldp),) = olds.items()
            rename_or_raise(fs, oldp, dst)
            olds.pop(token)
        elif len(olds) > 1:  # pragma: no cover - needs two failures
            raise RuntimeError(
                f"ambiguous swap recovery for {base}: target missing "
                f"with multiple lone __swap_old_ dirs {sorted(olds)} and "
                "no paired tmp — cannot tell which snapshot is newest; "
                "resolve manually"
            )
    if not fs.exists(dst):
        return False
    stale = list(olds.values()) + (
        list(tmps.values()) if drop_stale_tmps else []
    )
    for p in stale:
        fs.delete(p, True)
    return True


def exists(spark: SparkSession, path: str) -> bool:
    from .fsmeta import hadoop_path_exists

    return hadoop_path_exists(spark, path)


def build_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    date_col: str = "event_date",
    force: bool = False,
    source_path: str | None = None,
) -> None:
    """Materialize an event table in the canonical time-series layout:
    partitioned by event DATE, so any time-bounded query prunes to its
    days at the source listing (``PartitionFilters: [event_date ...]``)
    — the storage shape every at-scale event store converges on
    (reading one day of a year costs 1/365th of the bytes).

    IDEMPOTENT like the IVF/BM25 index builds (manifest-committed,
    :mod:`..operators.indexing`): a completed layout with the same
    parameters is reused; a parameter change rebuilds; a source rewrite
    is detected from ``source_path``'s metadata fingerprint when given
    (production appends new daily partitions instead of rebuilding).
    The date column is DERIVED in UTC from the session timezone pin
    (session.py) so oracle date arithmetic agrees."""
    from pyspark.sql import functions as F

    from ..operators.indexing import (
        manifest_matches,
        params_fingerprint,
        source_params,
        write_manifest,
    )

    spark = df.sparkSession
    fp = params_fingerprint(
        {"ts": ts_col, "date": date_col, "v": 1}
        | source_params(spark, source_path)
    )
    if not force and manifest_matches(spark, path, fp):
        return
    out = df.withColumn(date_col, F.to_date(F.col(ts_col)))
    # repartition on the date first: each day directory gets files from
    # one task wave, not one file per upstream task per day.  The
    # rebuild rides the module's own atomic swap (r7 review): a direct
    # mode("overwrite") deleted the previous good layout BEFORE the
    # write, so a crash mid-rebuild destroyed it with no recovery, and
    # concurrent readers saw a half-deleted tree.  recover_swap first:
    # an earlier crashed rebuild may have left the (old, tmp) pair.
    recover_swap(spark, path)
    replace_contents(out.repartition(date_col), path, partition_by=[date_col])
    write_manifest(spark, path, fp)


def create_bucketed(
    df: DataFrame, table: str, buckets: int, *cols: str, sort: bool = True
) -> None:
    """Write a bucketed (and bucket-sorted) catalog table.

    Bucketing is the 100 TB co-location tool the flat-path verbs above
    can't give: two tables bucketed on the same key with the same
    bucket count join with NO exchange and (when sorted) NO sort — the
    shuffle happens once at write time and is amortized over every
    subsequent join/aggregate on that key.  The reference's analogue is
    its consistent-hash chunk placement (``RainStorm.java:487-497``),
    which co-locates *files*; bucketing co-locates *keys*.
    """
    writer = (
        df.write.format("parquet").mode("overwrite").bucketBy(buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)
