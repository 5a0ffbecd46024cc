"""Change-data-capture application: batch upsert (MERGE semantics).

The reference's HyDFS is append-only (``create``/``append``/``merge``
compaction, ``FileSystem.java``) — it cannot update a record in place.
This operator supplies the missing verb for slowly-changing reference
data in a training pipeline (dim refreshes, label fixes, tombstones):
apply a batch of keyed changes to a target table, emitting the merged
next version.

Shape: ONE sort-merge (or AQE-chosen broadcast) FULL OUTER join on the
key — the same plan a table format's MERGE INTO compiles to.  At 100 TB
the practical deltas are (a) bucket both sides on the key so the join
co-locates without a shuffle, and (b) write the result partitioned the
same way so the next upsert reuses the layout; a lakehouse format
(Delta/Iceberg/Hudi) adds file-level skipping on top of the identical
join, so this operator is forward-compatible with one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _validate_merge_spec(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    set_cols: dict[str, str],
    insert_only_cols: dict[str, str],
    op_col: str | None,
) -> None:
    """Reject the merge-spec shapes that would otherwise surface as
    AMBIGUOUS_REFERENCE mid-join or as silently-shadowed semantics
    (r5 review catch; destination/source existence and the
    ``present`` scratch hazard added r7):

    - a key column is immutable: naming it as a set/insert target
      would build two ``_u_<key>`` columns;
    - one target column in BOTH set_cols and insert_only_cols would
      let the dict merge silently drop the UPDATE mapping;
    - every DESTINATION must exist on the target and every SOURCE on
      the updates frame — a typo'd destination used to be silently
      dropped by the output loop while rows still tagged 'update'
      (silent corruption, r7 review);
    - a key/destination literally named ``present`` would alias to
      the ``_u_present`` join marker (duplicate column →
      AMBIGUOUS_REFERENCE);
    - the ``_t_present``/``_u_*`` scratch names and ``op_col`` must
      not collide with real target columns."""
    overlap = set(key_cols) & (set(set_cols) | set(insert_only_cols))
    if overlap:
        raise ValueError(
            f"key columns are immutable; remove {sorted(overlap)} from "
            "set_cols/insert_only_cols"
        )
    both = set(set_cols) & set(insert_only_cols)
    if both:
        raise ValueError(
            f"{sorted(both)} appear in BOTH set_cols and insert_only_cols "
            "— pick one semantics per target column"
        )
    missing_dst = sorted(
        (set(set_cols) | set(insert_only_cols)) - set(target.columns)
    )
    if missing_dst:
        raise ValueError(
            f"destination column(s) {missing_dst} do not exist on the "
            "target — the merge would silently drop them"
        )
    missing_src = sorted(
        ({*set_cols.values(), *insert_only_cols.values()} | set(key_cols))
        - set(updates.columns)
    )
    if missing_src:
        raise ValueError(
            f"updates frame lacks source column(s) {missing_src}"
        )
    if "present" in set(key_cols) | set(set_cols) | set(insert_only_cols):
        raise ValueError(
            "a key/destination named 'present' aliases onto the merge's "
            "_u_present join marker — rename it first"
        )
    reserved = [
        c
        for c in target.columns
        if c == "_t_present" or c.startswith("_u_")
    ]
    if reserved:
        raise ValueError(
            f"target columns {reserved} collide with the merge's scratch "
            "names (_t_present / _u_*) — rename them first"
        )
    if op_col is not None and op_col in target.columns:
        raise ValueError(
            f"op_col {op_col!r} already exists on the target — pass a "
            "different audit-column name or op_col=None"
        )


def _merge_by_key(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    set_cols: dict[str, str],
    insert_only_cols: dict[str, str],
    version_cols: dict[str, str],
    op_col: str | None,
) -> DataFrame:
    """Shared MERGE core of :func:`apply_upsert` and
    :func:`apply_upsert_versioned` (they were ~30-line near-copies —
    factored r7 so a scratch-name or coalesce fix cannot reach one and
    silently miss the other).  The ONLY semantic difference between
    the two is the take-from-update predicate: plain upsert takes on
    any match; versioned takes only when the update's version struct
    is STRICTLY newer (or the target row was never versioned)."""
    clash = set(set_cols) & set(version_cols)
    if clash:
        raise ValueError(
            f"{sorted(clash)} appear in BOTH set_cols and version_cols "
            "— the version mapping would silently win; pick one"
        )
    _validate_merge_spec(
        target, updates, key_cols, {**set_cols, **version_cols},
        insert_only_cols, op_col,
    )
    if version_cols:
        missing = [c for c in version_cols if c not in target.columns]
        if missing:
            raise ValueError(f"target lacks version columns {missing}")
    u = updates.select(
        *[F.col(k).alias(f"_u_{k}") for k in key_cols],
        *[
            F.col(src).alias(f"_u_{dst}")
            for dst, src in {**set_cols, **insert_only_cols, **version_cols}.items()
        ],
        F.lit(1).alias("_u_present"),
    )
    cond = [target[k].eqNullSafe(F.col(f"_u_{k}")) for k in key_cols]
    j = target.withColumn("_t_present", F.lit(1)).join(u, cond, "full_outer")
    matched = F.col("_t_present").isNotNull() & F.col("_u_present").isNotNull()
    insert = F.col("_t_present").isNull()
    if version_cols:
        t_ver = F.struct(*[target[c] for c in version_cols])
        u_ver = F.struct(*[F.col(f"_u_{c}") for c in version_cols])
        # never-versioned = FIRST version component NULL: version
        # columns are seeded NULL together on first materialization
        # (the documented contract), so the head component is the flag
        never_versioned = target[next(iter(version_cols))].isNull()
        # a NULL component in the UPDATE's version makes u_ver > t_ver
        # NULL, so a matched update would silently NEVER apply — the
        # feed bug would freeze the row forever with no error.  Refuse
        # loudly instead (r8 review; the version is the exactly-once
        # ledger, an unversioned update has no place in it).
        u_ver_null = None
        u_ver_all_null = None
        for c in version_cols:
            n = F.col(f"_u_{c}").isNull()
            u_ver_null = n if u_ver_null is None else (u_ver_null | n)
            u_ver_all_null = (
                n if u_ver_all_null is None else (u_ver_all_null & n)
            )
        # the raise is gated on `matched` IN the condition: target-only
        # (keep) rows have every _u_* NULL by full-outer construction,
        # and CaseWhen only evaluates a branch value when its condition
        # holds — an ungated raise would fire on every keep row
        #
        # TARGET-side partial-NULL versions get the symmetric guard (r9
        # review): the operator itself can no longer create them (the
        # insert guard below), but an externally-materialized target —
        # or one written before that guard existed — can carry a row
        # whose version is half-set, and a matched update against it is
        # silently wrong EITHER way: head NULL → never_versioned → any
        # update (older included) overwrites; head set, tail NULL →
        # u_ver > t_ver is NULL → the row freezes forever.  Refuse
        # loudly; keep rows never reach a merge decision so they pass.
        t_ver_null = None
        t_ver_all_null = None
        for c in version_cols:
            n = target[c].isNull()
            t_ver_null = n if t_ver_null is None else (t_ver_null | n)
            t_ver_all_null = (
                n if t_ver_all_null is None else (t_ver_all_null & n)
            )
        # A row can be corrupt on BOTH sides at once (NULL update
        # component AND partially-NULL target version); a single-sided
        # error would mask the other defect and the operator would fix
        # the feed, re-run, and only then hit the target error (r9
        # advice).  Name both in one message so one repair pass covers
        # both; the two single-sided branches below stay as-is.
        newer = F.when(
            matched & u_ver_null & t_ver_null & ~t_ver_all_null,
            F.raise_error(
                F.lit(
                    "apply_upsert_versioned: a matched row is corrupt on "
                    "BOTH sides — the update carries a NULL version "
                    "component (fix the feed or filter such rows "
                    "upstream) AND the TARGET row carries a "
                    "PARTIALLY-NULL version (repair the target: all-NULL "
                    "to mark unversioned, or a complete version)"
                )
            ).cast("boolean"),
        ).when(
            matched & u_ver_null,
            F.raise_error(
                F.lit(
                    "apply_upsert_versioned: an update row carries a NULL "
                    "version component — it would silently never apply; "
                    "fix the feed or filter such rows upstream"
                )
            ).cast("boolean"),
        ).when(
            matched & t_ver_null & ~t_ver_all_null,
            F.raise_error(
                F.lit(
                    "apply_upsert_versioned: a TARGET row carries a "
                    "PARTIALLY-NULL version (some components set, some "
                    "NULL) — a matched update against it would silently "
                    "freeze or overwrite out of order; repair the target "
                    "(all-NULL to mark unversioned, or a complete version)"
                )
            ).cast("boolean"),
        ).otherwise(never_versioned | (u_ver > t_ver))
        # INSERT rows get the same feed-bug guard, asymmetrically (r8
        # advice): a FULLY-NULL version is legal on insert — it seeds a
        # never-versioned row exactly as the seeded-together contract
        # allows on first materialization — but a PARTIALLY-NULL one is
        # the same upstream bug as a NULL matched-update version, and
        # letting it seed a never_versioned row would hand the key to
        # whatever update arrives next, ordering included (the matched
        # guard would never see it).  Refuse loudly instead.
        insert_ok = F.when(
            insert & u_ver_null & ~u_ver_all_null,
            F.raise_error(
                F.lit(
                    "apply_upsert_versioned: an insert row carries a "
                    "PARTIALLY-NULL version (some components set, some "
                    "NULL) — it would seed a never-versioned row that "
                    "any later update, even an older one, overwrites; "
                    "fix the feed (all-NULL to seed unversioned, or a "
                    "complete version)"
                )
            ).cast("boolean"),
        ).otherwise(insert)
        # strict >: a redelivered (equal-version) update must NOT re-apply
        take_u = (matched & newer) | insert_ok
    else:
        take_u = matched | insert
    setlike = set(set_cols) | set(version_cols)
    out_cols = []
    for c in target.columns:
        if c in key_cols:
            expr = F.coalesce(target[c], F.col(f"_u_{c}"))
        elif c in setlike:
            expr = F.when(take_u, F.col(f"_u_{c}")).otherwise(target[c])
        elif c in insert_only_cols:
            expr = F.when(insert, F.col(f"_u_{c}")).otherwise(target[c])
        else:
            expr = target[c]
        out_cols.append(expr.alias(c))
    if op_col is not None:
        out_cols.append(
            F.when(matched, F.lit("update"))
            .when(insert, F.lit("insert"))
            .otherwise(F.lit("keep"))
            .alias(op_col)
        )
    return j.select(*out_cols)


def apply_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    set_cols: dict[str, str],
    insert_only_cols: dict[str, str] | None = None,
    op_col: str | None = "op",
) -> DataFrame:
    """Merge ``updates`` into ``target`` by key.

    - key in both        -> target row with ``set_cols`` overwritten
      (``{target_col: update_col}``) — UPDATE
    - key only in updates -> new row: keys + ``set_cols`` +
      ``insert_only_cols`` from the update, remaining target columns
      NULL — INSERT
    - key only in target  -> row unchanged — KEEP

    ``insert_only_cols`` seed columns for brand-new rows without
    touching them on updates (e.g. a display name carried by the feed).
    ``updates`` must be key-unique (one change per key per batch —
    enforce upstream with a deterministic latest-wins rank, never
    ``dropDuplicates`` whose survivor is partition-order dependent).
    ``op_col`` tags each output row update/insert/keep for audit; pass
    None to drop it.
    """
    return _merge_by_key(
        target, updates, key_cols, set_cols, insert_only_cols or {},
        version_cols={}, op_col=op_col,
    )


def apply_upsert_versioned(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    set_cols: dict[str, str],
    version_cols: dict[str, str],
    insert_only_cols: dict[str, str] | None = None,
) -> DataFrame:
    """:func:`apply_upsert` with a STRICTLY-NEWER version gate — the
    idempotent merge that turns at-least-once delivery into
    exactly-once effects.

    ``version_cols`` maps target version columns to their update-side
    sources (e.g. ``{"ver_ts": "ts", "ver_event_id": "event_id"}``);
    versions compare lexicographically in dict order.  An update
    applies only when its version is STRICTLY greater than the target
    row's (or the target row has never been versioned) — so a
    redelivered batch re-presents versions the target already holds
    and changes nothing, no matter how many times it arrives or in
    what order batches are applied: the final state is the max-version
    row per key, commutatively.

    The version columns must exist on the target (seed them NULL on
    first materialization) — they are the sink-side dedup ledger, the
    durable analogue of the reference's unused in-memory
    ``processedIds`` set (``Node.java:117``)."""
    return _merge_by_key(
        target, updates, key_cols, set_cols, insert_only_cols or {},
        version_cols=version_cols, op_col=None,
    )
