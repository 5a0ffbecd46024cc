"""Build-once/probe-many support for materialized indexes.

An index build (IVF cells, BM25 postings) is a batch job whose output
outlives the query that triggered it.  These helpers make builds
IDEMPOTENT: a one-line manifest, written only after every index
component committed, records a fingerprint of the build parameters;
a matching manifest lets the next caller skip straight to the probe.

The manifest rides the same storage as the index (written/read through
Spark, i.e. the Hadoop FS API), so the pattern holds on HDFS/S3 exactly
as on a local tempdir.  A partial build (crash between component
writes) leaves no manifest and is rebuilt from scratch; a parameter
change (different codebook, shard count, tokenizer) changes the
fingerprint and forces a rebuild.  Input-data changes are detected
CHEAPLY when the builder is given its source path: a metadata
fingerprint (file count + bytes + max mtime, :func:`data_fingerprint`)
rides inside the params fingerprint, so a rewritten/regrown source
invalidates the manifest automatically.  ``force=True`` remains the
explicit override (and the only recourse for an in-place byte flip
that preserves size and mtime, which no metadata check can see).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import SparkSession

MANIFEST = "_manifest"


def params_fingerprint(params: dict[str, Any]) -> str:
    """Stable fingerprint of build parameters.

    Params must be json-serializable: a ``default=repr`` fallback would
    turn an object param (compiled regex, tokenizer instance) into a
    memory-address repr that changes every process — the manifest would
    never match and every call would silently trigger a full rebuild
    (r7 review).  Refusing loudly keeps build-once/probe-many honest."""
    try:
        blob = json.dumps(params, sort_keys=True)
    except TypeError as e:
        raise TypeError(
            f"index build params must be json-serializable for a stable "
            f"fingerprint; got {e} — pass primitive values (a repr "
            "fallback would change per process and defeat idempotence)"
        ) from None
    return hashlib.md5(blob.encode()).hexdigest()


def data_fingerprint(spark: SparkSession, source_path: str) -> dict[str, int]:
    """Cheap metadata fingerprint of a source dataset — NO data scan.

    Recursive FS listing: file count, total bytes, max modification
    time.  Goes through the Hadoop FS API so the same check works on
    HDFS/S3 as on the local driver testdata.  Fold the result into the
    params dict passed to :func:`params_fingerprint` so dependent index
    manifests go stale the moment the source is rewritten.  The walk
    itself lives in :mod:`sources.fsmeta` (shared with the parquet
    ts-unit sniff's staleness keying)."""
    from ..sources.fsmeta import hadoop_tree_stats

    return hadoop_tree_stats(spark, source_path)


def source_params(spark: SparkSession, source_path: str | None) -> dict[str, Any]:
    """``{"data": fingerprint}`` when a source path is known, else ``{}``
    — the one-liner builders merge into their params dict."""
    if source_path is None:
        return {}
    return {"data": data_fingerprint(spark, source_path)}


def manifest_matches(spark: SparkSession, path: str, fingerprint: str) -> bool:
    """True iff a completed build with the same parameters sits at path.

    Only the missing-manifest case (AnalysisException: no such path —
    i.e. no completed build) maps to False; a transient read error
    propagates rather than silently forcing a full index rebuild."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.text(f"{path}/{MANIFEST}").collect()
    except AnalysisException:
        return False
    return len(rows) == 1 and rows[0][0] == fingerprint


def write_manifest(spark: SparkSession, path: str, fingerprint: str) -> None:
    """Commit marker: call LAST, after every index component is written."""
    spark.createDataFrame([(fingerprint,)], "value: string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/{MANIFEST}")


def invalidate_manifest(spark: SparkSession, path: str) -> None:
    """Call FIRST, before a rebuild overwrites any index component.

    The "a partial build leaves no manifest" contract is only true for
    FIRST builds: a rebuild that crashes after overwriting some
    components but before :func:`write_manifest` would leave the OLD
    manifest validating a mixed-generation index — e.g. new-modulus
    postings probed with the surviving old shard params, silently
    wrong results (r7 review).  Deleting the manifest up front restores
    the invariant: any crash during the rebuild leaves a manifest-less
    index that the next build rebuilds from scratch."""
    from ..sources.fsmeta import fs_and_path

    fs, p = fs_and_path(spark, f"{path}/{MANIFEST}")
    if fs.exists(p):
        fs.delete(p, True)
