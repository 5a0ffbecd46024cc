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
fingerprint and forces a rebuild.  Input-data changes are the CALLER's
invalidation to signal (``force=True``) — same contract as any
secondary index.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import SparkSession

MANIFEST = "_manifest"


def params_fingerprint(params: dict[str, Any]) -> str:
    """Stable fingerprint of build parameters (json-serializable)."""
    return hashlib.md5(
        json.dumps(params, sort_keys=True, default=repr).encode()
    ).hexdigest()


def manifest_matches(spark: SparkSession, path: str, fingerprint: str) -> bool:
    """True iff a completed build with the same parameters sits at path."""
    try:
        rows = spark.read.text(f"{path}/{MANIFEST}").collect()
    except Exception:
        return False
    return len(rows) == 1 and rows[0][0] == fingerprint


def write_manifest(spark: SparkSession, path: str, fingerprint: str) -> None:
    """Commit marker: call LAST, after every index component is written."""
    spark.createDataFrame([(fingerprint,)], "value: string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/{MANIFEST}")
