"""Typed sources.

Replaces the reference's HyDFS scan plane — leader fetches a file, splits
it into line-balanced chunks, and ships them over TCP
(``Node.java:607-727``).  On Spark a file scan is already split,
scheduled, and pipelined; what we add is explicit schemas (no inference
pass over 100 TB) and the provenance-tagged line source that mirrors the
reference's tuple model ``uniqueId:chunkFileName,lineNumber,line``
(``Node.java:907-913``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_S = T.StructType
_F = T.StructField


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return _S([_F(n, t) for n, t in fields])


# Explicit schemas for the driver testdata (TESTDATA.md).  Explicit, not
# inferred: at 100 TB an inference pass is a full extra scan, and parquet
# footer merging across a million files is itself expensive.
SCHEMAS: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _s(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _s(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    # events.ts is TIMESTAMP(NANOS) parquet; Spark reads it as a nanos
    # long (spark.sql.legacy.parquet.nanosAsLong) and load_table converts
    # to TimestampType via integer microseconds — lossless (the fixture
    # has no sub-microsecond components) and identical to DuckDB's
    # ns->us truncation.
    "events": _s(
        ("event_id", T.LongType()),
        ("ts", T.LongType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _s(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _s(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}


# The reference's single hard-coded schema: a 19-element string array at
# ``Node.java:113-115`` resolving names to CSV ordinals.  Here it is a
# real typed StructType; the reference treats every field as string and
# mis-parses quoted commas with a naive split (``Operators.java:174``) —
# Spark's CSV reader parses quotes correctly (intended divergence, see
# SURVEY.md §7.4).
TRAFFIC_SIGNS_SCHEMA = _s(
    ("X", T.DoubleType()),
    ("Y", T.DoubleType()),
    ("OBJECTID", T.LongType()),
    ("Sign_Type", T.StringType()),
    ("Size_", T.StringType()),
    ("Supplement", T.StringType()),
    ("Sign_Post", T.StringType()),
    ("Year_Insta", T.StringType()),
    ("Category", T.StringType()),
    ("Notes", T.StringType()),
    ("MUTCD", T.StringType()),
    ("Ownership", T.StringType()),
    ("FACILITYID", T.LongType()),
    ("Schools", T.StringType()),
    ("Location_Adjusted", T.StringType()),
    ("Replacement_Zone", T.StringType()),
    ("Sign_Text", T.StringType()),
    ("Set_ID", T.LongType()),
    ("FieldVerifiedDate", T.StringType()),
)


#: columns stored as nanosecond-long that load_table converts back to
#: TimestampType (integer path: nanos div 1000 -> timestamp_micros)
NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-testdata table with its explicit schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for c in NANO_TS_COLS.get(name, ()):
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def read_traffic_signs_csv(spark: SparkSession, path: str) -> DataFrame:
    """Quote-correct CSV read of the reference's Traffic_Signs dataset
    (``file_system/data_storage/local_file/traffic_signs.csv``)."""
    return spark.read.csv(path, header=True, schema=TRAFFIC_SIGNS_SCHEMA, quote='"', escape='"')


def read_text_lines(spark: SparkSession, path: str, with_provenance: bool = True) -> DataFrame:
    """Line source mirroring the reference tuple model.

    The reference tags each line ``uniqueId:chunkFileName,lineNumber,line``
    (``Node.java:907-913``; per-chunk UUID at ``Node.java:775``).  Here:
    ``value`` plus provenance columns ``src_file`` / ``line_id`` / ``uid``.
    ``line_id`` is a partition-stable id (``monotonically_increasing_id``),
    unique and reproducible per file layout, not a dense per-file line
    number — dense numbering would force a global sort; the engine only
    needs uniqueness (dedup on retry) and provenance, never density.

    ``uid`` is DETERMINISTIC — ``md5(src_file:line_id)``, not ``uuid()``
    — so re-evaluating the plan (a second write job, a retried stage, a
    downstream audit query) yields the SAME ids: the property that makes
    a results sink and a provenance sink written from one frame actually
    cross-reference, and that makes dedup-on-retry idempotent.
    """
    df = spark.read.text(path)
    if not with_provenance:
        return df
    df = df.select(
        F.col("value"),
        F.input_file_name().alias("src_file"),
        F.monotonically_increasing_id().alias("line_id"),
    )
    return df.withColumn(
        "uid", F.md5(F.concat_ws(":", F.col("src_file"), F.col("line_id")))
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """JSON-lines ingest with an explicit schema — the de-facto wire
    format of training-data pipelines.

    Scale posture: the schema is REQUIRED (inference is a full extra
    pass over 100 TB), and malformed lines land in ``corrupt_col``
    (PERMISSIVE mode) instead of failing the job — callers split the
    frame on ``corrupt_col IS NULL`` to route rejects to a quarantine
    sink.  JSONL splits by newline, so unlike multi-line JSON it
    parallelizes per-block like text.
    """
    # build a NEW StructType — StructType.add mutates the caller's schema
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines egress (one object per line, partition-parallel)."""
    df.write.mode(mode).json(path)
