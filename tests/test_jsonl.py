"""JSONL source: explicit schema, corrupt-record quarantine, round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_stream_processing_engine_spark.sources.readers import (
    load_table,
    read_jsonl,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p)
    # corrupt-column-only queries on raw JSON scans are disallowed;
    # Spark's documented pattern is to cache the parsed frame first
    back = read_jsonl(spark, p, SCHEMA).cache()
    assert back.filter(F.col("_corrupt").isNotNull()).count() == 0
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.drop("_corrupt").collect()}
    assert a == b


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "n_chars": 10}\n'
        "this is not json\n"
        '{"doc_id": 2, "lang": "de", "n_chars": 20}\n'
        '{"doc_id": "NaN-ish", "lang": "fr"}\n'
    )
    df = read_jsonl(spark, str(p), SCHEMA).cache()
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert good.count() == 2
    assert bad.count() == 2
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
