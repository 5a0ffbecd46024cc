"""Unit tests for the RAINSTORM parity surface: quote-aware lexer,
string→operator factory, pipeline composition, and the end-to-end
``run_command`` path (SURVEY.md §2.2, §3.1)."""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.operators import core
from real_time_stream_processing_engine_spark.operators.parser import (
    create_operator,
    parse_command,
    parse_operation_string,
    run_command,
)


def test_lexer_quote_awareness():
    # parity with Node.java:355-382: quotes glue tokens, are retained
    toks = parse_operation_string('RAINSTORM "FILTER:Punched Telespar" op2 f.txt 3')
    assert toks == ["RAINSTORM", '"FILTER:Punched Telespar"', "op2", "f.txt", "3"]


def test_lexer_plain_whitespace():
    assert parse_operation_string("  a  b\tc ") == ["a", "b", "c"]


def _lines(spark, *rows: str):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_filter_contains_case_insensitive(spark):
    df = _lines(spark, "Hello World", "nothing", "say HELLO")
    out = create_operator('FILTER:"hello"')(df)
    assert sorted(r.value for r in out.collect()) == ["Hello World", "say HELLO"]


def test_column_filter_trims_and_matches(spark):
    df = spark.createDataFrame([("  x  ", 1), ("y", 2)], "k string, v int")
    out = create_operator("COLUMN_FILTER:k:x")(df)
    assert [r.v for r in out.collect()] == [1]


def test_transform_shapes(spark):
    df = _lines(spark, "  MiXed Case  ")
    assert create_operator("TRANSFORM:uppercase")(df).head().value == "  MIXED CASE  "
    assert create_operator("TRANSFORM:lowercase")(df).head().value == "  mixed case  "
    assert create_operator("TRANSFORM:trim")(df).head().value == "MiXed Case"


def test_split_into_words_is_flatmap(spark):
    df = _lines(spark, "a b  c", "d")
    out = create_operator("TRANSFORM:splitintowords")(df)
    assert sorted(r.word for r in out.collect()) == ["a", "b", "c", "d"]


def test_select_projection(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "x int, y string, z double")
    out = create_operator("TRANSFORM:select:x, z")(df)
    assert out.columns == ["x", "z"]


def test_filtered_transform_fuses(spark):
    df = _lines(spark, "keep me", "drop")
    out = create_operator("FILTERED_TRANSFORM:keep:uppercase")(df)
    assert [r.value for r in out.collect()] == ["KEEP ME"]


def test_aggregate_default_running_count(spark):
    df = _lines(spark, "a", "b", "c")
    out = create_operator("AGGREGATE")(df)
    assert out.collect()[0]["count"] == 3


def test_aggregate_generalized_keyed(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 5)], "k string, v int"
    )
    out = create_operator("AGGREGATE:sum:v:by=k")(df)
    assert {r.k: r.sum_v for r in out.collect()} == {"a": 4, "b": 5}


def test_unknown_transform_rejected():
    # parity with Node.java:461-464
    with pytest.raises(ValueError, match="unknown transform"):
        create_operator("TRANSFORM:rot13")


def test_unknown_kind_rejected():
    with pytest.raises(ValueError, match="unknown operator kind"):
        create_operator("EXPLODE:x")


def test_unresolvable_column_rejected_by_analyzer(spark):
    # parity with Node.java:432-434: unknown names are errors, not noise
    df = spark.createDataFrame([("a",)], "k string")
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        create_operator("COLUMN_FILTER:nope:x")(df).collect()


def test_parse_command_multi_operator():
    cmd = parse_command('RAINSTORM "FILTER:x" "TRANSFORM:trim" AGGREGATE data.txt 4')
    assert len(cmd.operators) == 3
    assert cmd.input_file == "data.txt"
    assert cmd.num_tasks == 4


def test_parse_command_requires_rainstorm_verb():
    with pytest.raises(ValueError, match="must start with RAINSTORM"):
        parse_command("STORM op f 1")


def test_run_command_end_to_end(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha beta\nALPHA only\nnope\n")
    out = run_command(spark, f'RAINSTORM "FILTER:alpha" "TRANSFORM:uppercase" {p} 2')
    assert sorted(r.value for r in out.collect()) == ["ALPHA BETA", "ALPHA ONLY"]


def test_pipeline_composition_equals_sequential(spark):
    df = _lines(spark, "x 1", "x 2", "y 3")
    p1 = create_operator("FILTER:x")
    p2 = create_operator("TRANSFORM:uppercase")
    composed = core.pipe(p1, p2)(df)
    sequential = p2(p1(df))
    assert composed.collect() == sequential.collect()
