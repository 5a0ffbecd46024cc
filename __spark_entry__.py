"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (q08 grouped aggregates, the TPC-H Q1
shape that generalizes the reference's advertised-but-unbuilt
``AGGREGATE:function:field``) on sf0.001.

``queries()`` / ``oracle_sql()`` — the full declared inventory from
SURVEY.md §2.6, implemented in
:mod:`real_time_stream_processing_engine_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_stream_processing_engine_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q08_grouped_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    absent here get the driver's weaker rows-only check."""
    return dict(ORACLE)
