"""Every registered query with an oracle must hash-match DuckDB on the
smoke-scale data (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from real_time_stream_processing_engine_spark.queries import ORACLE, QUERIES

from .oracle import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLE:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    result = compare(df, con, ORACLE[name])
    assert result["ok"], result
