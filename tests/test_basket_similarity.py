"""basket_similarity: exact Jaccard, hot-item cap semantics, and
non-silent drop accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.dedup import (
    basket_similarity,
)


def _items(spark, pairs):
    return spark.createDataFrame(pairs, "entity long, item long")


def test_exact_jaccard(spark):
    # e1={1,2,3}, e2={2,3,4}, e3={9}
    df = _items(spark, [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (2, 4), (3, 9)])
    got = {(r.a, r.b): (r.n_common, r.jaccard_ppm)
           for r in basket_similarity(df, min_common=1).collect()}
    assert got == {(1, 2): (2, 500000)}  # |∩|=2, |∪|=4


def test_hot_item_capped_with_accounting(spark):
    # item 100 is in EVERY basket (the quadratic hazard); cap drops it
    hot = [(e, 100) for e in range(1, 11)]
    cold = [(1, 1), (1, 2), (2, 1), (2, 2)]
    df = _items(spark, hot + cold)
    res = basket_similarity(df, min_common=1, max_item_popularity=5)
    rows = {(r.a, r.b): (r.n_common, r.jaccard_ppm) for r in res.collect()}
    # only the cold items pair; sizes computed AFTER the cap (sets {1,2})
    assert rows == {(1, 2): (2, 1000000)}
    audit = res.popularity_overflow.collect()[0]
    assert audit.items_dropped == 1 and audit.max_popularity == 10


def test_uncapped_hot_item_pairs_everyone(spark):
    hot = [(e, 100) for e in range(1, 11)]
    df = _items(spark, hot)
    assert basket_similarity(df, min_common=1).count() == 45  # C(10,2)
