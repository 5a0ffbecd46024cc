"""Declared query inventory (SURVEY.md §2.6) with DuckDB oracles.

Each query is registered as ``(name, spark_fn, oracle_sql)``:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine under test.
- ``oracle_sql`` — ANSI SQL DuckDB runs over the same parquet tables
  (pre-registered views: region nation customer supplier part orders
  lineitem events documents embeddings).  ``None`` marks queries whose
  semantics are not SQL-expressible (driver then does a rows-only check).

Determinism rules: every float that reaches the output is ROUND()ed
identically on both sides; every aggregate/computed column is aliased to
the same name on both sides (the driver sorts columns by name and
hash-compares values); timestamps are reduced to epoch integers; DuckDB
integer sums are cast back to BIGINT (DuckDB widens SUM to HUGEINT).

q01–q10 are the reference-derived surface (SURVEY.md §2.2's operators
O1–O10 / E1–E4); q11+ are the north-star extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.textfn import tokenize
from .functions.vectors import cosine_similarity
from .operators import core
from .operators.parser import create_operator
from .sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# --------------------------------------------------------------------------
# Reference surface: O1-O10 (SURVEY.md §2.2)
# --------------------------------------------------------------------------


@register(
    "q01_filter_contains",
    "SELECT doc_id, text FROM documents WHERE contains(lower(text), 'stream')",
)
def q01_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 FILTER — case-insensitive substring (``Operators.java:121-144``)."""
    docs = load_table(spark, sf_dir, "documents")
    return core.filter_contains("stream", col="text")(docs).select("doc_id", "text")


@register(
    "q02_column_filter_eq",
    "SELECT event_id, user_id, event_type, value FROM events "
    "WHERE trim(event_type) = 'click'",
)
def q02_column_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 COLUMN_FILTER — trimmed equality on a named column
    (``Operators.java:258-277``)."""
    ev = load_table(spark, sf_dir, "events")
    return core.column_filter("event_type", "click")(ev).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "q03_filter_project",
    "SELECT doc_id, lang, n_chars FROM documents WHERE contains(lower(text), 'join')",
)
def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1→O7 — the reference's classic two-op demo (pattern filter then
    projection; ``Node.java:439-470``).  Catalyst prunes the scan to the
    three projected columns + the filter column."""
    docs = load_table(spark, sf_dir, "documents")
    pipeline = core.pipe(
        core.filter_contains("join", col="text"),
        core.select_columns("doc_id", "lang", "n_chars"),
    )
    return pipeline(docs)


@register(
    "q04_filter_count",
    "SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM events WHERE trim(event_type) = 'purchase'",
)
def q04_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2→O9 — demo 2 of the reference (equality filter → running count,
    ``Node.java:475-477``); here the exact batch count."""
    ev = load_table(spark, sf_dir, "events")
    pipeline = core.pipe(
        core.column_filter("event_type", "purchase"),
        core.aggregate("count", alias="cnt"),
    )
    return pipeline(ev)


@register(
    "q05_transform_case",
    "SELECT doc_id, upper(lang) AS lang_up, lower(source) AS src_low, "
    "CAST(length(trim(text)) AS BIGINT) AS text_len FROM documents",
)
def q05_transform_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O4/O5 TRANSFORM — uppercase / lowercase / trim
    (``Operators.java:159-164``)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("src_low"),
        F.length(F.trim(F.col("text"))).cast("long").alias("text_len"),
    )


@register(
    "q06_word_count",
    "SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ("
    "  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents"
    ") t WHERE word <> '' GROUP BY word",
)
def q06_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6→O9 — splitintowords as a true flatMap, then keyed count (the
    honest version of ``Operators.java:165-167``'s newline-join)."""
    docs = load_table(spark, sf_dir, "documents")
    pipeline = core.pipe(
        core.transform_lower(col="text"),
        core.split_into_words(col="text", out="word"),
        core.aggregate("count", keys=("word",), alias="cnt"),
    )
    return pipeline(docs.select("text"))


@register(
    "q07_fused_filter_transform",
    "SELECT doc_id, upper(text) AS text_upper FROM documents "
    "WHERE contains(lower(text), 'data')",
)
def q07_fused_filter_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 FILTERED_TRANSFORM — fused filter+map (``Operators.java:48-54``);
    Catalyst fuses via whole-stage codegen, no manual pairing."""
    docs = load_table(spark, sf_dir, "documents")
    fused = core.filtered_transform("data", core.transform_upper(col="text"), col="text")
    return fused(docs).select("doc_id", F.col("text").alias("text_upper"))


@register(
    "q08_grouped_agg",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q08_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 generalized — the advertised-but-unbuilt
    ``AGGREGATE:function:field`` (``RainStorm.java:888-891``) done right:
    keyed sum/avg/count in one pass (TPC-H Q1 shape).  Map-side partial
    aggregation means the shuffle carries one row per (flag, status) per
    partition — at 100 TB the exchange is a few KB."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q09_chained_pipeline",
    "SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem "
    "WHERE trim(l_linestatus) = 'F' GROUP BY l_returnflag",
)
def q09_chained_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 — operator chaining through the string-command parser (parity
    with ``RAINSTORM op1 op2``, ``Node.java:281-353``), composed as one
    lazy plan instead of materializing op1's output file
    (``Node.java:1106-1160``)."""
    li = load_table(spark, sf_dir, "lineitem")
    pipeline = core.pipe(
        create_operator("COLUMN_FILTER:l_linestatus:F"),
        create_operator("AGGREGATE:sum:l_quantity:by=l_returnflag"),
    )
    out = pipeline(li)
    return out.select("l_returnflag", F.round("sum_l_quantity", 2).alias("sum_qty"))


@register(
    "q10_stream_running_count",
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY event_type",
)
def q10_stream_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2/O9/E4 — the streaming running count, as Structured Streaming.

    The reference streams tuples stage-1→stage-2 with ACK+5s-retry
    at-least-once delivery and a task-local count that can overcount on
    retry (``Node.java:915-1046``, unused dedup ``Node.java:117``).  Here:
    a file-source stream, checkpointed stateful aggregation, exactly-once
    counts; Trigger.AvailableNow drains the source then stops, and the
    final state must equal the batch answer (the oracle)."""
    from .streaming.runner import stream_grouped_counts

    return stream_grouped_counts(spark, sf_dir)


# --------------------------------------------------------------------------
# North-star extensions: dedup / text / similarity / joins (q11+)
# --------------------------------------------------------------------------


@register(
    "q11_dedup_exact",
    "SELECT user_id, event_type, MIN(event_id) AS first_event_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_dups FROM events GROUP BY user_id, event_type",
)
def q11_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a deterministic keep-rule (min id per key).

    Implemented as hash-aggregate, not ``dropDuplicates`` — the keep-rule
    makes the survivor deterministic (dropDuplicates keeps an arbitrary
    row) and the aggregate form carries the duplicate count for free.
    One shuffle on the dedup key; map-side combine shrinks it."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_dups"),
    )


_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")


@register(
    "q12_text_topk_terms",
    f"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents
    ) t
    WHERE word <> '' AND word NOT IN {_STOPWORDS!r}
    GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 25
    """,
)
def q12_text_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: tokenize → stopword filter → global top-k terms.
    Deterministic total order (count desc, word asc).  The partial
    aggregation + single-reducer top-k is the scalable shape: the sort
    input is |vocab|, not |tokens|."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .filter(~F.col("word").isin(*_STOPWORDS))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(25)
    )


@register(
    "q13_knn_cosine",
    """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    terms AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[s.i] AS DOUBLE) * CAST(q.embedding[s.i] AS DOUBLE)) AS dp,
             SUM(CAST(e.embedding[s.i] AS DOUBLE) * CAST(e.embedding[s.i] AS DOUBLE)) AS na2,
             SUM(CAST(q.embedding[s.i] AS DOUBLE) * CAST(q.embedding[s.i] AS DOUBLE)) AS nb2
      FROM embeddings e CROSS JOIN q CROSS JOIN generate_series(1, 64) s(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    )
    SELECT vec_id, ROUND(dp / (sqrt(na2) * sqrt(nb2)), 6) AS cos_sim
    FROM terms ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
)
def q13_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force cosine top-k vs a fixed query vector
    (the embedding of vec_id=0).

    The scan side stays JVM-only (zip_with/aggregate — no Python, no
    Arrow hop); the query vector is a broadcast literal.  Scores are
    rounded to 6dp *before* the ordering so the top-k set is
    deterministic.  At 100 TB this is the exact-baseline path; the
    LSH-bucketed variant (similarity module) is the sub-linear one."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), qlit), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "q14_multimodal_join",
    """
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_events, ROUND(SUM(e.value), 2) AS sum_value
    FROM documents d JOIN events e ON e.user_id = d.doc_id
    WHERE d.n_chars > 100
    GROUP BY d.lang
    """,
)
def q14_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents (dimension) joined to the events fact table with a
    pushed-down length predicate.  The documents side is explicitly
    broadcast: at 100 TB the fact table never shuffles for a dimension
    join — the build side ships to every executor instead."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 100)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(docs), ev.user_id == docs.doc_id)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return QUERIES[name](spark, sf_dir)
