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

# The driver's correctness run covers a bounded window of queries() (50
# in round 2), so ordering is coverage policy: riskiest first.  Event-
# time queries (the round-2 regression class), streaming drains, and
# the newest operators lead; the trivially-stable single-operator core
# (q01-q09 etc.) trails, covered every run by tests/ and the committed
# scripts/local_correctness.py artifact.
_RISK_ORDER = [
    # round-9 head (r8 VERDICT item 1): the 20 never-driver-checked
    # plain-SQL leftovers from the q123-q192 block lead at ranks 1-20 so
    # the ~50-query driver window closes cumulative coverage at 356/356.
    "q130", "q134", "q135", "q137", "q138", "q157", "q167", "q169",
    "q170", "q176", "q177", "q178", "q179", "q180", "q183", "q184",
    "q185", "q187", "q189", "q191",
    # ranks 21-50 (r8 VERDICT item 3): rows whose code changed since
    # their last green driver row -- the r8 hardening + this round's
    # ADVICE fixes touched cdc (q67/q69 upsert, q163), dedup
    # basket-stats (q141), streaming runner dir-staging/ledger
    # (q30/q10/q37), samplers (q49-q85), salted agg/join (q75/q82),
    # graph (q56/q83 fixpoints; q342 also the outlier under diagnosis),
    # the q236/q266 shared shingle lineage cuts, catalog merge
    # (q73/q164/q161), and sketches/bloom (q101/q105/q127).  Ordered
    # this-round's-changes first, oldest green row next, r8-greens last.
    "q67", "q69", "q141", "q30", "q10", "q37",
    # session-3 operator hardening (k-means vector masking, packing
    # token guards, bpe/range-join collision refusals) touched the
    # code under these four after their last green driver row
    "q98", "q40", "q131", "q149",
    "q49", "q58",
    "q63", "q64", "q50", "q57", "q61", "q62", "q65", "q85",
    "q75", "q82", "q56", "q83", "q236", "q266", "q73", "q101",
    "q105", "q342", "q163", "q164", "q161", "q127",
    # ---- everything below here has a green driver row at code that
    # ---- is unchanged or strictly hardened since; relative order kept
    "q175", "q172", "q144", "q128", "q181", "q186", "q165", 
    "q160", "q140", "q152", "q188", "q136", "q162", "q171",
    "q159", "q123", "q124", "q126", "q125", "q129", "q132", "q133",
    "q139", "q142", "q143", "q145", "q146", "q147", "q148", "q150",
    "q151", "q153", "q154", "q155", "q156", "q158", "q166", "q168",
    "q173", "q174", "q182", "q192", "q190", "q340", "q341", "q343",
    "q344", "q345", "q346", "q347", "q348", "q349", "q350", "q351",
    "q352", "q353", "q354", "q355", "q356", "q95", "q108", "q114",
    "q90", "q91", "q92", "q93", "q94", "q96", "q97", 
    "q99", "q100", "q102", "q103", "q104", "q106", "q107", "q109",
    "q110", "q111", "q112", "q113", "q115", "q116", "q117", "q118",
    "q119", "q120", "q121", "q122", "q232", "q244", "q289", "q290",
    "q291", "q292", "q293", "q294", "q295", "q296", "q297", "q298",
    "q299", "q300", "q301", "q302", "q303", "q304", "q305", "q306",
    "q307", "q308", "q309", "q310", "q311", "q312", "q313", "q314",
    "q315", "q316", "q317", "q318", "q319", "q320", "q321", "q322",
    "q324", "q325", "q326", "q327", "q328", "q329", "q330", "q333",
    "q334", "q335", "q336", "q337", "q338", "q339", "q323", "q331",
    "q332", "q243", "q245", "q246", "q247", "q248", "q249", "q250",
    "q251", "q252", "q253", "q254", "q255", "q256", "q257", "q258",
    "q259", "q260", "q261", "q262", "q263", "q264", "q265", "q267",
    "q268", "q269", "q270", "q271", "q272", "q273", "q274", "q275",
    "q276", "q277", "q278", "q279", "q280", "q281", "q282", "q283",
    "q284", "q285", "q286", "q287", "q288", "q193", "q194", "q195",
    "q196", "q197", "q198", "q199", "q200", "q201", "q202", "q203",
    "q204", "q205", "q206", "q207", "q208", "q209", "q210", "q211",
    "q212", "q213", "q214", "q215", "q216", "q217", "q218", "q219",
    "q220", "q221", "q222", "q223", "q224", "q225", "q226", "q227",
    "q228", "q229", "q230", "q231", "q233", "q234", "q235", "q237",
    "q238", "q239", "q240", "q241", "q242", "q66", "q68", "q70",
    "q71", "q72", "q74", "q76", "q77", "q78", "q79", "q80",
    "q81", "q84", "q86", "q87", "q88", "q89", "q23", "q24",
    "q26", "q29", "q31", "q41", "q42", "q48", "q53", "q54",
    "q55", "q51", "q52", "q59", "q60", "q32", "q44", "q45",
    "q46", "q13", "q14", "q15", "q16", "q17", "q18", "q22",
    "q25", "q28", "q33", "q34", "q35", "q36", "q38", "q39",
    "q43", "q47", "q01", "q02", "q03", "q04", "q05",
    "q06", "q07", "q08", "q09", "q11", "q12", "q19", "q20",
    "q21", "q27",
]


def _ordered(d: dict) -> dict:
    by_prefix = {name.split("_", 1)[0]: name for name in QUERIES}
    order = [by_prefix[p] for p in _RISK_ORDER if p in by_prefix]
    assert len(order) == len(QUERIES), "every query must appear in _RISK_ORDER"
    return {name: d[name] for name in order if name in d}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q08_grouped_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    absent here get the driver's weaker rows-only check."""
    return _ordered(ORACLE)
