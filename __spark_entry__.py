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
    # round-8 head: the r7 VERDICT's #1 item — the 70 never-driver-
    # checked queries q123-q192 (cumulative r1-r7 coverage is 286/356:
    # q01-q122 and q193-q356 all have at least one green row).  They
    # lead so the ~50-query driver window yields maximal new evidence;
    # within the block, heavy/novel plans first (the two cap fixes
    # q141/q175, the grouped-pandas/graph/streaming/index family) so
    # the ~20 that slip to the r9 window are plain SQL shapes.
    #
    # 1. the r7 verdict's named risk set: the two queries whose scale
    #    contracts changed THIS round (q141 popularity cap, q175 probe
    #    cap — both re-verified hash-green locally after the change),
    #    then grouped-pandas / graph-fixpoint / LSH-calibration:
    "q141", "q175", "q172", "q144", "q128", "q181", "q186", "q165",
    # 2. BPE encode/effective-tokens + nucleus vocab (driver-side
    #    merge loops feeding codegen), multimodal decode paths:
    "q131", "q149", "q160", "q140", "q152", "q188",
    # 3. streaming/stateful (sliding WAU, PSI drift, bitmap DAU,
    #    native session windows):
    "q136", "q162", "q171", "q159",
    # 4. window/sketch/join-heavy analytics:
    "q123", "q124", "q126", "q125", "q127", "q129", "q132", "q133",
    "q139", "q142", "q143", "q145", "q146", "q147", "q148", "q150",
    "q151", "q153", "q154", "q155", "q156", "q158", "q161", "q163",
    "q164", "q166", "q168", "q173", "q174", "q182", "q192", "q190",
    # 5. r9 remainder (plain SQL shapes — unpivot, shares, ranks,
    #    profiles; these 20 head the r9 window if the r8 window cuts
    #    at ~50):
    "q130", "q134", "q135", "q137", "q138", "q157", "q167", "q169",
    "q170", "q176", "q177", "q178", "q179", "q180", "q183", "q184",
    "q185", "q187", "q189", "q191",
    # ---- everything below here has at least one green driver row ----
    # r7-verified (q340-q356, q90-q122)
    "q340", "q341", "q342", "q343", "q344", "q345", "q346", "q347",
    "q348", "q349", "q350", "q351", "q352", "q353", "q354", "q355", "q356",
    "q95", "q108", "q114", "q90", "q91", "q92", "q93", "q94",
    "q96", "q97", "q98", "q99", "q100", "q101", "q102", "q103", "q104",
    "q105", "q106", "q107", "q109", "q110", "q111", "q112", "q113",
    "q115", "q116", "q117", "q118", "q119", "q120", "q121", "q122",
    # r6-verified (q232/q244, q289-q330 window, q333-q339)
    "q232", "q244",
    "q289", "q290",
    "q291", "q292", "q293", "q294", "q295", "q296", "q297", "q298", "q299", "q300", "q301", "q302", "q303", "q304", "q305", "q306", "q307", "q308", "q309", "q310", "q311", "q312", "q313", "q314", "q315", "q316", "q317", "q318", "q319", "q320", "q321", "q322", "q324", "q325", "q326", "q327", "q328", "q329", "q330",
    "q333", "q334", "q335", "q336", "q337", "q338", "q339",
    # r5-verified tail (q323/q331/q332 + q243-q288)
    "q323", "q331", "q332",
    "q243", "q245", "q246", "q247", "q248", "q249", "q250", "q251", "q252", "q253", "q254", "q255", "q256", "q257", "q258", "q259", "q260", "q261", "q262", "q263", "q264", "q265", "q266", "q267", "q268", "q269", "q270", "q271", "q272", "q273", "q274", "q275", "q276", "q277", "q278", "q279", "q280", "q281", "q282", "q283", "q284", "q285", "q286", "q287", "q288",
    # round-4 wave (driver-verified in r4)
    "q193", "q194", "q195", "q196", "q197", "q198", "q199", "q200", "q201", "q202", "q203", "q204", "q205", "q206", "q207", "q208", "q209", "q210", "q211", "q212", "q213", "q214", "q215", "q216", "q217", "q218", "q219", "q220", "q221", "q222", "q223", "q224", "q225", "q226", "q227", "q228", "q229", "q230", "q231", "q233", "q234", "q235", "q236", "q237", "q238", "q239", "q240", "q241", "q242",
    # round 3: rolling windows, CDC upsert (batch + streaming), LM
    # score, JSON extraction, chunking
    "q66", "q67", "q68", "q69", "q70", "q71", "q72", "q73", "q74", "q75",
    "q76", "q77", "q78", "q79", "q80", "q81", "q82", "q83", "q84", "q85", "q86", "q87", "q88", "q89",
    # event-time / ts-fed (all broke together in round 2)
    "q23", "q24", "q26", "q29", "q31", "q41", "q42", "q48", "q53", "q54", "q55",
    # newest families (first driver-verified in round 3)
    "q51", "q52", "q56", "q57", "q58", "q59", "q60", "q61", "q62", "q63",
    "q64", "q65",
    # streaming drains + rows-only contracts
    "q10", "q30", "q32", "q37", "q44", "q45",
    # dedup / similarity / retrieval / joins / rollups (q46 promoted:
    # its index build gained manifest-reuse in round 3, so it must sit
    # inside the driver window with the other index queries)
    "q46", "q13", "q14", "q15", "q16", "q17", "q18", "q22", "q25", "q28",
    "q33", "q34", "q35", "q36", "q38", "q39", "q40", "q43", "q47", "q49",
    "q50",
    # stable single-operator core
    "q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09", "q11",
    "q12", "q19", "q20", "q21", "q27",
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
