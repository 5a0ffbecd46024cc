"""Physical-plan regression tests.

PLANS.md documents the plan shapes each operator family must keep to
survive a 100x scale-up; these tests pin the load-bearing properties so
a refactor can't silently regress them.  No data is collected — each
test only renders ``explain("formatted")``.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from real_time_stream_processing_engine_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _count(plan: str, op: str) -> int:
    return len(re.findall(rf"^\s*\(\d+\) {re.escape(op)}\b", plan, re.M))


def test_star_join_broadcasts_all_dimensions(spark, sf_dir):
    """q33: customer/nation/region broadcast; the orders fact table is
    never exchanged for a join — its only shuffle is the rollup agg."""
    plan = _plan(spark, sf_dir, "q33_star_rollup")
    assert _count(plan, "BroadcastHashJoin") == 3
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "Exchange") == 1  # the aggregate only


def test_grouped_agg_pushes_filter_to_scan(spark, sf_dir):
    """q08: the shipdate predicate must reach the parquet reader."""
    plan = _plan(spark, sf_dir, "q08_grouped_agg")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), plan


def test_grouped_agg_partial_aggregation(spark, sf_dir):
    """q08: map-side combine — HashAggregate below AND above the
    exchange, so the shuffle carries one row per key per task."""
    plan = _plan(spark, sf_dir, "q08_grouped_agg")
    assert _count(plan, "HashAggregate") == 2
    assert _count(plan, "Exchange") == 1


def test_column_pruning_reaches_scan(spark, sf_dir):
    """q04: a count over one filtered column reads ONLY that column."""
    plan = _plan(spark, sf_dir, "q04_filter_count")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "l_comment" not in cols and len(cols) <= 2, cols


def test_topk_per_group_limits_below_exchange(spark, sf_dir):
    """q25: WindowGroupLimit runs map-side, so the shuffle carries at
    most k rows per group per task instead of every row."""
    plan = _plan(spark, sf_dir, "q25_topk_per_group")
    assert "WindowGroupLimit" in plan, plan


def test_knn_avoids_global_sort(spark, sf_dir):
    """q13: top-k by score is TakeOrderedAndProject (per-partition
    heaps merged on the driver), never a full Sort + Limit."""
    plan = _plan(spark, sf_dir, "q13_knn_cosine")
    assert "TakeOrderedAndProject" in plan, plan


def test_simhash_single_aggregate_pass(spark, sf_dir):
    """q38: one token explode feeding one partial-aggregated exchange —
    the shuffle payload is vote counters per doc, not tokens.  The
    second exchange is the r12 scan fan-out (round-robin repartition of
    the raw docs: local single-row-group files scan as ONE split, so
    without it the explode+md5 chain runs on one core); at scale the
    fan-out is conditional and absent, leaving the single agg exchange."""
    plan = _plan(spark, sf_dir, "q38_simhash_signatures")
    assert _count(plan, "Generate") == 1
    assert _count(plan, "Exchange") == 2  # fan-out + the aggregate
    assert "REPARTITION_BY_NUM" in plan
    assert _count(plan, "HashAggregate") == 2


def test_simhash_pairs_single_scan(spark, sf_dir):
    """q39: bucket-pairs shape — the corpus is scanned ONCE (a signature
    self-join would re-execute the scan+explode+aggregate per side)."""
    plan = _plan(spark, sf_dir, "q39_simhash_neardup")
    assert _count(plan, "Scan parquet") == 1


def test_stratified_sample_limits_below_exchange(spark, sf_dir):
    """q49: the per-stratum rank<=k must push below the shuffle
    (WindowGroupLimit), like q25 — the sample never shuffles more than
    k rows per stratum per task."""
    plan = _plan(spark, sf_dir, "q49_stratified_sample")
    assert "WindowGroupLimit" in plan, plan


def test_bernoulli_sample_is_scan_side_filter(spark, sf_dir):
    """q50: membership is a pure filter over the scan — no exchange, no
    window, nothing stateful."""
    plan = _plan(spark, sf_dir, "q50_bernoulli_sample")
    assert _count(plan, "Exchange") == 0, plan


def test_general_asof_single_exchange_no_join(spark, sf_dir):
    """q48: union-sort-carry — ONE exchange of |left|+|right| on the
    key, a window carry, and NO join operator of any kind."""
    plan = _plan(spark, sf_dir, "q48_asof_tolerance")
    assert _count(plan, "Exchange") == 1, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"):
        assert _count(plan, op) == 0, op


def test_hopping_window_single_partial_aggregated_exchange(spark, sf_dir):
    """q53: window assignment is map-side; the only exchange carries
    combined partials per (window, key)."""
    plan = _plan(spark, sf_dir, "q53_hopping_window")
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "HashAggregate") == 2


def test_decontamination_broadcasts_benchmark(spark, sf_dir):
    """q51: the benchmark gram set must broadcast — the corpus gram
    stream is never shuffled for the probe join."""
    plan = _plan(spark, sf_dir, "q51_decontamination")
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0


def test_bm25_two_scans_takeordered(spark, sf_dir):
    """q59: one no-explode corpus-stats pass + one postings pass (a
    dfreq-from-postings formulation re-tokenizes a 3rd time); top-k is
    TakeOrdered; stats broadcast, never sort-merge joined."""
    plan = _plan(spark, sf_dir, "q59_bm25_search")
    assert _count(plan, "Scan parquet") == 2
    assert "TakeOrderedAndProject" in plan
    assert _count(plan, "SortMergeJoin") == 0


def test_rp_lsh_pairs_single_scan_no_join(spark, sf_dir):
    """q47: banded sign-LSH is one scan + bucket-pairs — the L-band
    bucketing is a projection + explode, never a self-join, and the
    cosine verify runs inside the bucket expansion."""
    plan = _plan(spark, sf_dir, "q47_rp_lsh_neardup")
    assert _count(plan, "Scan parquet") == 1
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"):
        assert _count(plan, op) == 0, op


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """q40: the binned range join must hash-join on the bucket id —
    never the |L|x|R| BroadcastNestedLoopJoin a raw range predicate
    lowers to."""
    plan = _plan(spark, sf_dir, "q40_range_join")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_stream_enrich_broadcasts_dimension(spark, sf_dir):
    """q37's batch shape (q36 uses the same events scan): dimension
    joins against a stream must broadcast, never shuffle the stream."""
    plan = _plan(spark, sf_dir, "q36_set_ops")
    assert _count(plan, "BroadcastHashJoin") == 2
    assert _count(plan, "SortMergeJoin") == 0


@pytest.mark.parametrize(
    "name",
    ["q01_filter_contains", "q06_word_count", "q11_dedup_exact",
     "q15_minhash_signatures", "q19_lang_id", "q20_quality_score",
     "q21_token_stats", "q38_simhash_signatures"],
)
def test_no_python_udf_in_jvm_operators(spark, sf_dir, name):
    """Everything except the two declared Python boundaries (q27
    mapInPandas decode, q32 applyInPandasWithState) stays JVM-side."""
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan


def test_redaction_is_scan_side(spark, sf_dir):
    """q60: count-and-mask is ONE codegen projection riding the scan —
    no exchange, no UDF; redacting 100 TB costs one pass."""
    plan = _plan(spark, sf_dir, "q60_pii_redaction")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 0
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_packing_single_exchange_reused_by_rollup(spark, sf_dir):
    """q61: one hash exchange on (lang, shard) feeds the running-sum
    window AND the per-pack rollup — grouping keys (lang, shard,
    pack_id) are clustered by the window's partitioning, so Spark must
    not add a second exchange for the aggregate."""
    plan = _plan(spark, sf_dir, "q61_sequence_packing")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "Window") == 1


def test_bm25_index_probe_prunes_partitions(spark, sf_dir):
    """q62: the probe must read ONLY the query terms' shard partitions
    (partition pruning at the source listing) with the exact term
    filter pushed into the parquet scan; dfreq/stats broadcast, top-k
    is a TakeOrdered — probing cost is O(query-term postings), not
    O(corpus)."""
    plan = _plan(spark, sf_dir, "q62_bm25_indexed")
    assert re.search(r"PartitionFilters: \[shard#\d+ IN \(", plan)
    assert "In(term, [data,processing,stream])" in plan
    assert _count(plan, "SortMergeJoin") == 0
    assert "TakeOrderedAndProject" in plan


def test_mixture_sample_is_scan_side(spark, sf_dir):
    """q63: the data-mixing filter is one CASE-threshold compare riding
    the scan — zero exchanges; mixing 100 TB costs one pass."""
    plan = _plan(spark, sf_dir, "q63_mixture_sample")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 0


def test_epoch_upsampling_is_scan_side(spark, sf_dir):
    """q64: repetition is one Generate (explode of a CASE-built
    sequence) riding the scan — zero exchanges."""
    plan = _plan(spark, sf_dir, "q64_epoch_upsampling")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 0
    assert _count(plan, "Generate") == 1


def test_rolling_window_single_exchange(spark, sf_dir):
    """q66: the per-user RANGE frame is ONE exchange on user_id + one
    in-partition sort + one Window pass — no join, no second shuffle."""
    plan = _plan(spark, sf_dir, "q66_rolling_window")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "Window") == 1


def test_cdc_upsert_rank_limits_below_exchange(spark, sf_dir):
    """q67: the latest-wins rank runs as WindowGroupLimit below AND
    above its exchange (each task ships one candidate per user, not the
    whole feed), and the merge itself is a single sort-merge join —
    never the |T|x|U| nested loop a non-equi merge would lower to."""
    plan = _plan(spark, sf_dir, "q67_cdc_upsert")
    assert _count(plan, "WindowGroupLimit") == 2
    assert _count(plan, "SortMergeJoin") == 1
    assert _count(plan, "BroadcastNestedLoopJoin") == 0


def test_unigram_logprob_stays_jvm_side(spark, sf_dir):
    """q68: term-freq join broadcasts (the corpus token stream is never
    shuffled for the probe); the scalar total rides a 1-row broadcast;
    all aggregates are partial-aggregated; no Python in the plan."""
    plan = _plan(spark, sf_dir, "q68_unigram_logprob")
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_json_extract_stays_codegen(spark, sf_dir):
    """q70: from_json with an explicit schema parses inside codegen —
    one partial-aggregated exchange, no Python, no inference scan."""
    plan = _plan(spark, sf_dir, "q70_json_extract")
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "HashAggregate") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_doc_chunking_is_scan_side(spark, sf_dir):
    """q71: chunk explosion is ONE Generate riding the scan — zero
    exchanges; chunking 100 TB is one pass."""
    plan = _plan(spark, sf_dir, "q71_doc_chunking")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 0
    assert _count(plan, "Generate") == 1


def test_brand_nation_star_broadcasts_all_dims(spark, sf_dir):
    """q89: part/supplier/nation all broadcast — the lineitem fact is
    never exchanged for a join (same discipline as q33)."""
    plan = _plan(spark, sf_dir, "q89_brand_nation_revenue")
    assert _count(plan, "BroadcastHashJoin") >= 3
    assert _count(plan, "SortMergeJoin") == 0


def test_ivfpq_probe_never_reads_vectors(spark, sf_dir):
    """q87: the IVF-PQ probe partition-prunes to its cells AND its
    scan reads only (vec_id, pq_codes) — the embedding column never
    leaves storage, the byte-level win of storing codes in the index."""
    plan = _plan(spark, sf_dir, "q87_ivfpq_indexed")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "embedding" not in m.group(1), plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan


def test_time_partitioned_scan_prunes_days(spark, sf_dir):
    """q73: the date filter must be a PARTITION filter on the layout —
    pruned before any file opens, not a row filter over 30 days."""
    plan = _plan(spark, sf_dir, "q73_time_partitioned_scan")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pf is None or "event_date" not in pf.group(1), plan


def test_curation_pipeline_two_exchanges(spark, sf_dir):
    """q65: the 6-stage curation pipeline (dedup -> quality -> mix ->
    split -> pack -> report) compiles to ONE scan and TWO exchanges —
    dedup's keep-min runs as WindowGroupLimit below AND above its
    exchange (map-side partial top-1), the scan-side stages fuse into
    projections, and the per-pack rollup reuses the pack window's
    clustering."""
    plan = _plan(spark, sf_dir, "q65_curation_pipeline")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 2
    assert _count(plan, "WindowGroupLimit") == 2


def test_quality_buckets_no_global_percentile_buffer(spark, sf_dir):
    """q84 (r3-verdict swap): bucket boundaries must come from the
    histogram-crossing quantile, NOT an exact global percentile() that
    buffers one value per document in a single ObjectHashAggregate
    task.  The only permitted single-task structure is the cumulative
    window over the bounded distinct-rounded-score histogram."""
    plan = _plan(spark, sf_dir, "q84_quality_buckets")
    assert "percentile" not in plan.lower(), plan
    assert _count(plan, "ObjectHashAggregate") == 0, plan
    # the histogram cumulative sum is a Window, and the histogram build
    # itself is an ordinary partial-aggregated HashAggregate pair
    assert _count(plan, "Window") >= 1, plan


def test_grouping_sets_expand_times_sets_not_lattice(spark, sf_dir):
    """q90: arbitrary GROUPING SETS — Expand feeds a partial/final
    HashAggregate pair around one exchange, customer broadcasts (the
    orders fact never shuffles for the join)."""
    plan = _plan(spark, sf_dir, "q90_grouping_sets")
    assert _count(plan, "Expand") == 1
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "Exchange") == 1  # the aggregate only


def test_exists_correlated_decorrelates_to_hash_joins(spark, sf_dir):
    """q91: both correlated subqueries must DECORRELATE — a semi and an
    anti hash join with the inequality carried as a join condition; no
    nested loop, no per-row subquery re-execution."""
    plan = _plan(spark, sf_dir, "q91_exists_correlated")
    assert "Join type: LeftSemi" in plan, plan
    assert "Join type: LeftAnti" in plan, plan
    assert _count(plan, "BroadcastNestedLoopJoin") == 0
    # the correlated inequality rides the semi join's condition
    assert "l_shipdate" in plan and "60" in plan
    # the NOT EXISTS predicate pushes to the lineitem scan
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("l_discount" in g for g in m), plan


def test_left_outer_filter_pushes_to_right_scan(spark, sf_dir):
    """q92: the >480k predicate on the outer join's right side must
    reach the orders parquet scan, not run post-join."""
    plan = _plan(spark, sf_dir, "q92_left_outer_orders")
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("o_totalprice" in g and "480000" in g for g in m), plan


def test_label_centroids_single_exchange_no_vector_shuffle(spark, sf_dir):
    """q94: posexplode scan-side, ONE partial-aggregated exchange on
    (label, dim) — vectors never shuffle."""
    plan = _plan(spark, sf_dir, "q94_label_centroids")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Generate") == 1
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "HashAggregate") == 2  # partial + final


def test_bigram_logprob_scan_side_build_no_self_join(spark, sf_dir):
    """q95: bigrams come from a codegen transform over the token array,
    NOT an ordinality self-join; count joins broadcast.  Since the r12
    lineage cut the transform+explode lives ABOVE the plan barrier: the
    final plan reads the materialized bigram RDD (ExistingRDD) and must
    scan the documents parquet ZERO times — the single-upstream-pass
    property the cut exists for (the pre-cut plan re-ran the
    tokenize+explode once per count consumer)."""
    plan = _plan(spark, sf_dir, "q95_bigram_logprob")
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "BroadcastHashJoin") == 2
    assert _count(plan, "Scan ExistingRDD") >= 1
    assert "documents.parquet" not in plan


def test_zorder_probe_pushes_both_range_predicates(spark, sf_dir):
    """q97: both box predicates must reach the parquet scan of the
    z-ordered layout — file skipping happens at the source listing,
    row-group skipping inside the reader, neither survives a post-scan
    filter-only plan."""
    plan = _plan(spark, sf_dir, "q97_zorder_probe")
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("o_custkey" in g and "o_totalprice" in g for g in m), plan
    assert _count(plan, "Exchange") == 1  # the aggregate only


def test_group_normalize_broadcasts_stats_no_window_shuffle(spark, sf_dir):
    """q99: the per-lang stats broadcast back onto the scan — the
    corpus is never shuffled by the low-cardinality group key (the
    window-function formulation would)."""
    plan = _plan(spark, sf_dir, "q99_group_normalize")
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "Window") == 0


def test_pmi_pairs_scan_side_topk_no_global_sort(spark, sf_dir):
    """q100: pair building is a codegen transform+explode (Generate),
    not a positional self-join; the top-50 is TakeOrdered, not a
    global sort."""
    # sf0.01 here: the suite's oracle tests run q100 at sf0.001 and
    # materialize its shared cache, which changes how explain renders
    # the cached subtrees — a fresh sf dir keeps the pin deterministic
    from .conftest import SF_T2

    plan = _plan(spark, SF_T2, "q100_cooccurrence_pmi")
    # each corpus pass (pair explode, unigram explode) appears ONCE;
    # the cached count tables feed both the scores and the totals
    assert _count(plan, "Generate") <= 2
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan


def test_scd2_single_exchange_for_all_window_passes(spark, sf_dir):
    """q102: change-collapse (lag), version numbering, and interval
    close (lead) all ride ONE shuffle by the dimension key."""
    plan = _plan(spark, sf_dir, "q102_scd2_dimension")
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "SortMergeJoin") == 0


def test_sequence_examples_single_exchange_single_window(spark, sf_dir):
    """q103: the three lags share one window spec — one exchange, one
    Window operator."""
    plan = _plan(spark, sf_dir, "q103_sequence_examples")
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "Window") == 1


def test_pagerank_round_is_hash_joins_no_nested_loop(spark, sf_dir):
    """q106: every round is rank/degree hash joins + a partial-
    aggregated inflow sum — no nested-loop join anywhere in the
    unrolled two-round plan."""
    plan = _plan(spark, sf_dir, "q106_pagerank")
    # the only nested loops are the broadcast 1-row n_nodes crossJoins:
    # one seeding the uniform init + one per unrolled round
    n_bnlj = _count(plan, "BroadcastNestedLoopJoin")
    assert n_bnlj <= 3, plan
    assert plan.count("BroadcastNestedLoopJoin Cross BuildRight") == n_bnlj
    assert "CartesianProduct" not in plan


def test_large_volume_orders_aggregates_before_joining(spark, sf_dir):
    """q109: lineitem reduces to qualifying keys via partial/final
    HashAggregate BEFORE any join; the qualifying set broadcasts so
    neither fact table shuffles for the join."""
    plan = _plan(spark, sf_dir, "q109_large_volume_orders")
    assert _count(plan, "BroadcastHashJoin") == 2
    assert _count(plan, "SortMergeJoin") == 0


def test_jl_projection_scan_side_no_exchange(spark, sf_dir):
    """q110: all 16 projected dims are codegen expressions riding the
    scan; the flat emission is one Generate — zero exchanges."""
    plan = _plan(spark, sf_dir, "q110_jl_projection")
    assert _count(plan, "Exchange") == 0, plan
    assert _count(plan, "Generate") == 1


def test_temporal_dim_join_carries_not_joins(spark, sf_dir):
    """q112: the point-in-time lookup is the union-sort-carry — no join
    operator anywhere (probes and version-starts share one sort)."""
    plan = _plan(spark, sf_dir, "q112_temporal_dim_join")
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"):
        assert _count(plan, op) == 0, op


def test_numeric_profile_one_scan_one_reduce(spark, sf_dir):
    """q113: all 4 profiles + 6 correlations are algebraic aggregates
    computed in ONE scan and ONE partial-aggregated reduce."""
    plan = _plan(spark, sf_dir, "q113_numeric_profile")
    assert _count(plan, "Scan parquet") == 1
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "HashAggregate") == 2


def test_markov_single_window_broadcast_normalize(spark, sf_dir):
    """q120: one user-keyed Window feeds the lag; the cached |types|^2
    matrix serves both the probabilities and the row totals (the lag
    pipeline never runs twice); normalization joins broadcast."""
    from .conftest import SF_T2

    plan = _plan(spark, SF_T2, "q120_markov_transitions")
    assert _count(plan, "Window") <= 1
    assert "InMemoryTableScan" in plan
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0


def test_decile_cumulative_pass_is_over_aggregated_prices(spark, sf_dir):
    """q119: the cume-dist cumulative window consumes the DISTINCT
    price histogram (HashAggregate below the Window), never raw rows —
    the q84 posture; the bucket join broadcasts."""
    plan = _plan(spark, sf_dir, "q119_decile_profile")
    assert _count(plan, "Window") == 1
    assert _count(plan, "BroadcastHashJoin") == 1
    # the window's subtree aggregates first: at least hist partial+final
    assert _count(plan, "HashAggregate") >= 4


# ---- round-4 continuation queries ----


def test_gapfill_aggregates_before_spine_join(spark, sf_dir):
    """q122: orders partial-aggregate to (nation, day) BEFORE the spine
    left join; both dims broadcast; no sort-merge join anywhere."""
    plan = _plan(spark, sf_dir, "q122_gapfill_daily")
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "BroadcastHashJoin") >= 3  # cust, nation, spine-rev
    assert _count(plan, "HashAggregate") >= 2  # partial + final rev agg


def test_anomaly_windows_over_aggregate_not_facts(spark, sf_dir):
    """q123: the RANGE window's exchange is on n_name AFTER the
    (nation, day) aggregate — exactly one agg exchange + one window
    exchange, none on raw orders."""
    plan = _plan(spark, sf_dir, "q123_moving_anomaly")
    assert _count(plan, "Window") == 1
    assert _count(plan, "SortMergeJoin") == 0


def test_sweepline_two_phase(spark, sf_dir):
    """q124: the distributed sweep has the per-bucket window AND the
    tiny across-bucket window — two Window nodes, no more."""
    plan = _plan(spark, sf_dir, "q124_session_concurrency")
    # sessionize (lag, boundary-sum, per-session reduce windows) feeds
    # the sweep's per-bucket prefix window + the across-bucket offset
    # window; 6 total today — growth here means a lost fusion
    assert _count(plan, "Window") == 6
    assert "CartesianProduct" not in plan


def test_fuzzy_match_is_blocked_hash_join(spark, sf_dir):
    """q125: candidates come from an equi-join on the blocking key —
    never a cartesian/broadcast-nested-loop over all pairs."""
    plan = _plan(spark, sf_dir, "q125_fuzzy_part_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_stays_codegen(spark, sf_dir):
    """q127: the bitmap probe adds NO exchange and NO Python — the
    only joins are broadcast."""
    plan = _plan(spark, sf_dir, "q127_bloom_semi_join")
    assert _count(plan, "SortMergeJoin") == 0
    assert "Python" not in plan


def test_bpe_encode_no_python_vocab_broadcast(spark, sf_dir):
    """q131: merge folds are pure codegen (no Python boundary) and the
    per-word token counts broadcast back onto the doc-word table."""
    plan = _plan(spark, sf_dir, "q131_bpe_encode")
    assert "Python" not in plan
    assert _count(plan, "BroadcastHashJoin") >= 1


def test_attribution_single_user_exchange(spark, sf_dir):
    """q132: lag, session numbering, and the per-session reduction all
    ride ONE exchange on user_id (plus the final 5-key rollup)."""
    plan = _plan(spark, sf_dir, "q132_first_touch_attribution")
    assert _count(plan, "Window") == 2  # lag + running boundary sum
    assert _count(plan, "Exchange") <= 3


def test_tpch_q3_broadcasts_and_caps_topk(spark, sf_dir):
    """q137: dims broadcast, dates pushed to the scans, and the top-10
    runs as TakeOrderedAndProject — never a global sort."""
    plan = _plan(spark, sf_dir, "q137_shipping_priority")
    assert _count(plan, "SortMergeJoin") == 0
    assert "TakeOrderedAndProject" in plan
    assert "l_shipdate" in plan and "PushedFilters" in plan


def test_tpch_q5_single_fact_pass(spark, sf_dir):
    """q138: every dimension broadcasts — the lineitem/orders branch is
    the only big input and it is never exchanged for a join."""
    plan = _plan(spark, sf_dir, "q138_local_supplier_volume")
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "BroadcastHashJoin") >= 4


def test_median_mad_no_value_buffering(spark, sf_dir):
    """q133: both passes are histogram aggregates + windows — no
    ObjectHashAggregate holding raw per-group values (the retired q84
    trap), no sort-based fallback."""
    plan = _plan(spark, sf_dir, "q133_group_median_mad")
    assert "ObjectHashAggregate" not in plan
    assert "percentile" not in plan.lower()


def test_basket_similarity_inverted_index_join(spark, sf_dir):
    """q141: candidate pairs come from the item-keyed equi-join —
    never cartesian — and the top-50 is TakeOrdered, not a sort."""
    plan = _plan(spark, sf_dir, "q141_basket_similarity")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q144_clustering_coefficient",
        "q128_triangle_parts",
        "q165_cheapest_two_hop",
        "q181_label_propagation",
    ],
)
def test_heavy_graph_plans_never_go_cartesian(spark, sf_dir, name):
    """The wedge/fixpoint/two-hop family: every pair expansion must be
    an equi-join (inverted index / oriented wedge), never a cartesian
    or nested-loop fallback — the property that keeps these linear-ish
    at 100 TB."""
    plan = _plan(spark, sf_dir, name)
    assert _count(plan, "CartesianProduct") == 0
    assert _count(plan, "BroadcastNestedLoopJoin") == 0


def test_grouped_pandas_mad_is_one_exchange_one_arrow_stage(spark, sf_dir):
    """q172: the grouped-Arrow certification pattern — exactly ONE
    exchange (the group key) feeding exactly ONE FlatMapGroupsInPandas;
    any second exchange or a row-at-a-time PythonUDF would break the
    declared hot-user-bounded contract."""
    plan = _plan(spark, sf_dir, "q172_grouped_pandas_mad_outliers")
    assert _count(plan, "Exchange") == 1
    assert _count(plan, "FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_knn_eval_probe_cap_is_take_ordered(spark, sf_dir):
    """q175: the PROBE_CAP=2000 md5 cut compiles to
    TakeOrderedAndProject (per-partition top-N, no global sort), and
    the probe side broadcasts — never a cartesian shuffle."""
    plan = _plan(spark, sf_dir, "q175_knn_classifier_eval")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_bitmap_distinct_two_partial_aggregates(spark, sf_dir):
    """q154: word-level bit_or then day-level popcount sum — both
    partial-aggregated (4 HashAggregate nodes), no Expand (the
    distinct rewrite this query exists to avoid)."""
    plan = _plan(spark, sf_dir, "q154_bitmap_distinct")
    assert _count(plan, "HashAggregate") == 4
    assert _count(plan, "Expand") == 0


def test_nb_scoring_is_vocab_bounded(spark, sf_dir):
    """q158: scoring joins (doc, term) to the model on the term key
    with broadcasts — no sort-merge join materializing the
    doc x class x term cube."""
    plan = _plan(spark, sf_dir, "q158_naive_bayes_confusion")
    # the one SMJ allowed is the doc_id join against the label table —
    # doc-keyed and linear; the model/ll0/vocab sides must broadcast
    assert _count(plan, "SortMergeJoin") <= 1
    assert _count(plan, "BroadcastHashJoin") >= 3


def test_interpolation_windows_over_spine_not_facts(spark, sf_dir):
    """q153: the backward and forward ignore-nulls walls share one
    partitioning and ordering, so Spark fuses them into a SINGLE
    Window operator (multi-frame) over the dims x days spine; daily
    rev broadcasts in."""
    plan = _plan(spark, sf_dir, "q153_interpolated_series")
    assert _count(plan, "Window") == 1
    assert _count(plan, "SortMergeJoin") == 0


def test_nucleus_window_over_vocab_only(spark, sf_dir):
    """q160: the cumulative window input is the vocab aggregate (its
    exchange is a single partition of vocab rows), and the corpus is
    scanned exactly once."""
    plan = _plan(spark, sf_dir, "q160_nucleus_vocab")
    assert _count(plan, "Window") == 1
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """q161: the runtime date-dim filter reaches the partitioned scan
    as a dynamic pruning subquery — without it this join silently
    scans every partition."""
    plan = _plan(spark, sf_dir, "q161_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower(), plan


def test_array_functions_zero_exchanges(spark, sf_dir):
    """q166: per-vector array algebra is pure scan-side codegen — no
    exchange, no explode-generate, no Python."""
    plan = _plan(spark, sf_dir, "q166_array_functions")
    assert _count(plan, "Exchange") == 0
    assert _count(plan, "Generate") == 0
    assert "Python" not in plan


def test_lateral_topn_decorrelates_to_window(spark, sf_dir):
    """q212: the correlated LATERAL subquery must rewrite to a window
    top-k + hash join — any nested-loop/cartesian shape means Catalyst
    re-executed the subquery per outer row."""
    plan = _plan(spark, sf_dir, "q212_lateral_topn")
    assert _count(plan, "CartesianProduct") == 0
    assert "BroadcastNestedLoop" not in plan
    assert "Window" in plan


def test_itemset_triples_apriori_prune_is_broadcast_semi(spark, sf_dir):
    """q208: both pair-closure prunes ride broadcast LEFT SEMI joins
    BEFORE the triple count — the lossless apriori cut that keeps the
    candidate set sub-cubic."""
    plan = _plan(spark, sf_dir, "q208_itemset_triples")
    assert plan.count("LeftSemi") >= 2, plan
    assert _count(plan, "CartesianProduct") == 0


def test_promo_share_single_fact_pass(spark, sf_dir):
    """q194: the part dim broadcasts (no fact shuffle for the join)
    and both the conditional and total revenue come from ONE
    aggregate over the joined fact."""
    plan = _plan(spark, sf_dir, "q194_promo_revenue_share")
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0


def test_benford_single_scan_broadcast_total(spark, sf_dir):
    """q199: the 9-digit histogram is one scan; the grand total joins
    back as a broadcast 1-row aggregate, never a second scan of
    orders."""
    plan = _plan(spark, sf_dir, "q199_benford_first_digit")
    assert plan.count("orders.parquet") <= 1 or _count(plan, "Scan parquet") <= 2
    assert _count(plan, "CartesianProduct") == 0


def test_sql_udf_rollup_inlines_to_codegen(spark, sf_dir):
    """q248: SQL-body functions must inline — any Python/BatchEval
    node means the semantic layer became an interpreter."""
    plan = _plan(spark, sf_dir, "q248_sql_udf_rollup")
    assert "Python" not in plan
    assert "BatchEval" not in plan
    assert _count(plan, "HashAggregate") >= 1


def test_mann_whitney_carry_has_no_probe_join(spark, sf_dir):
    """q315: the union-sort carry replaces the per-value probe join —
    no SortMergeJoin anywhere; both group histograms partial-aggregate
    (HashAggregate below and above their exchange); the only join is
    the broadcast of the 1-row nb total."""
    plan = _plan(spark, sf_dir, "q315_mann_whitney")
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "HashAggregate") >= 4
    assert _count(plan, "CartesianProduct") == 0


def test_ks_statistic_single_merged_histogram(spark, sf_dir):
    """q316: one merged value histogram (union -> partial-aggregated
    groupBy), no join at all — the sup runs in a window + final agg."""
    plan = _plan(spark, sf_dir, "q316_ks_statistic")
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "BroadcastHashJoin") == 0
    assert _count(plan, "HashAggregate") >= 2
    assert _count(plan, "Window") >= 1


def test_lorenz_single_aggregate_then_window(spark, sf_dir):
    """q324: per-customer sums partial-aggregate through ONE exchange;
    the rank/cumsum window then sorts that bounded aggregate — the
    fact table itself is never globally sorted."""
    plan = _plan(spark, sf_dir, "q324_lorenz_curve")
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "HashAggregate") >= 2
    assert _count(plan, "Window") >= 1


def test_decile_ratio_broadcasts_dim_histogram_crossing(spark, sf_dir):
    """q325: customer dim broadcasts (no fact shuffle for the join);
    quantiles come from per-(segment, cents) histogram crossings —
    partial-aggregated, no percentile ObjectHashAggregate buffer."""
    plan = _plan(spark, sf_dir, "q325_decile_ratio")
    assert _count(plan, "BroadcastHashJoin") == 1
    assert _count(plan, "SortMergeJoin") == 0
    assert "ObjectHashAggregate" not in plan


def test_lorenz_scaled_has_no_global_sort(spark, sf_dir):
    """q331 (the Lorenz scale swap): every Sort in the plan is
    per-partition (global flag false); the rank/cumsum window is
    PARTITIONED by the range-partition id so it parallelizes, unlike
    q324's single-task global-order window; offsets and totals arrive
    as broadcasts, never a shuffle join."""
    plan = _plan(spark, sf_dir, "q331_lorenz_scaled")
    assert "], true, 0" not in plan          # no globally-sorted Sort
    assert "windowspecdefinition(_pid" in plan
    assert _count(plan, "SortMergeJoin") == 0


def test_gini_scaled_grouped_windows_stay_partitioned(spark, sf_dir):
    """q332 (grouped Gini swap): windows partition by (range-partition
    id, nation) — never by nation alone, which would put a nation's
    whole order history in one task; no global sorts; customer dim
    broadcast."""
    plan = _plan(spark, sf_dir, "q332_gini_scaled")
    assert "], true, 0" not in plan
    assert "windowspecdefinition(_pid" in plan
    assert _count(plan, "SortMergeJoin") == 0
    assert _count(plan, "BroadcastHashJoin") >= 1


def test_edit_distance_levenshtein_stays_jvm_side(spark, sf_dir):
    """q333: the per-pair Levenshtein runs inside codegen (no
    BatchEvalPython / ArrowEvalPython anywhere), and the bucket-probe
    join is a real equi hash join, never a cartesian product."""
    plan = _plan(spark, sf_dir, "q333_edit_distance_neardup")
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan


def test_triangle_census_all_joins_are_hash_joins(spark, sf_dir):
    """q334: the oriented wedge/closing joins are hash/merge joins
    with a partial-aggregated count on top — no cartesian product, no
    row_number window over the edge set.  (The degree/orientation
    joins sit behind the shared lineage cut, so the displayed plan
    shows the wedge join and the left-semi closing probe.)"""
    plan = _plan(spark, sf_dir, "q334_copurchase_triangles")
    assert "CartesianProduct" not in plan, plan
    assert _count(plan, "Window") == 0
    assert (
        _count(plan, "BroadcastHashJoin") + _count(plan, "SortMergeJoin")
        + _count(plan, "ShuffledHashJoin") >= 2
    )


def test_tfidf_pair_join_partial_aggregates(spark, sf_dir):
    """q335: the inverted-index dot-product groupBy partial-aggregates
    below its exchange (map-side combine on (doc_a, doc_b)), and the
    final top-40 is TakeOrdered, not a global Sort+Limit."""
    plan = _plan(spark, sf_dir, "q335_tfidf_cosine")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pps_sample_windows_stay_partitioned(spark, sf_dir):
    """q336: the cumulative-weight window partitions by the
    range-partition id (parallel), never a single-task global-order
    window; the total joins back as a broadcast."""
    plan = _plan(spark, sf_dir, "q336_systematic_pps_sample")
    assert "], true, 0" not in plan          # no globally-sorted Sort
    assert "windowspecdefinition(_pid" in plan
    assert _count(plan, "BroadcastNestedLoopJoin") >= 1


def test_hard_negatives_argmax_is_partial_aggregate(spark, sf_dir):
    """q339: the cross-label argmax is max(struct(...)) — a
    HashAggregate pair around one exchange (map-side combine), with
    the 8-anchor side broadcast; NO row_number window over the corpus
    and no Python evaluation."""
    plan = _plan(spark, sf_dir, "q339_hard_negatives")
    assert _count(plan, "Window") == 0
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan
    assert _count(plan, "HashAggregate") + _count(plan, "SortAggregate") >= 2


def test_budget_curation_cumsum_stays_parallel(spark, sf_dir):
    """q341: the greedy-prefix running sum rides distributed_cumsum —
    windows partitioned by the range-partition id, no global sort."""
    plan = _plan(spark, sf_dir, "q341_token_budget_curation")
    assert "], true, 0" not in plan
    assert "windowspecdefinition(_pid" in plan


def test_adamic_adar_no_cartesian_and_partial_agg(spark, sf_dir):
    """q342: wedge pairing is an equi join on the center with a
    partial-aggregated (u, v) rollup; existing edges leave via a
    hash-join anti probe; final 40 by TakeOrdered."""
    plan = _plan(spark, sf_dir, "q342_adamic_adar_links")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert _count(plan, "Window") == 0
    # the adjacency exchange is PINNED (user-numbered repartition, which
    # AQE cannot coalesce): the wedge expansion is output-dominated, so
    # its stage width must follow configured shuffle width, never the
    # few-MB input stats — without the pin, AQE sporadically planned
    # the 90 MB expansion as ONE task (the r8 q342 bench outlier,
    # diagnosed in PAIRED_r09)
    assert "REPARTITION_BY_NUM" in plan, plan


def test_group_reservoir_limits_below_exchange(spark, sf_dir):
    """q340: the per-group rank<=k cut runs map-side (WindowGroupLimit),
    so the shuffle carries at most k rows per group per task — the q25
    posture for the sampler."""
    plan = _plan(spark, sf_dir, "q340_group_reservoir")
    assert "WindowGroupLimit" in plan, plan
