"""Invariant pins for the integer-exact statistics family
(q197-q202): each oracle hash-match proves engine agreement; these
prove the NUMBERS mean what the docstrings claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.queries import QUERIES


def test_spearman_rho_in_range_and_d2_consistent(spark, sf_dir):
    rows = QUERIES["q197_spearman_rank_corr"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.rho <= 1.0
        # rho recomputes from (n, sum_d2) — the emitted double is not
        # independent information
        expect = 1.0 - 6.0 * r.sum_d2 / (r.n * (r.n * r.n - 1.0))
        assert abs(r.rho - expect) < 1e-6


def test_gini_bounds_and_constant_case(spark, sf_dir):
    rows = QUERIES["q198_gini_order_values"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.gini_ppm < 1_000_000

    # constant values => numerator 2*si - (n+1)*s = 0 exactly
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, i, 500) for i in range(10)], "nk long, k long, cents long"
    )
    w = Window.partitionBy("nk").orderBy("cents", "k")
    r = df.select("nk", "cents", F.row_number().over(w).alias("i"))
    a = r.groupBy("nk").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("i") * F.col("cents")).alias("si"),
    ).collect()[0]
    assert 2 * a.si - (a.n + 1) * a.s == 0


def test_benford_shares_sum_to_unity(spark, sf_dir):
    rows = QUERIES["q199_benford_first_digit"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    total_obs = sum(r.observed_ppm for r in rows)
    # integer floor division loses < 1 ppm per digit
    assert 1_000_000 - 9 <= total_obs <= 1_000_000
    assert sum(r.expected_ppm for r in rows) == 1_000_000


def test_order_cadence_quantile_ordering(spark, sf_dir):
    rows = QUERIES["q200_order_cadence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.median_gap_days <= r.p90_gap_days


def test_hapax_ttr_ppm_bounds(spark, sf_dir):
    rows = QUERIES["q201_hapax_ttr"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_hapax <= r.n_types <= r.n_tokens
        assert 0 < r.ttr_ppm <= 1_000_000
        assert 0 <= r.hapax_ppm <= 1_000_000


def test_zipf_ranks_are_dense_and_ordered(spark, sf_dir):
    rows = QUERIES["q202_zipf_rank_freq"](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert r.rank_x_freq == r.rank * r.freq


def test_seat_allocation_sums_exactly(spark, sf_dir):
    rows = QUERIES["q226_seat_allocation"](spark, sf_dir).collect()
    assert sum(r.seats for r in rows) == 1000
    assert all(r.seats in (r.floor_seats, r.floor_seats + 1) for r in rows)


def test_quantile_normalize_is_monotone(spark, sf_dir):
    rows = QUERIES["q227_quantile_normalize"](spark, sf_dir).collect()
    by_bal = sorted(rows, key=lambda r: (r.bal_cents, r.s_suppkey))
    mapped = [r.mapped_cents for r in by_bal]
    assert mapped == sorted(mapped), "rank order must be preserved"
    perms = [r.permille for r in by_bal]
    assert perms == sorted(perms)
    assert min(perms) == 0 and max(perms) == 1000


def test_power_iteration_unit_norm(spark, sf_dir):
    rows = QUERIES["q225_power_iteration"](spark, sf_dir).collect()
    assert len(rows) == 64
    norm2 = sum(r.component ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-6


def test_revenue_bridge_decomposes_exactly(spark, sf_dir):
    rows = QUERIES["q247_revenue_bridge"](spark, sf_dir).collect()
    assert rows
    total = rows[0].total_delta
    assert all(r.total_delta == total for r in rows)
    assert sum(r.delta_cents for r in rows) == total
    for r in rows:
        assert r.delta_cents == r.after_cents - r.before_cents


def test_mean_triad_inequality(spark, sf_dir):
    rows = QUERIES["q245_mean_triad"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # AM >= GM >= HM (strict unless all values equal); integer
        # floor on AM can shave < 1 cent, hence the +1 slack
        assert r.arith_mean_cents + 1 >= r.geo_mean_cents >= r.harm_mean_cents


def test_sample_allocation_sums_to_budget(spark, sf_dir):
    rows = QUERIES["q246_sample_allocation"](spark, sf_dir).collect()
    assert sum(r.sample_n for r in rows) == 10000


def test_log2_histogram_buckets_are_exact(spark, sf_dir):
    rows = QUERIES["q244_log2_histogram"](spark, sf_dir).collect()
    for r in rows:
        assert r.lo_cents == 2 ** r.bucket


def test_linear_attribution_ledger_balances(spark, sf_dir):
    """Total credited millicents == 1000x the purchase cents of every
    session that HAD pre-purchase touches (exact apportionment)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    rows = QUERIES["q263_linear_attribution"](spark, sf_dir).collect()
    credited = sum(r.credit_millicents for r in rows)

    from real_time_stream_processing_engine_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F2.round(F2.col("value") * 100).cast("long").alias("cents"),
        F2.unix_micros(F2.col("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = ev.withColumn(
        "sid",
        F2.sum(
            F2.when(
                F2.lag("us").over(w).isNull()
                | ((F2.col("us") - F2.lag("us").over(w)) > 1_800_000_000),
                1,
            ).otherwise(0)
        ).over(w),
    )
    fp = s.groupBy("user_id", "sid").agg(
        F2.min(
            F2.when(F2.col("event_type") == "purchase", F2.col("us"))
        ).alias("pus"),
        F2.sum(
            F2.when(
                F2.col("event_type") == "purchase", F2.col("cents")
            ).otherwise(0)
        ).alias("pval"),
    )
    with_touch = (
        s.join(fp, ["user_id", "sid"])
        .filter(F2.col("pus").isNotNull() & (F2.col("us") < F2.col("pus")))
        .select("user_id", "sid", "pval")
        .distinct()
    )
    expected = with_touch.agg(F2.sum("pval")).collect()[0][0] * 1000
    assert credited == expected


def test_interval_coverage_bounds(spark, sf_dir):
    rows = QUERIES["q261_interval_coverage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_blocks >= 1
        # each block is at least one 30-min window long
        assert r.covered_s >= 1800 * r.n_blocks


def test_sketch_agreement_counts_consistent(spark, sf_dir):
    r = QUERIES["q262_sketch_agreement"](spark, sf_dir).collect()[0]
    assert r.agreed_pairs <= min(r.minhash_pairs, r.simhash_pairs)


def test_trade_balances_sum_to_zero(spark, sf_dir):
    rows = QUERIES["q264_trade_balance"](spark, sf_dir).collect()
    assert sum(r.balance_e4 for r in rows) == 0
    assert sum(r.exports_e4 for r in rows) == sum(
        r.imports_e4 for r in rows
    )


def test_lsh_precision_rises_with_bands(spark, sf_dir):
    rows = sorted(
        QUERIES["q266_lsh_tuning_curve"](spark, sf_dir).collect(),
        key=lambda r: r.n_bands,
    )
    assert rows[0].n_bands >= 1
    # more shared bands => never a LOWER true-pair share (weak
    # monotonicity; tiny buckets can tie)
    prec = [r.precision_permille for r in rows]
    assert all(b >= a - 100 for a, b in zip(prec, prec[1:]))


def test_median_ci_brackets_median(spark, sf_dir):
    rows = QUERIES["q278_median_ci"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo_cents <= r.median_cents <= r.ci_hi_cents


def test_drawdown_non_negative_and_causal(spark, sf_dir):
    rows = QUERIES["q279_drawdown"](spark, sf_dir).collect()
    for r in rows:
        assert r.drawdown_cents == r.peak_cents - r.day_cents >= 0


def test_dup_rate_bounds(spark, sf_dir):
    rows = QUERIES["q280_dup_rate_by_source"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_unique <= r.n_docs
        assert 0 <= r.dup_permille < 1000


def test_eb_smoothing_shrinks_toward_global(spark, sf_dir):
    rows = QUERIES["q282_eb_smoothing"](spark, sf_dir).collect()
    gn = sum(r.n for r in rows)
    gk = sum(r.k for r in rows)
    global_ppm = gk * 1_000_000 // gn
    for r in rows:
        lo, hi = sorted((r.raw_ppm, global_ppm))
        # smoothed lies between raw and global (integer floor slack 1)
        assert lo - 1 <= r.smoothed_ppm <= hi + 1


def test_capture_recapture_estimate_sane(spark, sf_dir):
    r = QUERIES["q281_capture_recapture"](spark, sf_dir).collect()[0]
    assert r.recaptured <= min(r.n1, r.n2)
    assert r.population_estimate >= max(r.n1, r.n2)
