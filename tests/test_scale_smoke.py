"""Scale smoke: the scalable formulations versus naive references at
millions of rows — evidence the decompositions hold beyond toy sizes,
not just on the sf0.001 fixtures.  All data is generated distributed
(spark.range); nothing is collected beyond small results."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_stream_processing_engine_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
)
from real_time_stream_processing_engine_spark.operators.windows import (
    interval_concurrency,
)


def test_sweepline_matches_naive_at_2m_intervals(spark):
    """2M pseudo-random intervals: the two-phase distributed sweep
    equals the naive single-partition global running sum."""
    iv = spark.range(2_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3_000_000)).alias("s"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5000)) + 1).alias("len"),
    ).select("s", (F.col("s") + F.col("len") - 1).alias("e"))
    got = {
        r.bucket_start: r.max_concurrent
        for r in interval_concurrency(iv, "s", "e", bucket_sec=3600).collect()
    }
    deltas = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t").agg(F.sum("d").alias("nd"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    run = net.select(
        "t",
        F.sum("nd").over(w).alias("conc"),
        (F.sum("nd").over(w) - F.col("nd")).alias("prev_conc"),
        (F.floor(F.col("t") / 3600) * 3600).alias("bucket"),
    )
    naive = {
        r.bucket: r.mx
        for r in run.groupBy("bucket")
        .agg(
            F.max("conc").alias("mxc"),
            F.min("t").alias("first_t"),
            F.min_by("prev_conc", "t").alias("carry"),
        )
        .select(
            "bucket",
            F.when(
                F.col("first_t") > F.col("bucket"),
                F.greatest("mxc", "carry"),
            )
            .otherwise(F.col("mxc"))
            .alias("mx"),
        )
        .collect()
    }
    assert got == naive


def test_bitmap_distinct_matches_count_distinct_at_10m(spark):
    """10M events over a 500k id space, 30 'days': bitmap popcounts
    equal COUNT DISTINCT exactly."""
    ev = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(30)).alias("day"),
        F.pmod(F.xxhash64("id", F.lit(8)), F.lit(500_000)).alias("uid"),
    )
    words = (
        ev.select(
            "day",
            F.expr("uid div 64").alias("w"),
            F.expr("shiftleft(1L, cast(uid % 64 AS INT))").alias("bit"),
        )
        .groupBy("day", "w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    got = {
        r.day: r.dau
        for r in words.groupBy("day")
        .agg(F.sum(F.bit_count("bits")).alias("dau"))
        .collect()
    }
    want = {
        r.day: r.dau
        for r in ev.groupBy("day")
        .agg(F.count_distinct("uid").alias("dau"))
        .collect()
    }
    assert got == want


def test_bloom_prunes_10m_probe_without_false_negatives(spark):
    """10M-row probe against a 50k-key Bloom image: every true member
    survives (checked exactly via anti-join) and the false-positive
    mass stays near the analytic rate."""
    keys = spark.range(50_000).select((F.col("id") * 13 + 5).alias("k"))
    bitmap = bloom_build(keys, "k", num_bits=1 << 20)
    probe = spark.range(10_000_000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(probe, "k", bitmap, num_bits=1 << 20)
    # no false negatives: true members missing from kept == 0
    true_in_probe = keys.filter(F.col("k") < 10_000_000)
    missing = true_in_probe.join(kept, "k", "left_anti").count()
    assert missing == 0
    # pruning: kept ~= 50k members + fpp * 10M (fpp ~ (1-e^{-3n/m})^3)
    n_kept = kept.count()
    assert n_kept < 50_000 + 0.01 * 10_000_000


# ---------------------------------------------------------------------------
# q301+ statistics wing at millions of rows (the q198 BIGINT-overflow
# lesson, applied early): the factored operators in operators/stats.py
# are driven at magnitudes where na*nb*1e6 and d_num*1e6 CROSS int64
# (~9.2e18), so the DECIMAL(38,0) hops are load-bearing — a long-typed
# formulation would wrap.  Oracles are exact Python bigints computed
# from the (small) distinct-value histograms or closed forms.
# ---------------------------------------------------------------------------

from real_time_stream_processing_engine_spark.operators.stats import (  # noqa: E402
    grouped_quantile_crossings,
    ks_statistic,
    lorenz_points,
    mann_whitney_u,
)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark's DIV)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mann_whitney_exact_at_4m_x_4m(spark):
    """4M vs 4M rows, 20k distinct values, group A shifted 3/4 of the
    domain above B: na*nb = 1.6e13 and (2U+T-nm)*1e6 ~ 1.2e19 > int64.
    The DataFrame result must equal the exact bigint computation from
    the collected histograms."""
    domain, shift, n = 20_000, 15_000, 4_000_000
    a = spark.range(n).select(
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(domain)) + shift).alias("v")
    )
    b = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(domain)).alias("v")
    )
    got = mann_whitney_u(a, b).head()
    ha = {r.v: r.c for r in a.groupBy("v").agg(F.count("*").alias("c")).collect()}
    hb = {r.v: r.c for r in b.groupBy("v").agg(F.count("*").alias("c")).collect()}
    na, nb = sum(ha.values()), sum(hb.values())
    bs = sorted(hb)
    prefix, run = {}, 0
    for v in bs:
        prefix[v] = run
        run += hb[v]
    import bisect

    u_strict = ties = 0
    for v, c in ha.items():
        i = bisect.bisect_left(bs, v)
        below = prefix[bs[i]] if i < len(bs) and bs[i] == v else (
            run if i == len(bs) else prefix[bs[i]]
        )
        u_strict += c * below
        ties += c * hb.get(v, 0)
    assert (got.na, got.nb) == (na, nb)
    assert got.u_strict == u_strict
    assert got.ties == ties
    want_rb = _tdiv((2 * u_strict + ties - na * nb) * 1_000_000, na * nb)
    assert got.rank_biserial_ppm == want_rb
    assert (2 * u_strict + ties - na * nb) * 1_000_000 > 2**63  # teeth


def test_ks_exact_at_4m_x_4m(spark):
    """Same two samples: sup|cumA*nb - cumB*na| must equal the bigint
    scan of the merged histograms, at a separation where d_num*1e6
    crosses int64."""
    domain, shift, n = 20_000, 15_000, 4_000_000
    a = spark.range(n).select(
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(domain)) + shift).alias("v")
    )
    b = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(domain)).alias("v")
    )
    got = ks_statistic(a, b).head()
    ha = {r.v: r.c for r in a.groupBy("v").agg(F.count("*").alias("c")).collect()}
    hb = {r.v: r.c for r in b.groupBy("v").agg(F.count("*").alias("c")).collect()}
    na, nb = sum(ha.values()), sum(hb.values())
    cuma = cumb = d_num = 0
    for v in sorted(set(ha) | set(hb)):
        cuma += ha.get(v, 0)
        cumb += hb.get(v, 0)
        d_num = max(d_num, abs(cuma * nb - cumb * na))
    assert (got.na, got.nb) == (na, nb)
    assert got.d_num == d_num
    assert got.ks_ppm == _tdiv(d_num * 1_000_000, na * nb)
    assert d_num * 1_000_000 > 2**63  # teeth


def test_lorenz_closed_form_at_2m_entities(spark):
    """2M entities with value (id % 1000)+1 (each value exactly 2000
    times): every decile boundary rank, cumulative sum, and ppm share
    has a closed form — point d must read at rank d·n/10 EXACTLY (the
    d/10 population boundary; ceil bucketing), and decile 10 must be
    1e6 ppm (the checksum)."""
    n, dv, per = 2_000_000, 1000, 2000
    keyed = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % dv + 1).alias("s")
    )
    got = {
        r.decile: (r.n_cum, r.cum, r.cum_share_ppm)
        for r in lorenz_points(keyed, sum_col="s", key_col="k").collect()
    }
    tot = per * dv * (dv + 1) // 2
    want = {}
    for d in range(1, 11):
        rk = d * n // 10  # max rank in ceil-bucket d == the d/10 boundary
        vv = -(-rk // per)  # ceil: value at rank rk
        cum = per * vv * (vv - 1) // 2 + (rk - per * (vv - 1)) * vv
        want[d] = (rk, cum, cum * 1_000_000 // tot)
    assert got == want
    assert got[10][2] == 1_000_000
    assert got[1][0] == n // 10  # the 10% point exists (the review catch)


def test_decile_ratio_closed_form_at_4m(spark):
    """4M rows in 5 groups, per-group uniform over 10k values (80
    each): P10/P90 crossings and the permille ratio are closed-form."""
    rows = spark.range(4_000_000).select(
        (F.col("id") % 5).alias("g"),
        ((F.col("id") / 5).cast("long") % 10_000 + F.col("id") % 5).alias("v"),
    )
    got = {
        r.group: (r.n, r.p10, r.p90, r.p90_p10_permille)
        for r in grouped_quantile_crossings(rows, "g", "v").collect()
    }
    want = {
        g: (
            800_000,
            g + 999,
            g + 8999,
            (g + 8999) * 1000 // (g + 999),
        )
        for g in range(5)
    }
    assert got == want


def test_distributed_cumsum_matches_closed_form_at_2m(spark):
    """The Lorenz scale swap: the range-partitioned two-pass prefix
    sum must produce EXACTLY the global window's rank+cumsum — checked
    at 2M entities against the same closed form as the window-based
    Lorenz test, including the decile-10 ppm checksum.  No
    single-partition global sort anywhere in the plan."""
    from real_time_stream_processing_engine_spark.operators.stats import (
        distributed_cumsum,
    )

    n, dv, per = 2_000_000, 1000, 2000
    keyed = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % dv + 1).alias("s")
    )
    from real_time_stream_processing_engine_spark.operators.stats import (
        decile_table,
    )

    tot = per * dv * (dv + 1) // 2
    r = distributed_cumsum(keyed, ["s", "k"], "s", num_partitions=16)
    got = {
        row.decile: (row.n_cum, row.cum, row.cum_share_ppm)
        for row in decile_table(
            r.selectExpr("rk", "cum", f"CAST({n} AS BIGINT) AS n",
                         f"CAST({tot} AS DECIMAL(38,0)) AS tot")
        ).collect()
    }
    assert tot == 1_001_000_000
    want = {}
    for d in range(1, 11):
        rk = d * n // 10
        vv = -(-rk // per)
        cum = per * vv * (vv - 1) // 2 + (rk - per * (vv - 1)) * vv
        want[d] = (rk, cum, cum * 1_000_000 // tot)
    assert got == want


def test_grouped_distributed_cumsum_skewed_at_4m(spark):
    """Grouped swap under deliberate skew: 4M rows where one group
    holds 80% (it must SPAN range partitions), checked against the
    per-group global-window formulation via the rank-order-sensitive
    aggregates Σ(rk·v), Σcum, max(cum) per group — any rank corruption
    breaks Σ(rk·v) under the (v, k) total order."""
    from pyspark.sql import Window

    from real_time_stream_processing_engine_spark.operators.stats import (
        distributed_cumsum,
    )

    rows = spark.range(4_000_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 < 4, 0)
        .otherwise((F.col("id") % 5).cast("int"))
        .alias("g"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000))).alias("v"),
    )
    r = distributed_cumsum(rows, ["v", "k"], "v", num_partitions=16,
                           group_cols=["g"])
    got = {
        row.g: (row.n, row.srv, row.scum, row.mx)
        for row in r.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("rk").cast("decimal(38,0)") * F.col("v")).alias("srv"),
            F.sum("cum").alias("scum"),
            F.max("cum").alias("mx"),
        )
        .collect()
    }
    w = Window.partitionBy("g").orderBy("v", "k")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = rows.select(
        "g",
        "v",
        F.row_number().over(w).alias("rk"),
        F.sum("v").over(wc).cast("decimal(38,0)").alias("cum"),
    )
    want = {
        row.g: (row.n, row.srv, row.scum, row.mx)
        for row in naive.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("rk").cast("decimal(38,0)") * F.col("v")).alias("srv"),
            F.sum("cum").alias("scum"),
            F.max("cum").alias("mx"),
        )
        .collect()
    }
    assert got == want
    assert want[0][0] == 3_200_000  # the hot group really is 80%


def test_triangle_census_clique_grid_closed_form_at_4m_edges(spark):
    """100k disjoint 10-cliques (1M nodes, 4.5M edges): every census
    figure has a closed form — the degree-ordered orientation must
    reproduce all of them exactly, and the clustering coefficient of a
    clique union is exactly 1."""
    from real_time_stream_processing_engine_spark.operators.graph import (
        triangle_stats,
    )

    k, c = 100_000, 10
    pairs = [(i, j) for i in range(c) for j in range(i + 1, c)]
    pair_lit = F.array(
        *[F.struct(F.lit(i).alias("i"), F.lit(j).alias("j")) for i, j in pairs]
    )
    edges = (
        spark.range(k)
        .select(F.col("id").alias("g"), F.explode(pair_lit).alias("p"))
        .select(
            (F.col("g") * c + F.col("p.i")).alias("u"),
            (F.col("g") * c + F.col("p.j")).alias("v"),
        )
    )
    r = triangle_stats(edges).collect()[0]
    assert r.n_nodes == k * c
    assert r.n_edges == k * len(pairs)
    assert r.n_wedges == k * c * (c - 1) * (c - 2) // 2
    assert r.n_triangles == k * c * (c - 1) * (c - 2) // 6
    assert r.clustering_ppm == 1_000_000


def test_adamic_adar_path_graph_closed_form_at_2m_nodes(spark):
    """2M-node path graph: the only candidates are (i, i+2) pairs, one
    common neighbor each of degree 2 — exactly N-2 rows, every score
    1/ln(2)."""
    import math

    from real_time_stream_processing_engine_spark.operators.graph import (
        adamic_adar_links,
    )

    n = 2_000_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    out = adamic_adar_links(edges, deg_cap=64)
    expected = round(1.0 / math.log(2.0), 6)
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("aa_score").alias("mn"),
        F.max("aa_score").alias("mx"),
        F.sum("common_neighbors").alias("cn"),
    ).collect()[0]
    assert agg.n == n - 2
    assert agg.mn == expected and agg.mx == expected
    assert agg.cn == n - 2


def test_systematic_pps_matches_naive_window_at_5m_rows(spark):
    """5M weighted rows: the distributed-cumsum PPS sample equals the
    naive single-partition global-window formulation row for row."""
    from real_time_stream_processing_engine_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    d = spark.range(5_000_000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(997)) + 1).alias("w"),
    )
    got = sorted(
        (r.doc_id, r.stratum)
        for r in systematic_weighted_sample(d, "w", ["doc_id"], k=1000).collect()
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    tot = d.agg(F.sum("w")).collect()[0][0]
    naive = sorted(
        (r.doc_id, r.stratum)
        for r in d.select(
            "doc_id", "w", F.sum("w").over(w).alias("cum")
        )
        .filter(
            F.expr(f"(cum * 1000) div {tot}") > F.expr(f"((cum - w) * 1000) div {tot}")
        )
        .select(
            "doc_id",
            (F.expr(f"((cum - w) * 1000) div {tot}") + 1).alias("stratum"),
        )
        .collect()
    )
    assert got == naive and len(got) == 1000
