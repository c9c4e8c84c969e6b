"""Sketch accuracy: approximate aggregates stay within tolerance of
the exact answers they replace at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import sketches
from inf2106_map_reduce_spark.tables import load_table


def test_hll_distinct_within_tolerance(spark, sf_oracle):
    o = load_table(spark, sf_oracle, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["o_orderstatus"]: r["approx_distinct_o_custkey"]
        for r in sketches.approx_distinct(o, "o_custkey", ["o_orderstatus"]).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        rel_err = abs(approx[k] - n) / n
        assert rel_err < 0.05, f"{k}: HLL rel err {rel_err:.3f}"


def test_quantile_sketch_within_rank_tolerance(spark, sf_oracle):
    o = load_table(spark, sf_oracle, "orders")
    exact = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))").alias("q")
    )
    approx = sketches.approx_quantiles(o, "o_totalprice", ["o_orderstatus"])
    ex = {r["o_orderstatus"]: r["q"] for r in exact.collect()}
    ap = {
        r["o_orderstatus"]: (r["q25"], r["q50"], r["q75"], r["q95"])
        for r in approx.collect()
    }
    for k in ex:
        for e, a in zip(ex[k], ap[k]):
            assert abs(a - e) / max(abs(e), 1.0) < 0.02, f"{k}: {a} vs {e}"


def test_registry_sketch_query_audits_green(spark, sf_oracle):
    df = sketches.sketch_orders_per_status(spark, sf_oracle)
    rows = df.collect()
    assert len(rows) > 0
    assert {
        "o_orderstatus",
        "n_orders",
        "n_distinct_cust",
        "distinct_within_bound",
        "q25_within_bound",
        "q50_within_bound",
        "q75_within_bound",
        "q95_within_bound",
    } == set(df.columns)
    # the envelopes are 100x/5-sigma — every audit must pass
    for r in rows:
        assert r["distinct_within_bound"] is True, r
        for p in (25, 50, 75, 95):
            assert r[f"q{p}_within_bound"] is True, r
    # exact counts cross-check
    o = load_table(spark, sf_oracle, "orders")
    exact = {
        r["o_orderstatus"]: (r["n"], r["d"])
        for r in o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    for r in rows:
        assert (r["n_orders"], r["n_distinct_cust"]) == exact[r["o_orderstatus"]]


def test_sketch_rollup_merge_equals_direct_sketch(spark, sf_oracle):
    """Unioning per-month sketches must estimate the same cardinality
    class as sketching the whole group directly (mergeability — the
    property that makes stored sketch columns composable), and the
    envelope verdicts must be green."""
    from pyspark.sql import functions as F

    rows = sketches.sketch_rollup_orders(spark, sf_oracle).collect()
    assert rows and all(r["merged_within_bound"] is True for r in rows)
    o = load_table(spark, sf_oracle, "orders")
    direct = {
        r["o_orderstatus"]: r["est"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est"))
        .collect()
    }
    for r in rows:
        # merged estimate within 10% of the direct single-pass estimate
        d = direct[r["o_orderstatus"]]
        assert abs(d - r["n_distinct_cust"]) <= 0.1 * r["n_distinct_cust"]


def test_misra_gries_guarantees_on_planted_skew(spark):
    """Planted distribution: one item at 40%, one at 20%, noise spread
    over many distinct singletons. With m=10 the threshold is n/11, so
    both heavy items are guaranteed candidates with estimates inside
    the error envelope — across different partitionings."""
    from pyspark.sql import functions as F

    from inf2106_map_reduce_spark.functions import sketches

    rows = (["hot"] * 400 + ["warm"] * 200 + [f"x{i}" for i in range(400)])
    df = spark.createDataFrame([(w,) for w in rows], "item string")
    for n_parts in (1, 3, 16):
        out = {
            r["word"]: r
            for r in sketches.heavy_hitters_audit(
                df.repartition(n_parts), "item", m=10, top_k=5
            ).collect()
        }
        assert out["hot"]["n"] == 400 and out["warm"]["n"] == 200
        for r in out.values():
            assert r["in_sketch_ok"] is True, r
            assert r["est_within_bound"] is True, r


def test_misra_gries_summary_is_bounded_and_lower_bound(spark):
    """Each partition summary holds at most m counters, and merged
    estimates never exceed exact counts."""
    from pyspark.sql import functions as F

    from inf2106_map_reduce_spark.functions import sketches

    rows = [(f"w{i % 37}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    summaries = sketches.misra_gries_partition_summaries(df, "item", m=8)
    per_part = summaries.groupBy(F.spark_partition_id().alias("p")).count()
    assert all(r["count"] <= 8 for r in per_part.collect())
    merged = {
        r["item"]: r["est"]
        for r in summaries.groupBy("item").agg(F.sum("est").alias("est")).collect()
    }
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for item, est in merged.items():
        assert est <= exact[item], (item, est, exact[item])


def test_bloom_membership_planted_sets(spark):
    """All inserted keys must probe positive (no false negatives —
    the Bloom guarantee), and the FP count matches a pure-Python
    replay of the identical seeded-md5 hash family."""
    import hashlib

    from inf2106_map_reduce_spark.functions import sketches as sk

    build_keys = list(range(100))
    probe_keys = list(range(80, 200))  # 20 members + 100 non-members
    build = spark.createDataFrame([(k,) for k in build_keys], "id bigint")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "id bigint")
    row = sk.bloom_membership_audit(build, probe, "id", "id").collect()[0]

    def positions(key: int) -> list[int]:
        return [
            int(hashlib.md5(f"{s}:{key}".encode()).hexdigest()[:8], 16)
            % sk.BLOOM_BITS
            for s in range(sk.BLOOM_HASHES)
        ]

    bits = {p for k in build_keys for p in positions(k)}
    fp = sum(
        1
        for k in probe_keys
        if k not in set(build_keys) and all(p in bits for p in positions(k))
    )
    assert row["n_keys_inserted"] == 100
    assert row["n_bits_set"] == len(bits)
    assert row["n_probed"] == 120
    assert row["n_members"] == 20
    assert row["no_false_negatives"] is True
    assert row["n_false_positive"] == fp
    assert row["n_bloom_positive"] == 20 + fp


def test_bloom_membership_saturated_filter_still_no_false_negatives(spark):
    """Overfill the filter far past its design point: FP rate rises
    (and may breach the envelope) but false negatives remain
    impossible."""
    from inf2106_map_reduce_spark.functions import sketches as sk

    build = spark.range(0, 60_000).withColumnRenamed("id", "k")
    probe = spark.range(50_000, 62_000).withColumnRenamed("id", "k")
    row = sk.bloom_membership_audit(build, probe, "k", "k").collect()[0]
    assert row["no_false_negatives"] is True
    assert row["n_members"] == 10_000
    # ~6x overload: fill -> ~1, nearly every non-member collides
    assert row["fp_rate"] > 0.5
    # the envelope itself scales with the realized fill, so it still holds
    assert row["fp_within_bound"] is True


def test_binned_median_rollup_matches_python_reference(spark):
    """Merged-histogram interpolation and the two-bin certification
    replayed in pure Python on a skewed planted distribution."""
    import random

    from inf2106_map_reduce_spark.functions import sketches as sk

    rng = random.Random(77)
    rows = [
        ("A", 2020 + (i % 3), round(rng.lognormvariate(10.5, 0.6), 2))
        for i in range(400)
    ] + [("B", 2021, round(1000.0 + i, 2)) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, y int, v double")
    got = {
        r["g"]: r
        for r in sk.binned_median_rollup(df, "g", F.col("y"), "v").collect()
    }

    for g in ("A", "B"):
        vals = sorted(v for gg, _y, v in rows if gg == g)
        n = len(vals)
        bins: dict[int, int] = {}
        for v in vals:
            bins[int(round(v * 100)) // sk.HIST_BIN_CENTS] = (
                bins.get(int(round(v * 100)) // sk.HIST_BIN_CENTS, 0) + 1
            )
        cum = 0
        for b in sorted(bins):
            if cum < n / 2.0 <= cum + bins[b]:
                est = round(
                    (
                        b * float(sk.HIST_BIN_CENTS)
                        + sk.HIST_BIN_CENTS * (n / 2.0 - cum) / bins[b]
                    )
                    / 100.0,
                    6,
                )
                break
            cum += bins[b]
        # exact interpolated median (percentile_cont semantics)
        mid = (n - 1) * 0.5
        lo, hi = vals[int(mid)], vals[min(int(mid) + 1, n - 1)]
        exact = round(lo + (hi - lo) * (mid - int(mid)), 6)
        r = got[g]
        assert r["n_rows"] == n
        assert r["n_bins"] == len(bins)
        assert r["est_median"] == est
        assert abs(r["exact_median"] - exact) < 1e-6
        assert r["within_two_bins"] is True


def test_binned_median_merge_equals_direct_histogram(spark):
    """Merging fine-grain histograms must give byte-identical output
    to histogramming the coarse grain directly — the mergeability
    property that makes the rollup a rescan-free re-aggregation."""
    from inf2106_map_reduce_spark.functions import sketches as sk

    rows = [("G", i % 7, float(100 * i % 9973)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, shard int, v double")
    merged = sk.binned_median_rollup(df, "g", F.col("shard"), "v").collect()
    direct = sk.binned_median_rollup(df, "g", F.lit(0), "v").collect()
    assert merged == direct


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_countmin_never_underestimates_and_exact_on_real_keys(spark, sf_oracle):
    out = sketches.sketch_countmin_freq(spark, sf_oracle).collect()
    assert len(out) > 0
    assert all(r.overestimate_ok for r in out)
    # at test SF the key cardinality is far below width*depth capacity,
    # so the documented 2N/width envelope must hold everywhere
    assert all(r.within_bound for r in out)


def test_countmin_absent_key_reports_collision_noise_only(spark):
    build = spark.createDataFrame(
        [(i % 7,) for i in range(700)], "k bigint"
    )
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k bigint")
    out = sketches.countmin_audit(build, probe, "k", "k").collect()
    by_key = {r.key: r for r in out}
    # present keys: est >= exact = 100
    for k in range(7):
        assert by_key[k].exact_cnt == 100
        assert by_key[k].est_cnt >= 100
    # absent keys: exact 0, estimate is only what hash collisions
    # contribute — bounded by the largest real counter
    absents = [r for r in out if r.exact_cnt == 0]
    assert len(absents) == 2000 - 7
    assert all(0 <= r.est_cnt <= 100 for r in absents)
    # with 7 keys in 4x1024 counters, most probes collide with nothing
    assert sum(1 for r in absents if r.est_cnt == 0) > len(absents) * 0.9
