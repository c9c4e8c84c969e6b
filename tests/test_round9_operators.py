"""Round-9 new operator families: grouped forecast backtest,
cross-source percentile sketch merge, PCA power iteration. Oracle
parity at sf0.01 is covered by test_oracle_parity.py; these tests pin
semantics on PLANTED inputs (a known seasonal series, a skewed source
split, an anisotropic embedding cloud) and the 100 TB plan properties
the differential oracle can't see."""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import sketches, vector
from inf2106_map_reduce_spark.operators import timeseries
from inf2106_map_reduce_spark.plans import data_shuffle_count, explain_str


# ---------------------------------------------------------------------------
# forecast_backtest
# ---------------------------------------------------------------------------


def _hourly_events(spark, counts_by_type):
    """Build an events frame with EXACTLY counts[t][h] rows in hour h."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for etype, counts in counts_by_type.items():
        for h, c in enumerate(counts):
            for _ in range(c):
                rows.append(
                    (eid, base + datetime.timedelta(hours=h, minutes=30), etype)
                )
                eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )


def test_backtest_perfect_seasonal_series(spark):
    # period-24 pattern repeated exactly: seasonal-naive is PERFECT
    # (mae 0), naive is not -> skill 0.0
    pattern = [(h % 24) % 5 + 1 for h in range(72)]
    df = _hourly_events(spark, {"click": pattern})
    r = timeseries.forecast_backtest(df).first()
    assert r.n_hours == 72 and r.n_forecasts == 48
    assert r.mae_seasonal == 0.0 and r.rmse_seasonal == 0.0
    assert r.mape_seasonal == 0.0
    assert r.mae_naive > 0.0
    assert r.skill == 0.0


def test_backtest_zero_hours_are_true_zeros(spark):
    # hour 1 of each day has NO events: the dense grid must treat it
    # as 0 (and exclude it from MAPE, which averages nonzero actuals)
    pattern = [0 if h % 24 == 1 else 2 for h in range(48)]
    df = _hourly_events(spark, {"view": pattern})
    r = timeseries.forecast_backtest(df).first()
    assert r.n_hours == 48 and r.n_forecasts == 24
    # second day repeats the first exactly -> seasonal perfect even
    # across the zero hour
    assert r.mae_seasonal == 0.0 and r.mape_seasonal == 0.0


def test_backtest_metrics_cover_same_subset(spark):
    # both models are scored on the same forecastable hours: with
    # season hours of warmup, n_forecasts = n_hours - 24 regardless
    # of which model could technically start earlier
    pattern = [3] * 30
    df = _hourly_events(spark, {"buy": pattern})
    r = timeseries.forecast_backtest(df).first()
    assert r.n_forecasts == 6
    # constant series: both models perfect, skill NULL (0/0 guarded)
    assert r.mae_seasonal == 0.0 and r.mae_naive == 0.0
    assert r.skill is None


def test_backtest_single_data_scan(spark, sf_oracle):
    plan = explain_str(
        timeseries.events_forecast_backtest(spark, sf_oracle), "simple"
    )
    # the corpus groupBy is checkpointed; spine/types/dense/lag all
    # run on the grid — no second events scan
    assert plan.count("FileScan") == 0, plan  # checkpoint cut lineage
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# percentile_sketch_merge
# ---------------------------------------------------------------------------


def test_percentile_merge_equals_direct_build(spark):
    # merging per-source sketches must equal the sketch of the union
    # even when sources are wildly skewed (one source holds one value)
    vals = [(i % 7, float(100 + i)) for i in range(500)] + [
        (99, 50000.0)
    ] * 20
    df = spark.createDataFrame(vals, "src int, v double")
    merged = sketches.percentile_sketch_merge(
        df, F.col("src"), "v"
    ).collect()
    direct = sketches.percentile_sketch_merge(
        df, F.lit(0), "v"
    ).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in direct]


def test_percentile_merge_rank_certification(spark):
    vals = [(i % 3, float(i)) for i in range(1, 10001)]
    df = spark.createDataFrame(vals, "src int, v double")
    rows = sketches.percentile_sketch_merge(df, F.col("src"), "v").collect()
    assert [r.q for r in rows] == [0.25, 0.5, 0.75, 0.9, 0.99]
    for r in rows:
        assert r.n_rows == 10000
        assert r.within_rank_bound, r
        # uniform integers: the estimate should be near q * 10000
        assert abs(r.est_value - r.q * 10000) < 1500, r


def test_percentile_merge_two_scans_only(spark, sf_oracle):
    # sketch build + rank audit: exactly two lineitem scans, both
    # pruned to the value (+ source) columns
    from inf2106_map_reduce_spark.plans import scan_columns

    df = sketches.sketch_percentile_merge(spark, sf_oracle)
    cols = scan_columns(df)
    assert len(cols) == 2, cols
    assert set().union(*cols) == {"l_extendedprice", "l_shipdate"}, cols


# ---------------------------------------------------------------------------
# pca_top_component
# ---------------------------------------------------------------------------


def test_pca_finds_planted_dominant_axis(spark):
    # cloud stretched 20x along a planted unit axis: the top component
    # must align with it (|cos| > 0.99) and explain most variance
    rng = np.random.RandomState(7)
    axis = np.zeros(64)
    axis[3], axis[40] = 0.6, 0.8
    X = rng.normal(0, 0.05, (400, 64)) + np.outer(
        rng.normal(0, 1.0, 400), axis
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(400)],
        "vec_id bigint, embedding array<float>",
    )
    rows = vector.pca_top_component(df).collect()
    assert len(rows) == 64
    v = np.array([r.loading for r in rows])
    cos = abs(float(v @ axis) / (np.linalg.norm(v) * np.linalg.norm(axis)))
    assert cos > 0.99, cos
    assert rows[0].explained_ratio > 0.8, rows[0]
    assert rows[0].n_rows == 400
    # eigenvalue ~ variance along the axis (coef ~ N(0,1) -> ~1.0)
    assert 0.5 < rows[0].eigenvalue < 2.0, rows[0]


def test_pca_matches_numpy_eigh_on_quantized_cov(spark, sf_oracle):
    # the 10-step trajectory should land within rounding of the true
    # top eigenpair of the SAME quantized covariance matrix
    from inf2106_map_reduce_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    rows = vector.pca_top_component(emb).collect()
    X = np.stack(
        [np.array(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    Xs = X * 1000.0
    Xq = np.where(Xs >= 0, np.floor(Xs + 0.5), np.ceil(Xs - 0.5))
    C = np.cov(Xq, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    top = V[:, -1]
    v = np.array([r.loading for r in rows])
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    # near-isotropic synthetic cloud -> slow power convergence; the
    # fixed 10-step trajectory is the CONTRACT (replayable), alignment
    # with the true eigenvector is the sanity direction
    assert cos > 0.5, cos
    assert abs(rows[0].eigenvalue * 1e6 - w[-1]) / w[-1] < 0.5


def test_pca_final_plan_is_constant_depth(spark, sf_oracle):
    # per-step checkpoints: the returned plan joins the LAST step's
    # checkpointed vector to the checkpointed covariance — no parquet
    # rescan, nothing growing with the step count
    df = vector.emb_pca_power(spark, sf_oracle)
    plan = explain_str(df, "simple")
    assert "Scan ExistingRDD" in plan, plan
    assert "FileScan" not in plan, plan
    assert "CartesianProduct" not in plan
    assert data_shuffle_count(df) <= 3, plan


# ---------------------------------------------------------------------------
# Randomized differential checks vs pure-Python references
# ---------------------------------------------------------------------------


def test_backtest_matches_python_reference_on_random_series(spark):
    # random sparse hourly series (gaps included) -> the operator must
    # equal a direct Python computation of the same definitions
    import math
    import random

    rng = random.Random(93)
    counts = {
        t: [rng.choice([0, 0, 1, 2, 5]) for _ in range(60)]
        for t in ("a", "b")
    }
    df = _hourly_events(spark, counts)
    got = {r.event_type: r for r in timeseries.forecast_backtest(df).collect()}
    for t, series in counts.items():
        fc = [
            (series[h], series[h - 24], series[h - 1])
            for h in range(24, 60)
        ]
        n = len(fc)
        sae_s = sum(abs(a - f) for a, f, _ in fc)
        sse_s = sum((a - f) ** 2 for a, f, _ in fc)
        sae_n = sum(abs(a - f) for a, _, f in fc)
        nz = [(a, f) for a, f, _ in fc if a > 0]
        r = got[t]
        assert r.n_hours == 60 and r.n_forecasts == n
        assert r.mae_seasonal == round(sae_s / n, 6)
        assert r.rmse_seasonal == round(math.sqrt(sse_s / n), 6)
        assert r.mape_seasonal == round(
            sum(abs(a - f) / a for a, f in nz) / len(nz), 6
        )
        assert r.mae_naive == round(sae_n / n, 6)
        if sae_n > 0:
            assert r.skill == round((sae_s / n) / (sae_n / n), 6)


def test_percentile_merge_matches_python_reference_on_random_values(spark):
    import math
    import random

    rng = random.Random(17)
    vals = [round(rng.uniform(10.0, 5000.0), 2) for _ in range(3000)]
    df = spark.createDataFrame(
        [(i % 5, v) for i, v in enumerate(vals)], "src int, v double"
    )
    W = sketches.QUANTILE_BIN_CENTS
    rows = sketches.percentile_sketch_merge(df, F.col("src"), "v").collect()
    # python reference: same integer-cents bins, same interpolation
    from collections import Counter

    bins = Counter(int(round(v * 100)) // W for v in vals)
    n = len(vals)
    svals = sorted(vals)
    for r in rows:
        target = math.ceil(r.q * float(n))
        cum = 0
        for b in sorted(bins):
            prev, cum = cum, cum + bins[b]
            if cum >= target and prev < target:
                est = round(
                    (b * float(W) + float(W) * (target - prev) / bins[b])
                    / 100.0,
                    6,
                )
                assert r.est_value == est, (r.q, r.est_value, est)
                assert r.bin_cnt == bins[b]
                break
        actual = sum(1 for v in svals if v <= r.est_value)
        assert r.actual_rank == actual
        assert r.target_rank == target
        assert r.within_rank_bound == (abs(actual - target) <= r.bin_cnt)


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------


def test_modularity_two_planted_cliques(spark):
    # two 4-cliques joined by one bridge edge, labels = the cliques:
    # m = 13; per clique e_c = 6, d_c = 13 -> Q = 2*(6/13 - (13/26)^2)
    from inf2106_map_reduce_spark.functions import dedup

    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    edges = spark.createDataFrame(
        c1 + c2 + [(4, 5)], "id_a bigint, id_b bigint"
    )
    labels = spark.createDataFrame(
        [(i, 1 if i < 5 else 5) for i in range(1, 9)],
        "doc_id bigint, community bigint",
    )
    rows = dedup.modularity(edges, labels=labels).collect()
    assert len(rows) == 2
    expected_q = round(2 * (6 / 13 - (13 / 26) ** 2), 6)
    for r in rows:
        assert r.n_nodes == 4
        assert r.internal_edges == 6
        assert r.degree_sum == 13
        assert r.modularity == expected_q
        assert r.contribution == round(6 / 13 - (13 / 26) ** 2, 6)


def test_modularity_single_community_is_zero(spark):
    # everything in one community: e_c = m, d_c = 2m -> Q = 1 - 1 = 0
    from inf2106_map_reduce_spark.functions import dedup

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "id_a bigint, id_b bigint"
    )
    labels = spark.createDataFrame(
        [(i, 1) for i in (1, 2, 3)], "doc_id bigint, community bigint"
    )
    r = dedup.modularity(edges, labels=labels).first()
    assert r.modularity == 0.0 and r.contribution == 0.0


def test_modularity_default_labels_are_lpa(spark):
    # with labels omitted the partition must be the deterministic LPA
    # trajectory over the same canonicalized edges
    from inf2106_map_reduce_spark.functions import dedup

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)],
        "id_a bigint, id_b bigint",
    )
    lpa = {
        (r.doc_id, r.community)
        for r in dedup.label_propagation(edges).collect()
    }
    got = dedup.modularity(edges).collect()
    assert {r.community for r in got} == {c for _, c in lpa}


# ---------------------------------------------------------------------------
# hourly ACF
# ---------------------------------------------------------------------------


def test_acf_constant_series_is_null(spark):
    # zero variance -> denominator 0 -> acf NULL at every lag
    df = _hourly_events(spark, {"a": [3] * 30})
    rows = timeseries.hourly_acf(df).collect()
    assert len(rows) == len(timeseries.ACF_LAGS)
    assert all(r.acf is None for r in rows)
    assert all(r.mean_n == 3.0 for r in rows)


def test_acf_alternating_series(spark):
    # x = 2,0,2,0,...,2 : lag-1 perfectly anti-correlated, lag-2
    # perfectly correlated (up to the finite-sample edge terms).
    # NB the grid spans min..max OBSERVED hour, so the series starts
    # and ends on the nonzero phase by construction (h even -> 2).
    df = _hourly_events(spark, {"a": [2 * ((h + 1) % 2) for h in range(49)]})
    rows = {r.lag: r.acf for r in timeseries.hourly_acf(df).collect()}
    assert rows[1] < -0.9
    assert rows[2] > 0.9
    # standard BIASED estimator: the lag-24 numerator has only
    # n - 24 = 25 of the 49 denominator terms, so a perfect even-lag
    # correlation reads ~25/49 ≈ 0.51, not 1.0 — that damping is the
    # estimator's defining property, assert it lands there
    assert 0.45 < rows[24] < 0.6


def test_acf_matches_python_reference_on_random_series(spark):
    import random

    rng = random.Random(41)
    series = [rng.choice([0, 1, 2, 5]) for _ in range(80)]
    # the dense grid spans min..max OBSERVED hour — anchor both ends
    # so the Python reference sees the same series the engine does
    series[0], series[-1] = 3, 3
    df = _hourly_events(spark, {"a": series})
    got = {r.lag: r.acf for r in timeseries.hourly_acf(df).collect()}
    n = len(series)
    mean = sum(series) / n
    den = sum((x - mean) ** 2 for x in series)
    for lag in timeseries.ACF_LAGS:
        num = sum(
            (series[t] - mean) * (series[t - lag] - mean)
            for t in range(lag, n)
        )
        assert abs(got[lag] - num / den) < 1e-6, lag


# ---------------------------------------------------------------------------
# nearest-neighbor join
# ---------------------------------------------------------------------------


def test_nn_join_finds_planted_identical_vector(spark):
    # query 17 is an exact copy of snapshot vector 2: identical sign
    # projections guarantee full bucket collision, so the join must
    # return it with cosine 1.0
    rng = np.random.RandomState(3)
    X = rng.normal(0, 1, (40, 64))
    X[17] = X[2]
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r for r in vector.ann_nn_join(df).collect()}
    assert 17 in got
    assert got[17].nn_id == 2 and got[17].cos_sim == 1.0
    # snapshot side must never appear as a query
    assert all(v % 10 >= 3 for v in got)
    # neighbors must all come from the snapshot side
    assert all(r.nn_id % 10 < 3 for r in got.values())


def test_nn_join_plan_is_bucket_blocked(spark, sf_oracle):
    from inf2106_map_reduce_spark.plans import explain_str

    df = vector.emb_nn_join(spark, sf_oracle)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan, plan
    # one bucketize pass: the checkpoint is the only bucket source
    assert "Scan ExistingRDD" in plan, plan


# ---------------------------------------------------------------------------
# Poisson bootstrap CI
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_true_mean(spark):
    from inf2106_map_reduce_spark.operators import stats

    rows = [(i, "g", 100.0 + (i % 21)) for i in range(2100)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    r = stats.bootstrap_mean_ci(df, "grp", "v", "id").first()
    assert r.n_rows == 2100
    assert r.mean_value == 110.0  # 100 full cycles of 100..120
    # CI must bracket the point estimate and be sane for n=2100
    # (sd ~ 6 -> se ~ 0.13 -> 95% half-width ~ 0.26)
    assert r.ci_lo < 110.0 < r.ci_hi
    assert 0.05 < r.ci_hi - r.ci_lo < 2.0, (r.ci_lo, r.ci_hi)


def test_bootstrap_ci_is_deterministic(spark):
    from inf2106_map_reduce_spark.operators import stats

    rows = [(i, "a" if i % 2 else "b", float(i % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    a = [tuple(r) for r in stats.bootstrap_mean_ci(df, "grp", "v", "id").collect()]
    b = [tuple(r) for r in stats.bootstrap_mean_ci(df, "grp", "v", "id").collect()]
    assert a == b and len(a) == 2


def test_poisson_weights_match_pmf(spark):
    # the md5-uniform -> inverse-CDF draw must reproduce Poisson(1)
    # frequencies: ~36.8% zeros, ~36.8% ones over many draws
    from inf2106_map_reduce_spark.operators import stats

    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(5000)], "id bigint, grp string, v double"
    )
    rep = stats.bootstrap_mean_ci(df, "grp", "v", "id", n_replicas=4)
    rep.collect()  # just exercises the path; now check the raw draw
    from pyspark.sql import functions as F2

    u = (
        F2.conv(
            F2.substring(
                F2.md5(F2.concat(F2.col("id").cast("string"), F2.lit(":0"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F2.lit(4294967296.0)
    )
    w = stats._poisson_weight(u)
    counts = {
        r.w: r.n
        for r in df.select(w.alias("w"))
        .groupBy("w")
        .agg(F2.count(F2.lit(1)).alias("n"))
        .collect()
    }
    n = sum(counts.values())
    assert abs(counts[0] / n - 0.3679) < 0.03
    assert abs(counts[1] / n - 0.3679) < 0.03
    assert counts.get(5, 0) / n < 0.005


# ---------------------------------------------------------------------------
# perceptual-hash near-dup
# ---------------------------------------------------------------------------


def test_phash_planted_near_identical_payloads(spark):
    from inf2106_map_reduce_spark.functions import multimodal

    base = "".join(chr(65 + (i * 7) % 26) for i in range(80))
    flipped = base[:10] + chr(ord(base[10]) + 1) + base[11:]
    docs = spark.createDataFrame(
        [
            (1, base),          # original "image"
            (2, base),          # exact re-post -> hamming 0
            (3, flipped),       # one byte nudged -> tiny hamming
            (4, base[::-1]),    # scrambled -> far
            (5, "short"),       # below one thumbnail -> excluded
        ],
        "doc_id bigint, text string",
    )
    got = {(r.id_a, r.id_b): r.hamming for r in
           multimodal.perceptual_hash_pairs(docs).collect()}
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 2
    assert all(5 not in p for p in got)


def test_phash_banding_recall_guarantee(spark):
    # exact recall for hamming <= 7: ANY pair within the accept
    # threshold (6) must be found regardless of which bits differ —
    # flip 3 bytes far apart so multiple bands are touched
    from inf2106_map_reduce_spark.functions import multimodal

    base = "".join(chr(48 + (i * 11) % 64) for i in range(64))
    mod = list(base)
    for pos in (2, 30, 60):
        mod[pos] = chr(ord(base[pos]) + 2)
    docs = spark.createDataFrame(
        [(1, base), (2, "".join(mod))], "doc_id bigint, text string"
    )
    rows = multimodal.perceptual_hash_pairs(docs).collect()
    if rows:  # found iff hamming <= 6; either way no crash and exact
        assert rows[0].hamming <= 6
    # brute check: hashes differ in <= 6 bits -> must be found
    import itertools

    def ahash(s):
        p = [ord(c) for c in s[:64]]
        t = sum(p)
        return sum((1 << j) for j in range(64) if p[j] * 64 > t)

    hd = bin(ahash(base) ^ ahash("".join(mod))).count("1")
    assert (len(rows) == 1) == (hd <= 6), (hd, rows)
