"""Round-15 operators: the per-segment quantile-binned booster
(grouped gbt_boost over grouped bucket maps — SURVEY §7.9), plus the
grouped forms of quantile_bucket_map / _quantile_stump_binned it
composes. The streaming additions (grouped upsert retention, DLQ
epoch-age retention) are tested in their own sections below as they
land."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.operators import stats
from inf2106_map_reduce_spark.plans import explain_str
from inf2106_map_reduce_spark.tables import load_table


def _seg_lineitem(spark, sf_oracle):
    return load_table(spark, sf_oracle, "lineitem").withColumn(
        "seg", F.col("l_linestatus")
    )


def test_status_quantile_gbt_matches_per_segment_runs(spark, sf_oracle):
    """The grouped trainer is definitionally the global trainer run on
    each segment's filtered slice with slice-fit bucket maps: stages,
    splits, leaf values, and scores must coincide EXACTLY (identical
    integer counts through identical IEEE expression trees — no
    tolerance needed)."""
    grouped = {
        (r["seg"], r["stage"]): r
        for r in stats.lineitem_status_quantile_gbt(
            spark, sf_oracle
        ).collect()
    }
    li = load_table(spark, sf_oracle, "lineitem")
    segs = [r[0] for r in li.select("l_linestatus").distinct().collect()]
    n_checked = 0
    for seg in segs:
        sl = li.filter(F.col("l_linestatus") == seg)
        solo = stats.gbt_boost(
            None, 2, binned=stats._quantile_stump_binned(sl)
        ).collect()
        for r in solo:
            g = grouped[(seg, r["stage"])]
            assert tuple(g)[1:] == tuple(r), (seg, tuple(r), tuple(g))
            n_checked += 1
    assert n_checked == len(grouped) == 2 * len(segs)


def test_status_quantile_gbt_plan_is_one_scan_per_stage(spark, sf_oracle):
    """The grouped trainer keeps the LightGBM cost model: K = 2 stages
    = exactly 2 live lineitem scans for ALL segments together (the
    per-segment bucket maps arrive as checkpointed broadcasts, the
    stage winner join is a broadcast on the segment key)."""
    df = stats.lineitem_status_quantile_gbt(spark, sf_oracle)
    plan = explain_str(df, "formatted")
    assert plan.count("lineitem.parquet") == 2, plan
    assert "ExistingRDD" in plan  # the checkpointed bucket maps
    assert "CollectLimit" not in plan
    assert "BatchEvalPython" not in plan


def test_status_quantile_gbt_emits_full_trajectories(spark, sf_oracle):
    rows = stats.lineitem_status_quantile_gbt(spark, sf_oracle).collect()
    li = load_table(spark, sf_oracle, "lineitem")
    segs = {r[0] for r in li.select("l_linestatus").distinct().collect()}
    assert {r["seg"] for r in rows} == segs
    for seg in segs:
        assert sorted(r["stage"] for r in rows if r["seg"] == seg) == [1, 2]
    # scores are finite and leaf populations partition each segment
    for r in rows:
        assert r["n_left"] > 0 and r["n_right"] > 0


def test_grouped_bucket_map_matches_grouped_quantile_bins(
    spark, sf_oracle
):
    """The grouped (fb -> bucket) map materializes grouped
    quantile_bins' closed form: folding the map back to per-(seg,
    bucket) fine-bin ranges must reproduce quantile_bins' lo/hi bins
    exactly."""
    df = _seg_lineitem(spark, sf_oracle)
    m = stats.quantile_bucket_map(
        df, "l_extendedprice", stats.QTL_FINE_WIDTH, group_cols=("seg",)
    )
    folded = {
        (r["seg"], r["bucket"]): (r["lo"], r["hi"])
        for r in m.groupBy("seg", "bucket")
        .agg(F.min("fb").alias("lo"), F.max("fb").alias("hi"))
        .collect()
    }
    bins = stats.quantile_bins(
        df, "l_extendedprice", group_cols=("seg",)
    ).collect()
    assert len(bins) == len(folded)
    for r in bins:
        assert folded[(r["seg"], r["bucket"])] == (
            r["lo_bin"], r["hi_bin"],
        ), (r["seg"], r["bucket"])


def test_grouped_binned_frame_routes_every_row(spark, sf_oracle):
    """The grouped map joins lose nothing: every lineitem row appears
    exactly once per segment in the grouped binned frame (inner joins
    against maps built from the same rows by the same expression)."""
    df = _seg_lineitem(spark, sf_oracle)
    binned = stats._quantile_stump_binned(df, group_cols=("seg",))
    got = {
        r["seg"]: r["n"]
        for r in binned.groupBy("seg").count()
        .withColumnRenamed("count", "n").collect()
    }
    want = {
        r["seg"]: r["n"]
        for r in df.groupBy("seg").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_grouped_gbt_rejects_reserved_group_cols(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    binned = stats._stump_binned(li).withColumn("f1", F.lit("x"))
    with pytest.raises(ValueError, match="collide with internal"):
        stats.gbt_boost(None, 2, binned=binned, group_cols=("f1",))
