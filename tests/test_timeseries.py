"""Invariant tests for the time-series operators (the oracle-parity
suite checks values; these pin the semantic contracts that must hold at
any scale factor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.operators import timeseries
from inf2106_map_reduce_spark.tables import load_table


def test_gapfill_grid_is_dense_and_counts_conserve(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    out = timeseries.gapfill_hourly(ev).cache()
    try:
        n_types = ev.select("event_type").distinct().count()
        hours = out.select("hour").distinct().count()
        # dense grid: exactly hours x types rows, no holes
        assert out.count() == hours * n_types
        per_type = out.groupBy("event_type").count().select("count").distinct()
        assert per_type.count() == 1
        # zero-filled counts still sum to the input cardinality
        total = out.agg(F.sum("n_events")).first()[0]
        assert total == ev.count()
    finally:
        out.unpersist()


def test_gapfill_forward_fill_has_no_nulls_after_first_value(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    out = timeseries.gapfill_hourly(ev)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seen = out.withColumn("any_prior", F.max("n_events").over(w))
    bad = seen.filter(
        (F.col("any_prior") > 0) & F.col("ffill_value").isNull()
    ).count()
    assert bad == 0, "forward fill left a NULL after the first observation"


def test_scd2_intervals_chain_per_key(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    out = timeseries.scd2_intervals(ev).cache()
    try:
        # one interval per event; exactly one open (current) row per key
        assert out.count() == ev.count()
        opens = out.filter("is_current").groupBy("user_id").count()
        assert opens.filter("count != 1").count() == 0
        # intervals never invert, and valid_to always equals the next
        # valid_from (the chain has no gaps or overlaps by construction)
        assert out.filter("valid_to < valid_from").count() == 0
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("valid_from")
        chained = out.withColumn("next_from", F.lead("valid_from").over(w))
        broken = chained.filter(
            F.col("valid_to").isNotNull()
            & (F.col("valid_to") != F.col("next_from"))
        ).count()
        assert broken == 0
    finally:
        out.unpersist()


def test_event_funnel_requires_order(spark):
    """User 1 completes view->click->purchase in order; user 2 has all
    three types but the purchase precedes the click (counts only to
    step 2); user 3 only views."""
    from datetime import datetime

    from inf2106_map_reduce_spark.operators import timeseries

    def ts(h):
        return datetime(2024, 1, 1, h)

    rows = [
        (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
        (2, ts(1), "view"), (2, ts(4), "click"), (2, ts(2), "purchase"),
        (3, ts(1), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    out = {r["step"]: r["n_users"] for r in timeseries.event_funnel(df).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}
