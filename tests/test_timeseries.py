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


def test_transition_matrix_planted_sequences(spark):
    """Two users with known paths; probabilities row-normalize per
    prev_type and lag respects the (ts, id) total order."""
    from datetime import datetime

    from inf2106_map_reduce_spark.operators import timeseries

    rows = [
        # user 1: a -> b -> a -> c     user 2: a -> b
        (1, datetime(2024, 1, 1, 0), 1, "a"),
        (2, datetime(2024, 1, 1, 1), 1, "b"),
        (3, datetime(2024, 1, 1, 2), 1, "a"),
        (4, datetime(2024, 1, 1, 3), 1, "c"),
        (5, datetime(2024, 1, 1, 0), 2, "a"),
        (6, datetime(2024, 1, 1, 1), 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["prob"])
        for r in timeseries.transition_matrix(df).collect()
    }
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_transition_matrix_tiebreak_on_same_timestamp(spark):
    """Equal timestamps order by event_id — the matrix must be
    deterministic, not partition-dependent."""
    from datetime import datetime

    from inf2106_map_reduce_spark.operators import timeseries

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(2, t, 1, "b"), (1, t, 1, "a"), (3, t, 1, "c")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    ).repartition(7)
    got = {
        (r["prev_type"], r["next_type"])
        for r in timeseries.transition_matrix(df).collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_retention_cohorts_planted_weeks(spark):
    """User first seen in week 0 returning in week 2 lands at
    offset 2; retention is n/cohort_size."""
    from datetime import datetime

    from inf2106_map_reduce_spark.operators import timeseries

    rows = [
        # cohort Mon 2024-01-01: users 1 and 2; user 1 returns wk+2
        (1, datetime(2024, 1, 2), 1, "a"),
        (2, datetime(2024, 1, 3), 2, "a"),
        (3, datetime(2024, 1, 16), 1, "a"),
        # cohort Mon 2024-01-08: user 3
        (4, datetime(2024, 1, 10), 3, "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): (r["n_users"], r["retention"])
        for r in timeseries.retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 0): (2, 1.0),
        ("2024-01-01 00:00:00", 2): (1, 0.5),
        ("2024-01-08 00:00:00", 0): (1, 1.0),
    }


def test_volume_anomalies_flags_planted_spike(spark):
    """9 normal days + one 10x spike: only the spike day crosses
    |z| > 2; a single-day type emits z = 0.0."""
    from datetime import datetime

    from inf2106_map_reduce_spark.operators import timeseries

    rows = []
    eid = 0
    for d in range(1, 10):
        for _ in range(10):
            rows.append((eid, datetime(2024, 3, d, 12), 1, "click")); eid += 1
    for _ in range(100):
        rows.append((eid, datetime(2024, 3, 10, 12), 1, "click")); eid += 1
    rows.append((eid, datetime(2024, 3, 5, 9), 2, "solo"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = timeseries.volume_anomaly_zscores(df).collect()
    clicks = {str(r["day"])[:10]: r for r in out if r["event_type"] == "click"}
    assert clicks["2024-03-10"]["is_anomaly"] is True
    assert all(
        not clicks[d]["is_anomaly"] for d in clicks if d != "2024-03-10"
    )
    solo = [r for r in out if r["event_type"] == "solo"][0]
    assert solo["zscore"] == 0.0 and solo["is_anomaly"] is False
