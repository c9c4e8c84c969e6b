"""As-of join and sessionization — operators Spark lacks as built-ins,
composed from DataFrame primitives (SURVEY.md custom-operator rule (a):
composition beats UDFs when semantics allow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of (most-recent-prior) join via union + running last_value.

    For each left row, attach the latest right row with the same key
    and ``right_ts <= left_ts``. Implemented as a single sort within
    key partitions — O(n log n) with ONE shuffle on the key, instead of
    the O(n·m) non-equi join a naive formulation produces. This is the
    standard scalable as-of pattern (equivalent to what point-in-time
    join libraries do); at 100 TB both sides shuffle once on the key
    and the window sorts within partitions with managed spill.

    Right rows sort before left rows at equal timestamps, so an exact
    timestamp tie matches (ASOF semantics: >=).
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_cols],
    )
    l = l.withColumn("_ts", F.col(left_ts))
    for c in right_cols:
        l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = l.select(on, "_ts", "_side", *right_cols, *[c for c in lcols if c != on]) \
        .unionByName(
            r.select(on, "_ts", "_side", *right_cols).withColumns(
                {c: F.lit(None) for c in lcols if c != on}
            )
        )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in right_cols}
    )
    return filled.filter(F.col("_side") == 1).drop("_side", "_ts")


def asof_clicks_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the most recent prior (or same-instant)
    purchase by the same user — classic point-in-time enrichment."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    out = asof_join(
        clicks,
        purchases.withColumnRenamed("p_ts", "purchase_ts").withColumnRenamed(
            "p_value", "purchase_value"
        ),
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["purchase_ts", "purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.

    Single shuffle on the user key; session ids are a running sum of
    session-start flags — fully parallel, no driver state.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_us),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(
            Window.partitionBy(user_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session metrics over events (30-min gap): session
    count, events in the longest session, avg session span seconds."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e)
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0
        ).alias("span_sec"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.avg("span_sec"), 4).alias("avg_span_sec"),
    )


def asof_tolerance_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a tolerance bound: each click gets its most
    recent prior purchase only if it happened within the last 10
    minutes — the pandas ``merge_asof(tolerance=...)`` contract, and
    the right default for feature stores (a stale state row is worse
    than none).

    Built on :func:`asof_join` (single key-shuffle + window) with the
    tolerance applied as a post-mask, so the scalable plan shape is
    unchanged. The gap is computed on integer microseconds divided
    once (``unix_micros``) — bit-identical to the oracle's
    ``epoch_us`` arithmetic, no float subtraction drift.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = asof_join(
        clicks, purchases, "user_id", "ts", "ts", ["purchase_id", "purchase_ts"]
    )
    within = F.col("purchase_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("purchase_ts"))
    ) / F.lit(1000000.0)
    return j.select(
        "user_id",
        "click_id",
        "ts",
        F.when(within, F.col("purchase_id")).alias("purchase_id"),
        F.when(within, gap).alias("gap_sec"),
    )
