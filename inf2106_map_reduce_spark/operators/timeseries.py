"""Time-series operators over the events table: dense resampling with
gap filling and changelog → validity-interval (SCD2) reshaping.

The reference has no time dimension at all (its data model is
``(string, string)`` pairs — SURVEY.md §1.4); these are superset
capability for the hypertable-style workloads the brief names
(rollups, resampling, late-data handling). Batch complements to the
streaming windows in :mod:`inf2106_map_reduce_spark.streaming.windows`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def gapfill_hourly(events: DataFrame) -> DataFrame:
    """Dense hourly resample per event_type: every (type, hour) cell of
    the full time range gets a row — zero-filled counts and a
    forward-filled running value for hours with no events (the "last
    observation carried forward" contract dashboards and downsampled
    hypertables expect).

    Scale: the spine is ``sequence(min_hour, max_hour)`` exploded from
    ONE aggregated row — rows = hours x types, independent of input
    cardinality — and the dimension cross join is a broadcast. The
    only corpus-sized work is the first groupBy; the forward-fill
    window partitions by event_type (bounded parallelism = #types;
    re-key to (type, day) chunks if the spine itself ever gets huge).

    Value sums use the exact integer-cents trick (sum BIGINT cents,
    divide once) so the oracle hash-matches regardless of partial-agg
    merge order.
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = events.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("ffill_value"),
        )
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Changelog → slowly-changing-dimension type-2 reshaping: each
    event row becomes a validity interval ``[valid_from, valid_to)``
    per key, closed by the next event's timestamp (open/NULL for the
    current state). The standard point-in-time-join input shape for
    feature stores and dimension history.

    Scale: one window over (key, ts) — shuffle on the key, sort within
    partition, no global sort. Ties broken by a unique id so the
    interval chain is deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return events.select(
        F.col(key_col),
        F.col("event_type").alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_hourly(load_table(spark, sf_dir, "events"))


def ts_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_intervals(load_table(spark, sf_dir, "events"))


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: per step, how many users completed the
    step sequence IN ORDER (each step strictly after their completion
    time of the previous one, using first-completion times — the
    standard product-analytics funnel semantic, not mere per-type
    presence).

    Plan: one (filter -> per-user MIN-agg -> co-partitioned join)
    chain per step. Every aggregate and join keys on ``user_col``, so
    the whole chain rides a single hash partitioning — at 100 TB the
    events scan dominates and per-step state is one row per surviving
    user. Counts are emitted as a 3-row lazy union of scalar
    aggregates — no driver actions inside the operator.
    """
    reached = None
    summaries = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ets")
        )
        if reached is None:
            reached = ev.groupBy("u").agg(F.min("ets").alias("t"))
        else:
            reached = (
                ev.join(reached, "u")
                .filter(F.col("ets") > F.col("t"))
                .groupBy("u")
                .agg(F.min("ets").alias("t"))
            )
        summaries.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: view -> click -> purchase ordered funnel."""
    return event_funnel(load_table(spark, sf_dir, "events"))


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (prev_type, next_type), the transition count
    and the row-normalized probability. The "what do users do next"
    primitive behind funnel discovery and session modeling — the
    funnel operator checks ONE hypothesized path; this surfaces all of
    them, ranked.

    Scale: one window (partitioned by user — events are already the
    natural key, no global sort) + two aggregations; the matrix is
    |types|² rows, so the epilogue is constant-sized regardless of
    input. Ordering uses (ts, id) — a total order, so lag() is
    deterministic under any partitioning.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    s = events.select(
        F.col(user_col),
        F.col(type_col).alias("next_type"),
        F.lag(type_col).over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    # |types|^2-sized; materialized so the row-normalizing total does
    # not replay the per-user window over the full event stream
    t = s.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    ).localCheckpoint(eager=True)
    tot = t.groupBy("prev_type").agg(
        F.sum("n_transitions").cast("bigint").alias("_tot")
    )
    return t.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("_tot"), 6).alias("prob"),
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: event-type transition matrix over events."""
    return transition_matrix(load_table(spark, sf_dir, "events"))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted per subsequent active week offset, with the
    retention rate against the cohort's own size. The standard
    product-analytics cohort table, all in three aggregations.

    Scale: first-seen is one min-agg per user; (user, active-week) is
    a distinct agg; the join back to cohorts is on user (same shuffle
    key); the output is |weeks|²/2 rows. Week truncation is ISO-Monday
    in both engines, and offsets are exact integer day-diffs DIV 7 —
    no float date math.
    """
    # user-sized; materialized because both the offset join and the
    # cohort-size base consume it (no cross-branch CSE)
    firsts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    ).localCheckpoint(eager=True)
    active = (
        events.select(
            F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("week")
        )
        .distinct()
    )
    pairs = active.join(firsts, user_col).select(
        "cohort_week",
        F.expr("CAST(datediff(week, cohort_week) DIV 7 AS INT)").alias(
            "week_offset"
        ),
    )
    counts = pairs.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    base = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("_cohort_size")
    )
    return counts.join(base, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.round(F.col("n_users") / F.col("_cohort_size"), 6).alias(
            "retention"
        ),
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: weekly retention triangle over events."""
    return retention_cohorts(load_table(spark, sf_dir, "events"))


def volume_anomaly_zscores(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-event-type daily volume anomaly detection: each day's count
    is scored against ITS TYPE's own distribution (z = (n - mean) /
    stddev over the type's daily counts) — the pipeline-monitoring
    primitive behind "did yesterday's crawl double-ingest?" alarms.

    Scale: one (type, day) count aggregation — map-side combinable —
    then per-type moments over the tiny (types x days) table and a
    broadcast join back. Nothing touches raw events twice.

    Determinism: mean/stddev computed from integer counts via explicit
    sums (n, sum, sum of squares — population variance), every derived
    float rounded; z rounded to 6. Types with a single day (stddev 0)
    emit z = 0.0 rather than NULL/inf.
    """
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_days")
    var = F.col("s2") / F.col("n_days") - mean * mean
    joined = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n",
        F.round(mean, 6).alias("mean_n"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("stddev_n"),
    )
    z = F.when(
        F.col("stddev_n") > 0.0,
        F.round((F.col("n") - F.col("mean_n")) / F.col("stddev_n"), 6),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "event_type",
        "day",
        "n",
        "mean_n",
        "stddev_n",
        z.alias("zscore"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def events_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-type daily volume z-scores over events."""
    return volume_anomaly_zscores(load_table(spark, sf_dir, "events"))


#: Truncated-EWMA filter parameters: smoothing alpha = 0.3 and a
#: 14-tap horizon (0.7^14 ≈ 0.7% residual weight — the dropped tail).
#: A FIR truncation rather than the textbook recursive form because
#: the recursion is a sequential scan (unbounded window state, and a
#: trajectory no SQL oracle can replay without per-row recursion); the
#: truncated form is ONE bounded window pass, embarrassingly parallel
#: per key, and renders as the identical lag-chain expression in the
#: DuckDB oracle.
EWMA_ALPHA = 0.3
EWMA_TAPS = 14


def ewma_volume(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = EWMA_ALPHA,
    taps: int = EWMA_TAPS,
    calendar: bool = False,
) -> DataFrame:
    """Truncated exponentially-weighted moving average of daily event
    volume per type, with a spike flag — the smoother behind
    "ingest volume just jumped" alarms where the plain z-score
    (:func:`volume_anomaly_zscores`) is too twitchy on trending
    series: EWMA tracks the trend, so only deviations FROM the trend
    flag.

    ewma(t) = Σ_{j=0..taps-1} (1-α)^j · n(prev_j(t)) / Σ_present
    (1-α)^j, where prev_j(t) is the j-th previous OBSERVED day of the
    type's series (row-offset lags, deliberately: a lag chain over the
    observed rows). On a gapless daily series this equals the calendar
    formula; across a gap the weights apply to the nearest observed
    days rather than decaying through empty calendar days — i.e. the
    smoother treats the series as a sequence of observations, the
    standard trading-days convention. ``calendar=True`` is the
    calendar-decay form: it densifies onto a zero-filled day spine
    first (registered as ``events_ewma_calendar``), so the weights
    decay through the gaps. The weight sum renormalizes at series edges
    (first rows have fewer lags), so early days aren't biased toward
    zero.

    Scale: the corpus-sized work is one (type, day) count aggregate
    (map-side combinable); the window runs over the tiny types×days
    table, partitioned by type — ``taps`` lag terms in ONE window pass
    (a rowsBetween frame can't weight by distance, a lag chain can).

    Determinism: counts are integers, weights are double literals, and
    both engines evaluate the SAME written left-to-right term chain —
    then one round(6). The spike test compares against the PRIOR day's
    EWMA (lag of the rounded column), so a spike doesn't suppress
    itself by lifting its own average.
    """
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if calendar:
        # densify onto each type's calendar day spine (zero-filled)
        # BEFORE the lag chain, so row offset j == calendar day j and
        # the weights decay through empty days — the gapfill_hourly
        # spine technique composed with the smoother
        spine = (
            daily.groupBy("event_type")
            .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
            .select(
                "event_type",
                F.explode(
                    F.sequence(
                        F.col("_d0"),
                        F.col("_d1"),
                        F.expr("INTERVAL 1 DAY"),
                    )
                ).alias("day"),
            )
        )
        daily = spine.join(daily, ["event_type", "day"], "left").select(
            "event_type",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    den = None
    for j in range(taps):
        wt = (1.0 - alpha) ** j
        lagged = F.lag("n", j).over(w) if j else F.col("n")
        term = F.when(lagged.isNotNull(), lagged * F.lit(wt)).otherwise(
            F.lit(0.0)
        )
        wterm = F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    scored = daily.select(
        "event_type", "day", "n", F.round(num / den, 6).alias("ewma")
    )
    w2 = Window.partitionBy("event_type").orderBy("day")
    prior = F.lag("ewma").over(w2)
    return scored.select(
        "*",
        F.round(F.col("n") - prior, 6).alias("deviation"),
        (prior.isNotNull() & (F.col("n") > 2.0 * prior)).alias("is_spike"),
    )


def events_ewma_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: truncated-EWMA daily volume smoother + spike
    flags over events (observed-day lag semantics)."""
    return ewma_volume(load_table(spark, sf_dir, "events"))


def events_ewma_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the CALENDAR-decay EWMA variant — the daily
    series is densified onto each type's zero-filled day spine before
    the lag chain, so the weights decay through empty calendar days
    and a spike after a quiet gap is compared against a properly
    decayed trend (the failure mode of the observed-day form on gappy
    series)."""
    return ewma_volume(load_table(spark, sf_dir, "events"), calendar=True)


#: Linear multi-touch lookback: clicks within 7 days before a purchase
#: share its value equally.
ATTRIBUTION_WINDOW_DAYS = 7


def multitouch_attribution(
    events: DataFrame,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    window_days: int = ATTRIBUTION_WINDOW_DAYS,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion's value is
    split EQUALLY across that user's touch events in the lookback
    window (strictly before the conversion), then rolled up to the
    touch day — the marketing-analytics counterpart of the as-of
    join's last-touch model (:mod:`..operators.asof`), which credits
    only the nearest touch.

    Scale: conversions ⋈ touches is an equi-join on user_id with the
    time window as a residual range predicate — the shuffle key is the
    user, so fan-out is bounded by per-user touch×conversion density,
    never corpus². The per-conversion touch count is a window over the
    join output (same user partitioning, no extra shuffle).

    Determinism: per-touch credit rounds to 9 before the day rollup,
    and the day rollup folds credits in (conversion id, touch id)
    order — the summation-order-proofing every float aggregate here
    uses.
    """
    touches = events.filter(F.col("event_type") == touch_type).select(
        F.col("user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
    )
    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col("user_id"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
        F.col("value"),
    )
    j = conv.join(touches, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {window_days} DAYS")
        )
    )
    w = Window.partitionBy("conv_id")
    credited = j.select(
        F.date_trunc("day", F.col("touch_ts")).alias("touch_day"),
        "conv_id",
        "touch_id",
        F.round(
            F.col("value") / F.count(F.lit(1)).over(w), 9
        ).alias("credit"),
    )
    return credited.groupBy("touch_day").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("conv_id").alias("n_conversions"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("conv_id", "touch_id", "credit"))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["credit"],
            ),
            6,
        ).alias("attributed_value"),
    )


def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: linear multi-touch click attribution by day."""
    return multitouch_attribution(load_table(spark, sf_dir, "events"))


#: Order-activity interval half-length: each order opens a 30-day
#: activity window; overlapping windows merge into islands.
ACTIVITY_WINDOW_DAYS = 30


def activity_islands(
    orders: DataFrame,
    key_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    window_days: int = ACTIVITY_WINDOW_DAYS,
) -> DataFrame:
    """Interval coalescing (gaps-and-islands over SPANS): each order
    opens a ``[date, date + window_days)`` activity interval per
    customer; overlapping/touching intervals merge into islands, and
    the output is one row per customer with island count and coverage
    stats. The classic warehouse interval-union — distinct from
    point-gap sessionization (:func:`..streaming` session windows): a
    new island starts only when an interval's START clears the running
    MAX of every prior interval's END, which handles intervals that
    CONTAIN later ones (a lag-gap test would wrongly split those).

    Scale: one window over (key, start, end) — shuffle on the
    customer key, sort within partition — then one aggregate. No
    join, no global sort; output is customer-sized.

    Determinism: pure integer date arithmetic (day diffs), no floats.
    """
    iv = orders.select(
        F.col(key_col).alias("custkey"),
        F.to_date(date_col).alias("start"),
        F.date_add(F.to_date(date_col), window_days).alias("end"),
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "custkey",
        "start",
        "end",
        # strictly-greater: an interval starting ON the running max end
        # touches it (half-open intervals) and merges
        (
            F.col("start") > F.coalesce(F.max("end").over(w), F.lit("0001-01-01").cast("date"))
        )
        .cast("int")
        .alias("is_new"),
    )
    w2 = (
        Window.partitionBy("custkey")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "custkey", "start", "end", F.sum("is_new").over(w2).alias("island_id")
    )
    per_island = islands.groupBy("custkey", "island_id").agg(
        F.min("start").alias("i_start"),
        F.max("end").alias("i_end"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return per_island.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_orders").alias("n_orders"),
        F.sum(F.datediff("i_end", "i_start")).cast("bigint").alias(
            "covered_days"
        ),
        F.max(F.datediff("i_end", "i_start")).cast("int").alias(
            "longest_island_days"
        ),
    )


def orders_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-customer order-activity interval coalescing."""
    return activity_islands(load_table(spark, sf_dir, "orders"))


def sequence_patterns(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Sequential pattern mining over per-user event streams — the
    MATCH_RECOGNIZE-style question :func:`event_funnel` does NOT
    answer: not "did the user ever do A then B then C" (first-
    completion funnel) but "how many times did the EXACT consecutive
    run A,B,C occur" (``n_contiguous``) plus the subsequence form with
    arbitrary events between (``has_gapped``).

    Technique: each user's event types, ordered by (ts, event_id),
    become one SPACE-JOINED STRING; the contiguous pattern is then a
    ``regexp_count`` and the gapped pattern an ``rlike`` — both
    whole-stage-codegen JVM regex over one row per user, no iteration,
    no UDF. Exactness precondition (documented, not assumed): the
    event-type vocabulary is a closed set in which no type is a
    substring of another, so unpadded matching cannot cross token
    boundaries.

    Scale: one shuffle on the user key; per-user state is that user's
    event-type sequence (the sessionization-family caveat — bounded by
    per-user activity, not corpus size). The regex runs over
    user-sequence-length strings, linear, codegen'd.
    """
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(type_col).alias("e"),
                )
            )
        ),
        lambda x: x["e"],
    )
    contiguous = " ".join(steps)
    gapped = ".*".join(steps)
    return (
        events.groupBy(F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(" ", ordered).alias("_seq"),
        )
        .select(
            user_col,
            "n_events",
            F.regexp_count(F.col("_seq"), F.lit(contiguous)).alias(
                "n_contiguous"
            ),
            F.col("_seq").rlike(gapped).alias("has_gapped"),
        )
    )


def events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-user view,click,purchase run counts
    (contiguous) and gapped-subsequence presence."""
    return sequence_patterns(load_table(spark, sf_dir, "events"))


#: Seasonal period for the hourly backtest: 24 hours (daily cycle) —
#: the standard strong seasonality of event-volume series.
SEASONAL_LAG_HOURS = 24


def _dense_hourly_counts(
    events: DataFrame, type_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Dense (event_type, hour, n) count grid — the shared spine of
    the forecast backtest and the autocorrelation audit: missing hours
    are true zeros of a count series (the gapfill contract). One
    corpus groupBy (checkpointed); the spine explode and broadcast
    type cross join run on the types × hours grid only."""
    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    bounds = hourly.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    types = hourly.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def forecast_backtest(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    season: int = SEASONAL_LAG_HOURS,
) -> DataFrame:
    """Grouped forecast backtest: score the SEASONAL-NAIVE forecaster
    (predict this hour = the count ``season`` hours ago) against the
    NAIVE one (predict this hour = last hour) on each event type's
    dense hourly count series — one row per type with
    ``(n_hours, n_forecasts, mae_seasonal, rmse_seasonal,
    mape_seasonal, mae_naive, skill)``. ``skill`` < 1 means the
    seasonal model beats naive — the go/no-go number a capacity
    forecast pipeline backtests before trusting a model family.

    Semantics: the series is the DENSE hourly grid (missing hours are
    true zeros of a count series, not missing data — the gapfill
    contract), so ``lag(season) ROWS`` is exactly "the same hour
    yesterday"; the first ``season`` hours have no seasonal forecast
    and are excluded from every metric (both models are scored on the
    same forecastable subset, or the comparison is biased). MAPE is
    averaged over hours with a nonzero actual (the standard dodge for
    its zero-actual singularity); MAE/RMSE cover all forecast hours.

    Scale: one corpus groupBy builds the (type x hour) counts
    (map-side combined, checkpointed — the volume_anomaly discipline);
    the spine explode, the broadcast type cross join and the per-type
    lag window all run on the types x hours grid, whose size is
    independent of event cardinality. Per-type windows bound
    parallelism at #types, same trade as gapfill_hourly.

    Determinism: counts are integers, so MAE/RMSE reduce to integer
    sums divided once; the MAPE sum is the only float fold (per-term
    |a-f|/a with small-int numerators), whose order jitter is ~n·eps —
    far below the round-6 output quantum.
    """
    dense = _dense_hourly_counts(events, type_col, ts_col)
    w = Window.partitionBy("event_type").orderBy("hour")
    scored = dense.select(
        "event_type",
        "n",
        F.lag("n", season).over(w).alias("f_seasonal"),
        F.lag("n", 1).over(w).alias("f_naive"),
    ).filter(F.col("f_seasonal").isNotNull())
    ae_s = F.abs(F.col("n") - F.col("f_seasonal"))
    ae_n = F.abs(F.col("n") - F.col("f_naive"))
    agg = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.sum(ae_s).alias("_sae_s"),
        F.sum(ae_s * ae_s).alias("_sse_s"),
        F.sum(ae_n).alias("_sae_n"),
        F.sum(F.when(F.col("n") > 0, ae_s / F.col("n"))).alias("_sape"),
        F.sum((F.col("n") > 0).cast("long")).alias("_n_nonzero"),
    )
    mae_s = F.col("_sae_s") / F.col("n_forecasts")
    mae_n = F.col("_sae_n") / F.col("n_forecasts")
    return agg.select(
        "event_type",
        (F.col("n_forecasts") + F.lit(season)).alias("n_hours"),
        "n_forecasts",
        F.round(mae_s, 6).alias("mae_seasonal"),
        F.round(F.sqrt(F.col("_sse_s") / F.col("n_forecasts")), 6).alias(
            "rmse_seasonal"
        ),
        F.when(
            F.col("_n_nonzero") > 0,
            F.round(F.col("_sape") / F.col("_n_nonzero"), 6),
        ).alias("mape_seasonal"),
        F.round(mae_n, 6).alias("mae_naive"),
        F.when(F.col("_sae_n") > 0, F.round(mae_s / mae_n, 6)).alias(
            "skill"
        ),
    ).orderBy("event_type")


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: seasonal-naive vs naive hourly volume backtest
    per event type (24-hour season)."""
    return forecast_backtest(load_table(spark, sf_dir, "events"))


#: ACF lags: short-range (1-3) plus the daily season — the lag-24
#: peak is the quantitative evidence behind forecast_backtest's
#: 24-hour seasonal choice.
ACF_LAGS = (1, 2, 3, 24)


def hourly_acf(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    lags: tuple[int, ...] = ACF_LAGS,
) -> DataFrame:
    """Autocorrelation of each event type's dense hourly count series
    at fixed lags — the season-detection primitive behind the
    seasonal-naive backtest (a daily cycle shows up as an ACF peak at
    lag 24; white-noise volume decays immediately). Standard sample
    ACF: ``r_l = Σ_{t>l}(x_t − x̄)(x_{t−l} − x̄) / Σ_t(x_t − x̄)²``
    with the mean and denominator over the FULL series. One row per
    (event_type, lag).

    Determinism: the estimator is expanded into INTEGER moments —
    ``Σ x_t·x_{t−l}``, ``Σ x_t``, ``Σ x_{t−l}`` over the overlap and
    ``Σ x``, ``Σ x²``, ``n`` over the series, all exact int64 sums —
    so ``r_l`` is a fixed-structure double expression with ZERO
    cross-engine summation jitter (the same trick the chi-square and
    OLS entries use). Scale: the single corpus groupBy comes from the
    shared dense-grid stage; the lag window and the moment aggregate
    run on the types × hours grid.
    """
    dense = _dense_hourly_counts(events, type_col, ts_col)
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = dense.select(
        "event_type",
        "n",
        *[F.lag("n", lag).over(w).alias(f"_l{lag}") for lag in lags],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("_s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("_s2"),
    ]
    for lag in lags:
        x, y = F.col("n"), F.col(f"_l{lag}")
        aggs.extend(
            [
                F.sum(F.when(y.isNotNull(), x * y))
                .cast("long")
                .alias(f"_sxy{lag}"),
                F.sum(F.when(y.isNotNull(), x))
                .cast("long")
                .alias(f"_sx{lag}"),
                F.sum(F.when(y.isNotNull(), y))
                .cast("long")
                .alias(f"_sy{lag}"),
                F.sum(y.isNotNull().cast("long"))
                .cast("long")
                .alias(f"_np{lag}"),
            ]
        )
    mom = lagged.groupBy("event_type").agg(*aggs)
    mean = F.col("_s1").cast("double") / F.col("n_hours")
    den = F.col("_s2").cast("double") - F.col("n_hours") * mean * mean
    per_lag = [
        F.struct(
            F.lit(lag).alias("lag"),
            F.when(
                den > 0,
                F.round(
                    (
                        F.col(f"_sxy{lag}").cast("double")
                        - mean * F.col(f"_sx{lag}")
                        - mean * F.col(f"_sy{lag}")
                        + F.col(f"_np{lag}") * mean * mean
                    )
                    / den,
                    6,
                ),
            ).alias("acf"),
        )
        for lag in lags
    ]
    return (
        mom.select(
            "event_type",
            "n_hours",
            F.round(mean, 6).alias("mean_n"),
            F.explode(F.array(*per_lag)).alias("_e"),
        )
        .select(
            "event_type",
            F.col("_e.lag").alias("lag"),
            F.col("_e.acf").alias("acf"),
            "n_hours",
            "mean_n",
        )
        .orderBy("event_type", "lag")
    )


def events_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: hourly-count autocorrelation per event type at
    lags 1, 2, 3 and 24 (the daily-season evidence)."""
    return hourly_acf(load_table(spark, sf_dir, "events"))
