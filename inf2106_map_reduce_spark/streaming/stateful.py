"""Stateful streaming operators over events: watermarked streaming
dedup and a custom per-key stateful aggregator (applyInPandasWithState).

``applyInPandasWithState`` is deliberately the custom-state surface
here rather than Spark 4's newer ``transformWithStateInPandas``: the
latter's driver-side runner needs the ``google.protobuf`` package,
which this execution environment lacks (verified: the streaming
Python runner crashes on import). The semantics covered are the same
(per-key state, batch-iterated Arrow input, update-mode emission);
swapping APIs when protobuf is available is a mechanical change.

The reference is strictly batch (SURVEY.md §2.5); these are the
superset streaming surface. Both run as REAL streams
(``readStream`` → Trigger.AvailableNow → memory sink) so the registry
exercises genuine streaming execution, with deterministic results the
DuckDB oracle can check:

- streaming dedup keeps only the KEY columns → result = DISTINCT keys,
  independent of which physical row survived;
- the stateful aggregator emits one final row per key from a single
  AvailableNow batch → result = batch GROUP BY.

Scale notes: ``dropDuplicatesWithinWatermark`` bounds dedup state by
event time (without the watermark, state grows with the key universe —
unusable on an unbounded stream); the applyInPandasWithState operator
keeps O(1) state per key (count/sum), the pattern for any
beyond-built-in stateful semantics (counters, ML feature windows,
anomaly flags).
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from inf2106_map_reduce_spark.streaming.runtime import (
    scoped_state_partitions,
    state_partitions_for,
)
from inf2106_map_reduce_spark.tables import (
    convert_event_ts,
    load_table,
    raw_events_schema,
)

WATERMARK = "1 hour"


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw_schema = raw_events_schema(spark, sf_dir)
    return convert_event_ts(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def _run_to_table(
    out_stream,
    spark: SparkSession,
    mode: str,
    state_keys=None,
    state_key_id: tuple | None = None,
) -> DataFrame:
    """Run to completion through a foreachBatch parquet sink and read
    the result back — no driver-side materialization (the memory sink
    collects to the driver; fine for tests, wrong as the shipped path).
    Append/update batches accumulate via mode=append; AvailableNow over
    the single events file yields one batch, so update mode emits each
    key once. ``state_keys`` (a batch projection of the state key
    columns) sizes the state partition count from the data
    (runtime.state_partitions_for)."""
    sink = tempfile.mkdtemp(prefix="stream_sink_")
    cache_key = (
        (spark.sparkContext.applicationId,) + state_key_id
        if state_key_id
        else None
    )
    with scoped_state_partitions(
        spark,
        n=state_partitions_for(state_keys, cache_key=cache_key),
        out=out_stream,
        output_mode=mode,
    ):
        q = (
            out_stream.writeStream.foreachBatch(
                lambda df, _epoch: df.repartition(1)
                .write.mode("append")
                .parquet(sink)
            )
            .outputMode(mode)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(sink)


def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: streaming dedup on (user_id, event_type) with
    watermark-bounded state; returns the distinct key set."""
    stream = _event_stream(spark, sf_dir).withWatermark("ts", WATERMARK)
    deduped = stream.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    return _run_to_table(
        deduped.select("user_id", "event_type"),
        spark,
        mode="append",
        state_keys=load_table(spark, sf_dir, "events").select(
            "user_id", "event_type"
        ),
        state_key_id=(sf_dir, "events", "user_id", "event_type"),
    )


def _user_stats_fn(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum(value)) in group state; emits the
    updated totals once per batch the key appears in."""
    if state.exists:
        cnt, sv = state.get
    else:
        cnt, sv = 0, 0.0
    for pdf in pdf_iter:
        cnt += len(pdf)
        sv += float(pdf["value"].sum())
    state.update((cnt, sv))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [cnt], "total_value": [round(sv, 2)]}
    )


def streaming_user_stats_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: custom stateful per-user aggregator via
    applyInPandasWithState (Arrow-batched, O(1) state per key)."""
    stream = _event_stream(spark, sf_dir).select("user_id", "value")
    out = stream.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="cnt bigint, sv double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_table(
        out,
        spark,
        mode="update",
        state_keys=load_table(spark, sf_dir, "events").select("user_id"),
        state_key_id=(sf_dir, "events", "user_id"),
    )
