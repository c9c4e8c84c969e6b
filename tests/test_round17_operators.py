"""Round-17 operators (r14 verdict items #5-7).

FULL OUTER stream-stream join: the drain's output is pinned against an
independent pandas replay of BOTH watermark-eviction semantics (not
just the batch join), and the plan shape is asserted so the
no-data-batch policy keeps matching it structurally. DuckDB parity at
sf0.001/sf0.01 rides the shared test_oracle_parity sweep via the
registry entry.
"""

from __future__ import annotations

import pandas as pd
import pytest

from inf2106_map_reduce_spark.streaming import joins as stream_joins
from inf2106_map_reduce_spark.streaming import runtime as stream_runtime

HORIZON = pd.Timedelta(hours=1)


@pytest.fixture(scope="module")
def full_rows(spark, sf_oracle):
    return stream_joins.streaming_click_attribution_full(
        spark, sf_oracle
    ).collect()


def _events(sf_oracle: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_oracle}/events.parquet")


def _replay(sf_oracle: str):
    """Pure-pandas replay of the AvailableNow drain's semantics:
    matched pairs, clicks null-extended below wm - horizon, purchases
    null-extended below wm, wm = least(max cts, max pts) - horizon."""
    ev = _events(sf_oracle)
    c = ev[ev.event_type == "click"][["user_id", "event_id", "ts"]]
    p = ev[ev.event_type == "purchase"][["user_id", "event_id", "ts"]]
    c = c.rename(columns={"event_id": "click_id", "ts": "cts"})
    p = p.rename(columns={"event_id": "purchase_id", "ts": "pts"})
    m = c.merge(p, on="user_id")
    m = m[(m.pts >= m.cts) & (m.pts <= m.cts + HORIZON)]
    wm = min(c.cts.max(), p.pts.max()) - HORIZON
    un_c = c[~c.click_id.isin(m.click_id) & (c.cts + HORIZON < wm)]
    un_p = p[~p.purchase_id.isin(m.purchase_id) & (p.pts < wm)]
    matched = {
        (r.user_id, r.click_id, r.purchase_id) for r in m.itertuples()
    }
    left_null = {(r.user_id, r.click_id, None) for r in un_c.itertuples()}
    right_null = {
        (r.user_id, None, r.purchase_id) for r in un_p.itertuples()
    }
    return matched, left_null, right_null, wm


def test_full_outer_equals_independent_replay(full_rows, sf_oracle):
    matched, left_null, right_null, _ = _replay(sf_oracle)
    got = {(r.user_id, r.click_id, r.purchase_id) for r in full_rows}
    assert len(got) == len(full_rows)  # no duplicate emissions
    assert got == matched | left_null | right_null


def test_full_outer_emits_both_null_sides(full_rows, sf_oracle):
    """The entry exercises what its siblings can't: BOTH null-extended
    classes are non-empty at this SF, and each side's trailing
    uncertainty window is honored (no null row past its cutoff)."""
    matched, left_null, right_null, wm = _replay(sf_oracle)
    assert left_null and right_null, "fixture SF leaves a side empty"
    ev = _events(sf_oracle)
    ts_of = dict(zip(ev.event_id, ev.ts))
    for r in full_rows:
        if r.purchase_id is None:
            assert ts_of[r.click_id] + HORIZON < wm
        if r.click_id is None:
            assert ts_of[r.purchase_id] < wm


def test_full_outer_is_a_superset_of_the_left_outer_entry(
    spark, sf_oracle, full_rows
):
    """FULL OUTER minus the right-null rows IS the LEFT OUTER entry's
    output — the two drains agree row-for-row on the shared part."""
    left = stream_joins.streaming_click_attribution_outer(
        spark, sf_oracle
    ).collect()
    got_left = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in full_rows
        if r.click_id is not None
    }
    assert got_left == {
        (r.user_id, r.click_id, r.purchase_id) for r in left
    }


def test_full_outer_plan_shape_and_no_data_batch(spark, sf_oracle):
    """The analyzed streaming plan is a watermarked FullOuter join —
    the exact shape runtime.needs_no_data_batch forces the trailing
    micro-batch for (dropping it would lose every null-extended
    row)."""
    from inf2106_map_reduce_spark.tables import (
        convert_event_ts,
        raw_events_schema,
    )
    from pyspark.sql import functions as F

    schema = raw_events_schema(spark, sf_oracle)

    def _stream():
        return convert_event_ts(
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_oracle)
        ).withWatermark("ts", stream_joins.ATTRIBUTION_HORIZON)

    out = stream_joins.click_purchase_pairs(
        _stream().filter(F.col("event_type") == "click"),
        _stream().filter(F.col("event_type") == "purchase"),
        how="full_outer",
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Join FullOuter" in plan
    assert "EventTimeWatermark" in plan
    assert stream_runtime.needs_no_data_batch(out, "append")
    # the user key survives both null sides
    assert "user_id" in out.columns
