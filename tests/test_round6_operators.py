"""Planted-data semantics tests for the round-6 operators (oracle
parity pins engine==DuckDB; these pin that BOTH mean what the
docstrings claim)."""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F

from inf2106_map_reduce_spark.operators.linkage import fuzzy_pairs
from inf2106_map_reduce_spark.operators.timeseries import (
    activity_islands,
    ewma_volume,
    multitouch_attribution,
)
from inf2106_map_reduce_spark.functions.pipeline import bigram_logprob


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour, 0, 0)


def test_islands_merge_contained_and_touching_intervals(spark):
    # customer 1: [d1, d31) then [d5, d35) overlapping -> one island;
    # [d40, d70) contains nothing after but [d45, d50)-style contained
    # intervals must NOT split the island even though a lag-gap test
    # would (the running-max rationale)
    orders = spark.createDataFrame(
        [
            (1, _ts(1)),   # [01-01, 01-31)
            (1, _ts(5)),   # overlaps -> same island
            (2, _ts(1)),   # [01-01, 01-31)
            (2, _ts(2)),   # [01-02, 02-01) contained-ish, extends
            (2, _ts(3)),   # contained within running span
        ],
        "o_custkey long, o_orderdate timestamp",
    )
    out = {
        r["custkey"]: r.asDict()
        for r in activity_islands(orders, window_days=30).collect()
    }
    assert out[1]["n_islands"] == 1 and out[1]["n_orders"] == 2
    assert out[1]["covered_days"] == 34  # jan1 .. feb4
    assert out[2]["n_islands"] == 1 and out[2]["covered_days"] == 32


def test_islands_split_on_gap(spark):
    orders = spark.createDataFrame(
        [(1, _ts(1)), (1, datetime.datetime(2024, 3, 1))],
        "o_custkey long, o_orderdate timestamp",
    )
    row = activity_islands(orders, window_days=30).collect()[0]
    assert row["n_islands"] == 2
    assert row["covered_days"] == 60
    assert row["longest_island_days"] == 30


def test_ewma_first_day_equals_count_and_spike_uses_prior(spark):
    # one type, counts 4, 4, 20: day1 ewma = 4 (renormalized single
    # tap), day3 is a spike vs the PRIOR day's ewma, not its own
    rows = (
        [(i, _ts(1), "click") for i in range(4)]
        + [(10 + i, _ts(2), "click") for i in range(4)]
        + [(100 + i, _ts(3), "click") for i in range(20)]
    )
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = sorted(
        ewma_volume(events).collect(), key=lambda r: r["day"]
    )
    assert out[0]["ewma"] == 4.0 and out[0]["deviation"] is None
    assert out[0]["is_spike"] is False
    assert out[1]["ewma"] == 4.0  # (4 + 4*0.7) / 1.7
    assert out[2]["is_spike"] is True  # 20 > 2 * 4.0
    # day-3 ewma already absorbs the spike; the flag compared vs 4.0
    assert out[2]["ewma"] > 10


def test_multitouch_splits_value_equally_and_respects_window(spark):
    # user 1: two clicks before the purchase (one inside the window,
    # one 10 days earlier -> excluded), one click AFTER (excluded)
    events = spark.createDataFrame(
        [
            (1, 1, _ts(20, 10), "purchase", 30.0),
            (2, 1, _ts(20, 8), "click", 0.0),   # credited
            (3, 1, _ts(19, 8), "click", 0.0),   # credited
            (4, 1, _ts(5), "click", 0.0),       # outside 7d
            (5, 1, _ts(21), "click", 0.0),      # after conversion
        ],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double",
    )
    out = multitouch_attribution(events).collect()
    by_day = {r["touch_day"].day: r for r in out}
    assert set(by_day) == {19, 20}
    assert by_day[19]["attributed_value"] == 15.0
    assert by_day[20]["attributed_value"] == 15.0
    assert by_day[19]["n_conversions"] == 1


def test_fuzzy_pairs_respect_blocking_and_distance(spark):
    df = spark.createDataFrame(
        [
            (1, "ana", 1, "A"),
            (2, "anb", 1, "A"),   # distance 1, same block -> pair
            (3, "ana", 2, "A"),   # same name, different nation -> no
            (4, "xyz", 1, "A"),   # distance 3 -> no
            (5, "ana", 1, "B"),   # different segment -> no
        ],
        "id long, name string, nat int, seg string",
    )
    out = fuzzy_pairs(df, "id", "name", ["nat", "seg"]).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in out] == [(1, 2, 1)]


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b a b" and "a b" -> bigrams doc1: (a,b)x2? no:
    # a-b, b-a, a-b => tf(a,b)=2, tf(b,a)=1; doc2: a-b
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in bigram_logprob(docs).collect()}
    # corpus: c12(a,b)=3, c12(b,a)=1; c1(a)=3, c1(b)=1; V=2
    p_ab = (3 + 1) / (3 + 2)
    p_ba = (1 + 1) / (1 + 2)
    t_ab2 = round(2 * math.log(p_ab), 9)
    t_ba = round(1 * math.log(p_ba), 9)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == round((t_ab2 + t_ba) / 3, 6)
    assert out[2]["avg_logprob"] == round(round(math.log(p_ab), 9), 6)


def test_dq_expectations_all_pass_on_testdata(spark, sf_smoke):
    from inf2106_map_reduce_spark.operators.relational import (
        dq_expectations_orders,
    )

    rows = dq_expectations_orders(spark, sf_smoke).collect()
    assert len(rows) == 6
    assert all(r["passed"] for r in rows)
    assert all(r["n_violations"] == 0 for r in rows)


def test_distinct_overlap_estimates_inside_envelope(spark, sf_smoke):
    from inf2106_map_reduce_spark.functions.sketches import (
        sketch_distinct_overlap,
    )

    rows = sketch_distinct_overlap(spark, sf_smoke).collect()
    assert len(rows) == 3
    assert all(r["overlap_within_bound"] for r in rows)
    # sanity: inclusion-exclusion identity holds exactly on the exact
    # counts carried alongside the sketch verdict
    for r in rows:
        assert r["n_overlap"] == r["n_a"] + r["n_b"] - r["n_union"]


def test_random_projection_preserves_norms_in_aggregate(spark, sf_smoke):
    from inf2106_map_reduce_spark.functions.vector import (
        embedding_random_projection,
    )

    df = embedding_random_projection(spark, sf_smoke)
    agg = df.agg(
        F.avg(F.col("within_jl_bound").cast("int")).alias("hit"),
        F.avg(F.col("jl_norm2") / F.col("orig_norm2")).alias("ratio"),
    ).collect()[0]
    # chi2_16/16 concentration: the generous 0.9 rel bound should hold
    # for the vast majority, and the MEAN ratio should sit near 1
    assert agg["hit"] >= 0.95
    assert 0.8 <= agg["ratio"] <= 1.2
