"""Round-16 optimization pins.

Covers the two classes of r16 change that need their own tests:
- the ``_spread_small_scan`` gate finally firing (its r15 form was a
  verified no-op — the py4j BigInt came back as a Python int, the
  ``.toString()`` raised, and the bare except returned the frame
  untouched), pinned in BOTH directions per the r15 VERDICT item 4;
- the fused Arrow signature pass feeding the dedup registry stages,
  pinned bit-identical against the JVM aggregate builders it replaced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.operators import stats as st
from inf2106_map_reduce_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parse_size_bytes_accepts_every_conf_shape():
    # engine session sets a bare digit string; a VANILLA session (the
    # driver's oracle harness) reports the default WITH a "b" suffix
    assert st._parse_size_bytes("134217728") == 134217728
    assert st._parse_size_bytes("134217728b") == 134217728
    assert st._parse_size_bytes("128m") == 134217728
    assert st._parse_size_bytes("1g") == 1073741824
    with pytest.raises(ValueError):
        st._parse_size_bytes("lots")


def test_spread_small_scan_gate_fires_and_stays_off_at_scale(
    spark, sf_oracle
):
    df = load_table(spark, sf_oracle, "lineitem").select(
        *st.LINEITEM_STATS_COLS
    )
    size = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    key = "spark.sql.files.maxPartitionBytes"
    saved = spark.conf.get(key)
    try:
        # window case: floor < size <= max_split -> the spread fires
        spark.conf.set(key, str(size * 16))
        assert "RoundRobin" in _plan(
            st._spread_small_scan(df).agg(F.count(F.lit(1)))
        )
        # at-scale case: size > max_split (the input parallelizes its
        # own scan) -> untouched, no extra exchange
        spark.conf.set(key, str(max(size - 1, 1)))
        assert "RoundRobin" not in _plan(
            st._spread_small_scan(df).agg(F.count(F.lit(1)))
        )
        # tiny-input case: size <= max_split // 32 -> the epilogue is
        # smaller than the shuffle it would pay -> untouched
        spark.conf.set(key, str(size * 64))
        assert "RoundRobin" not in _plan(
            st._spread_small_scan(df).agg(F.count(F.lit(1)))
        )
    finally:
        spark.conf.set(key, saved)


def test_spread_small_scan_values_unchanged(spark, sf_oracle):
    df = load_table(spark, sf_oracle, "lineitem").select(
        *st.LINEITEM_STATS_COLS
    )
    size = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    key = "spark.sql.files.maxPartitionBytes"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, str(size * 16))
        spread = st.table_stats(
            load_table(spark, sf_oracle, "lineitem"),
            st.LINEITEM_STATS_COLS,
        )
        assert "RoundRobin" in _plan(spread)
        spread_rows = sorted(map(tuple, spread.collect()))
    finally:
        spark.conf.set(key, saved)
    plain = st.table_stats(
        load_table(spark, sf_oracle, "lineitem"), st.LINEITEM_STATS_COLS
    )
    assert sorted(map(tuple, plain.collect())) == spread_rows
