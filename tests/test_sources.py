"""Source/sink connector tests: every format round-trips values and
schema; partitioned writes lay out hive-style directories that prune.

The reference's analogue is its token reader/writer pair validated by
committed run artifacts (SURVEY.md §5); here each connector is checked
by write → read → exact frame equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.sources import formats
from inf2106_map_reduce_spark.tables import load_table


def _orders_sample(spark, sf_smoke):
    return (
        load_table(spark, sf_smoke, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .limit(200)
    )


def _assert_same_rows(a, b, key="o_orderkey"):
    assert a.schema == b.schema
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_parquet_roundtrip(spark, sf_smoke, tmp_path):
    df = _orders_sample(spark, sf_smoke)
    p = str(tmp_path / "pq")
    formats.write_parquet(df, p)
    _assert_same_rows(df, formats.read_parquet(spark, p))


def test_parquet_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    df = _orders_sample(spark, sf_smoke)
    p = str(tmp_path / "pq_part")
    formats.write_parquet(df, p, partition_by=["o_orderstatus"])
    back = formats.read_parquet(spark, p).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (directory pruning, not a
    # post-scan Filter on the partition column)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    expected = df.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_csv_roundtrip_explicit_schema(spark, sf_smoke, tmp_path):
    df = _orders_sample(spark, sf_smoke)
    p = str(tmp_path / "csv")
    formats.write_csv(df, p)
    back = formats.read_csv(
        spark,
        p,
        schema=(
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate date"
        ),
    )
    _assert_same_rows(df, back)


def test_jsonl_roundtrip_explicit_schema(spark, sf_smoke, tmp_path):
    df = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    p = str(tmp_path / "json")
    formats.write_jsonl(df, p)
    back = formats.read_jsonl(
        spark,
        p,
        schema="event_id bigint, user_id bigint, event_type string, value double",
    )
    _assert_same_rows(df, back)


def test_text_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("alpha",), ("beta gamma",), ("",)], "value string"
    )
    p = str(tmp_path / "txt")
    formats.write_text(df, p)
    back = formats.read_text(spark, p)
    assert sorted(r["value"] for r in back.collect()) == ["", "alpha", "beta gamma"]


def test_csv_failfast_rejects_corrupt(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.csv").write_text("a,b\n1,2\nnot_an_int,3\n")
    import pytest
    from py4j.protocol import Py4JJavaError

    df = formats.read_csv(spark, str(bad), schema="a int, b int", header=True)
    with pytest.raises(Py4JJavaError):
        df.collect()
    # permissive mode loads the good row and nulls the bad field
    ok = formats.read_csv(
        spark, str(bad), schema="a int, b int", header=True, permissive=True
    )
    vals = sorted(
        [(r["a"], r["b"]) for r in ok.collect()], key=lambda t: (t[0] is None, t)
    )
    assert vals == [(1, 2), (None, 3)]


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    df = _orders_sample(spark, sf_smoke)
    p = str(tmp_path / "orc")
    formats.write_orc(df, p)
    _assert_same_rows(df, formats.read_orc(spark, p))


def test_compaction_reduces_file_count(spark, sf_oracle):
    """The compacted layout must actually have few files (the whole
    point), and exactly preserve values (oracle test covers that)."""
    import glob
    import os

    from inf2106_map_reduce_spark.sources import roundtrip

    roundtrip.maintenance_compaction(spark, sf_oracle).count()
    frag = roundtrip._stage_dir(sf_oracle, "events_fragmented")
    compact = roundtrip._stage_dir(sf_oracle, "events_compacted")
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_compact = len(glob.glob(os.path.join(compact, "*.parquet")))
    assert n_frag == 64 and n_compact == 4, (n_frag, n_compact)


def test_schema_evolution_nullfills_legacy_batch(spark, sf_oracle):
    from pyspark.sql import functions as F

    from inf2106_map_reduce_spark.sources import roundtrip

    df = roundtrip.schema_evolution_read(spark, sf_oracle)
    agg = df.agg(F.sum("n_legacy").alias("legacy"), F.sum("n_events").alias("n")).collect()[0]
    assert 0 < agg["legacy"] < agg["n"]


def test_convert_event_ts_normalizes_both_encodings(spark):
    """The testdata generator has shipped events.ts as bigint nanos AND
    as timestamp[us] (read as TIMESTAMP_NTZ); both must normalize to a
    session-zoned TIMESTAMP with identical microsecond values —
    downstream unix_micros consumers reject NTZ."""
    from inf2106_map_reduce_spark.tables import convert_event_ts

    nanos = spark.createDataFrame(
        [(1, 1700000000123456789)], "event_id bigint, ts bigint"
    )
    ntz = spark.sql(
        "SELECT 1 AS event_id, TIMESTAMP_NTZ '2023-11-14 22:13:20.123456' AS ts"
    )
    a = convert_event_ts(nanos)
    b = convert_event_ts(ntz)
    assert dict(a.dtypes)["ts"] == "timestamp"
    assert dict(b.dtypes)["ts"] == "timestamp"
    from pyspark.sql import functions as F

    ua = a.select(F.unix_micros("ts").alias("u")).collect()[0]["u"]
    ub = b.select(F.unix_micros("ts").alias("u")).collect()[0]["u"]
    # 1700000000123456789 ns floor-converts to ...123456 us == the NTZ
    # literal under the UTC session zone
    assert ua == ub == 1700000000123456


def test_xml_roundtrip_value_exact(spark, sf_smoke, tmp_path):
    df = _orders_sample(spark, sf_smoke)
    p = str(tmp_path / "xml")
    formats.write_xml(df, p, row_tag="order")
    back = formats.read_xml(
        spark, p, row_tag="order", schema=df.schema
    )
    _assert_same_rows(df, back)
