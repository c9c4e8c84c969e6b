"""The mapred.* properties front-end must run reference-style job
configs end-to-end with the reference's defaults (Reducers.number
default 0, Combine.flag default false, combiner defaulting to the
reducer servant)."""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.mrlite import config as mrconfig
from inf2106_map_reduce_spark.mrlite.tokenformat import read_token_file


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_word_count_config_end_to_end(spark, tmp_path):
    data = _write(tmp_path, "in.txt", "b a b c a b")
    cfg = _write(
        tmp_path,
        "job.properties",
        f"""
        # reference-style job config (cluster plumbing ignored)
        mapred.Master.corbaloc-host = ignored
        mapred.Input.name = {data}
        mapred.Mapper.servant-name = WordMapper
        mapred.Reducer.servant-name = WordReducer
        mapred.Reducers.number = 2
        mapred.Combine.flag = true
        mapred.Output.name = {tmp_path}/out
        """,
    )
    df = mrconfig.run_config(spark, cfg)
    got = {(r["key"], r["value"]) for r in df.collect()}
    assert got == {("a", "2"), ("b", "3"), ("c", "1")}
    back = read_token_file(spark, str(tmp_path / "out"))
    assert {(r["key"], r["value"]) for r in back.collect()} == got


def test_map_only_default(spark, tmp_path):
    # Reducers.number defaults to 0 -> map-only, no shuffle, no reducer
    data = _write(tmp_path, "in.txt", "x y")
    cfg = _write(
        tmp_path,
        "job.properties",
        f"mapred.Input.name={data}\nmapred.Mapper.servant-name=WordMapper\n",
    )
    df = mrconfig.run_config(spark, cfg)
    assert {(r["key"], r["value"]) for r in df.collect()} == {("x", "1"), ("y", "1")}


def test_properties_parser_handles_comments_and_colons(tmp_path):
    p = _write(
        tmp_path,
        "p.properties",
        "# comment\n! also comment\na.b = 1\nc.d: two\n\n e = 3 \n",
    )
    assert mrconfig.parse_properties(p) == {"a.b": "1", "c.d": "two", "e": "3"}


def test_properties_parser_splits_at_first_separator(tmp_path):
    """java.util.Properties splits at the FIRST of '='/':' — a value
    may contain the other separator verbatim."""
    p = _write(
        tmp_path,
        "sep.properties",
        "key: a=b\nother=c:d\npath = /x:/y\n",
    )
    assert mrconfig.parse_properties(p) == {
        "key": "a=b",
        "other": "c:d",
        "path": "/x:/y",
    }


def test_join_flag_without_file_name_raises_clear_error(spark, tmp_path):
    data = _write(tmp_path, "in.txt", "ab cd ab")
    cfg = _write(
        tmp_path,
        "job.properties",
        f"mapred.Input.name={data}\n"
        "mapred.Mapper.servant-name=WordMapper\n"
        "mapred.Reducer.servant-name=WordReducer\n"
        "mapred.Reducers.number=2\n"
        "mapred.Join.flag=true\n",
    )
    with pytest.raises(KeyError, match="mapred.Join.file-name"):
        mrconfig.run_config(spark, cfg)


def test_custom_udf_registration(spark, tmp_path):
    @mrconfig.register_udf("UpperMapper")
    def upper_mapper(key, value):
        return [(value.upper(), key)]

    data = _write(tmp_path, "in.txt", "ab cd")
    cfg = _write(
        tmp_path,
        "job.properties",
        f"mapred.Input.name={data}\nmapred.Mapper.servant-name=UpperMapper\n",
    )
    df = mrconfig.run_config(spark, cfg)
    assert {(r["key"], r["value"]) for r in df.collect()} == {
        ("AB", "none"),
        ("CD", "none"),
    }


def test_cli_list_runs_without_spark():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "inf2106_map_reduce_spark", "list", "--tag", "sketch"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "sketch_orders_per_status" in out.stdout


def test_join_flag_joins_side_file_on_key(spark, tmp_path):
    """mapred.Join.flag: the reference declared it and never implemented
    it; the engine's defined semantic is an inner key join appending the
    side value pipe-separated."""
    data = _write(tmp_path, "in.txt", "b a b")
    side = _write(tmp_path, "side.txt", "a|alpha b|beta z|zeta")
    cfg = _write(
        tmp_path,
        "job.properties",
        f"""
        mapred.Input.name = {data}
        mapred.Mapper.servant-name = WordMapper
        mapred.Reducer.servant-name = WordReducer
        mapred.Reducers.number = 1
        mapred.Join.flag = true
        mapred.Join.file-name = {side}
        """,
    )
    df = mrconfig.run_config(spark, cfg)
    got = {(r["key"], r["value"]) for r in df.collect()}
    assert got == {("a", "1|alpha"), ("b", "2|beta")}


def test_missing_property_and_unknown_udf_messages(tmp_path):
    import pytest

    with pytest.raises(KeyError, match="mapred.Input.name"):
        mrconfig.job_from_properties({"mapred.Mapper.servant-name": "WordMapper"})
    with pytest.raises(KeyError, match="no UDF registered"):
        mrconfig.job_from_properties(
            {"mapred.Input.name": "x", "mapred.Mapper.servant-name": "Nope"}
        )
