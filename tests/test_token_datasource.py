"""tokenkv Python DataSource: split-boundary semantics, parse parity
with the expression-based reader, write round-trip."""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.mrlite.tokenformat import read_token_file
from inf2106_map_reduce_spark.sources.token_datasource import register


@pytest.fixture(scope="module")
def tokenkv(spark):
    register(spark)
    return spark


def _read(spark, path, split_size=None):
    r = spark.read.format("tokenkv")
    if split_size is not None:
        r = r.option("split_size", split_size)
    return r.load(path)


def test_parse_parity_with_expression_reader(tokenkv, tmp_path):
    p = tmp_path / "tok.txt"
    p.write_text("a|b|c raw x|1 x|2\nnone|keyed  trailing\n")
    ds = sorted((r["key"], r["value"]) for r in _read(tokenkv, str(p)).collect())
    expr = sorted(
        (r["key"], r["value"]) for r in read_token_file(tokenkv, str(p)).collect()
    )
    assert ds == expr
    assert ("a", "b|c") in ds and ("none", "raw") in ds


def test_tiny_splits_do_not_break_tokens(tokenkv, tmp_path):
    """Reference S1 semantics: byte chunks never split a token. With
    7-byte splits every token straddles a boundary; the multiset must
    be identical to a single-split read."""
    p = tmp_path / "big.txt"
    toks = [f"key{i}|value{i}" for i in range(500)]
    p.write_text(" ".join(toks))
    whole = sorted(
        (r["key"], r["value"]) for r in _read(tokenkv, str(p), split_size=1 << 30).collect()
    )
    tiny = sorted(
        (r["key"], r["value"]) for r in _read(tokenkv, str(p), split_size=7).collect()
    )
    assert tiny == whole
    assert len(whole) == 500


def test_split_count_scales_with_split_size(tokenkv, tmp_path):
    from inf2106_map_reduce_spark.sources.token_datasource import TokenKVReader

    p = tmp_path / "sz.txt"
    p.write_text("x|1 " * 1000)
    r = TokenKVReader({"path": str(p), "split_size": "512"})
    n_bytes = p.stat().st_size
    assert len(r.partitions()) == (n_bytes + 511) // 512


def test_write_read_roundtrip(tokenkv, tmp_path):
    df = tokenkv.createDataFrame(
        [("w1", "3"), ("w2", "5"), ("none", "raw")], "key string, value string"
    )
    out = str(tmp_path / "out")
    df.write.format("tokenkv").mode("append").save(out)
    back = sorted((r["key"], r["value"]) for r in _read(tokenkv, out).collect())
    assert back == [("none", "raw"), ("w1", "3"), ("w2", "5")]


def test_empty_file(tokenkv, tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    assert _read(tokenkv, str(p)).count() == 0


def test_split_size_sweep_invariance(tokenkv, tmp_path):
    """Multiset is invariant across pathological split sizes (1 byte =
    every token straddles; primes; huge) — SURVEY §5 invariant (d)."""
    p = tmp_path / "sweep.txt"
    p.write_text("aa|1 b|22 ccc raw|x|y z ")
    expected = sorted(
        (r["key"], r["value"])
        for r in _read(tokenkv, str(p), split_size=1 << 20).collect()
    )
    assert ("raw", "x|y") in expected and ("none", "ccc") in expected
    for size in (1, 2, 3, 5, 11):
        got = sorted(
            (r["key"], r["value"])
            for r in _read(tokenkv, str(p), split_size=size).collect()
        )
        assert got == expected, f"split_size={size}"


def test_tokenkv_streaming_tails_appends_and_holds_partial_tokens(spark, tmp_path):
    # batch 1: "a|1 b|2 partial" — the trailing partial token has no
    # whitespace after it, so it must be HELD BACK, not emitted split
    f = tmp_path / "growing.txt"
    f.write_bytes(b"a|1 b|2 partial")
    rows: list[tuple] = []
    q = (
        spark.readStream.format("tokenkv")
        .option("path", str(f))
        .load()
        .writeStream.foreachBatch(
            lambda df, _e: rows.extend(tuple(r) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert rows == [("a", "1"), ("b", "2")]
        # batch 2: the append completes 'partial' and adds c|3
        with open(f, "ab") as fh:
            fh.write(b" c|3 ")
        q.processAllAvailable()
        assert rows == [("a", "1"), ("b", "2"), ("none", "partial"), ("c", "3")]
    finally:
        q.stop()
