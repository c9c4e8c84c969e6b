"""mrlite layer invariants (SURVEY.md §5): partition-count invariance,
combiner on/off equivalence, map-only path, token format round-trip,
and Java-hashCode partition-placement parity with the reference's
committed 6-reducer run."""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.mrlite import (
    Job,
    java_string_hashcode,
    read_token_file,
    write_token_file,
)
from inf2106_map_reduce_spark.mrlite.job import default_partitioner, word_count_job
from inf2106_map_reduce_spark.seed import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("seed") / "teste10K.txt"
    expected = generate_corpus(path, 10_000, seed=7)
    return str(path), expected


def _result(df) -> dict[str, int]:
    return {r["key"]: int(r["value"]) for r in df.collect()}


def test_partition_count_invariance(spark, corpus):
    # Reference evidence: identical multiset across 1-reducer and
    # 6-reducer runs (dataset/teste100K49reduced0.txt vs
    # teste100k*reduced<0-5>.txt).
    path, expected = corpus
    for n in (1, 6):
        assert _result(word_count_job(num_reducers=n).run(spark, path)) == expected


def test_combiner_on_off_equivalence(spark, corpus):
    path, expected = corpus
    on = word_count_job(num_reducers=2, combine=True).run(spark, path)
    off = word_count_job(num_reducers=2, combine=False).run(spark, path)
    assert _result(on) == _result(off) == expected


def test_map_only_job(spark, corpus):
    # M6: num_reducers=0 streams map output straight through, no
    # shuffle (DirectOutputCollectorServant.java:24-70).
    path, _ = corpus
    job = Job(mapper=lambda k, v: [(v, "x")], num_reducers=0)
    df = job.run(spark, path)
    n_tokens = spark.read.text(path).selectExpr(
        "sum(size(split(trim(value), '\\\\s+'))) AS n"
    ).collect()[0]["n"]
    assert df.count() == n_tokens


def test_token_format_round_trip(spark, tmp_path):
    # k|v records round-trip; raw tokens get key "none"
    # (TokenRecordReader.java:33,158-161).
    raw = tmp_path / "raw.txt"
    raw.write_text("alpha b|2 c|x,y alpha ")
    df = read_token_file(spark, str(raw))
    got = sorted((r["key"], r["value"]) for r in df.collect())
    assert got == sorted(
        [("none", "alpha"), ("b", "2"), ("c", "x,y"), ("none", "alpha")]
    )
    out = tmp_path / "out"
    write_token_file(df, str(out))
    back = read_token_file(spark, str(out) + "/*.txt")
    assert sorted((r["key"], r["value"]) for r in back.collect()) == got


def test_token_overflow_split_matches_reference_cap(spark, tmp_path):
    # The reference reader's 1000-char word buffer silently splits
    # longer tokens into cap-sized chunks, each independently
    # pipe-parsed (TokenRecordReader.java:37,88-94). Opt-in via
    # max_token_chars; default keeps tokens whole.
    from inf2106_map_reduce_spark.mrlite.tokenformat import REFERENCE_TOKEN_CAP

    long_tok = "k|" + "x" * 1500  # 1502 chars -> chunks of 1000 + 502
    raw = tmp_path / "long.txt"
    raw.write_text(f"{long_tok} small|1")

    whole = sorted(
        (r["key"], r["value"])
        for r in read_token_file(spark, str(raw)).collect()
    )
    assert whole == sorted([("k", "x" * 1500), ("small", "1")])

    capped = sorted(
        (r["key"], r["value"])
        for r in read_token_file(
            spark, str(raw), max_token_chars=REFERENCE_TOKEN_CAP
        ).collect()
    )
    # chunk 1 = "k|" + 998 x's (pipe-parsed), chunk 2 = 502 x's (raw)
    assert capped == sorted(
        [("k", "x" * 998), ("none", "x" * 502), ("small", "1")]
    )


def test_java_hashcode_parity():
    # Known Java values pin the implementation.
    assert java_string_hashcode("") == 0
    assert java_string_hashcode("a") == 97
    assert java_string_hashcode("Kleber") == -2044934389
    assert java_string_hashcode("polygenelubricants") == -0x80000000


def test_partition_placement_parity_with_reference_run():
    # The committed 6-reducer run's content groups
    # (mapreduce/dataset/teste100k{2..7}reduced{0..5}.txt) pin
    # abs(key.hashCode()) % 6 placement (M2,
    # PartitionerServant.java:20-23).
    golden = {
        0: {"Karina", "Reinaldo", "Sand"},
        1: {"Kleber", "a"},
        2: {"Fortaleza"},
        3: {"Goaiania", "de", "o"},
        5: {"e", "sao"},
    }
    vocab = sorted(w for ws in golden.values() for w in ws)
    got: dict[int, set] = {}
    for w in vocab:
        got.setdefault(default_partitioner(w, 6), set()).add(w)
    assert got == golden


def test_custom_partitioner_and_multi_emit_reduce(spark, corpus):
    path, expected = corpus
    # Everything to partition 0; reducer emits an extra marker pair per
    # key to exercise 1->N reduce output.
    job = Job(
        mapper=lambda k, v: [(v, "1")],
        reducer=lambda k, vs: [(k, str(len(vs))), (k + "!", "seen")],
        partitioner=lambda k, n: 0,
        num_reducers=4,
    )
    rows = job.run(spark, path).collect()
    counts = {r["key"]: r["value"] for r in rows if not r["key"].endswith("!")}
    markers = {r["key"] for r in rows if r["key"].endswith("!")}
    assert {k: int(v) for k, v in counts.items()} == expected
    assert markers == {k + "!" for k in expected}
