"""t1 smoke: word count reproduces the reference's golden outputs
(SURVEY.md §5: derived counts from seed/out* + the committed
dataset/teste100K49reduced0.txt multiset)."""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.mrlite import word_count, word_count_sql
from inf2106_map_reduce_spark.mrlite.job import word_count_job
from inf2106_map_reduce_spark.seed import (
    GOLDEN_100K_SENTENCE_COUNTS,
    GOLDEN_100K_WORD_COUNTS,
    expected_word_counts,
    generate_corpus,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("seed") / "teste100K.txt"
    expected = generate_corpus(path, 100_000, seed=42)
    return str(path), expected


def test_golden_derivation_matches_committed_reference_output():
    # The committed reference result (teste100K49reduced0.txt) must be
    # exactly what its generator counts (seed/out100K) imply.
    assert expected_word_counts(GOLDEN_100K_SENTENCE_COUNTS) == GOLDEN_100K_WORD_COUNTS


def test_dataframe_word_count_matches_generator_truth(spark, corpus):
    path, expected = corpus
    got = {r["word"]: r["count"] for r in word_count(spark, path).collect()}
    assert got == expected


def test_sql_word_count_matches(spark, corpus):
    path, expected = corpus
    got = {r["word"]: r["count"] for r in word_count_sql(spark, path).collect()}
    assert got == expected


def test_ordered_output_is_java_compareto_order(spark, corpus):
    # ASCII vocabulary -> Java UTF-16 order == Spark binary order
    # (SURVEY.md §7.4a); pins the orderBy variant.
    path, expected = corpus
    rows = word_count(spark, path).orderBy("word").collect()
    assert [r["word"] for r in rows] == sorted(expected)


def test_mrlite_job_word_count_matches(spark, corpus):
    path, expected = corpus
    df = word_count_job(num_reducers=3).run(spark, path)
    got = {r["key"]: int(r["value"]) for r in df.collect()}
    assert got == expected


def test_total_count_equals_token_count(spark, corpus):
    # Invariant (a) from SURVEY.md §5: sum of counts == tokens in input.
    path, expected = corpus
    total = sum(
        r["count"] for r in word_count(spark, path).collect()
    )
    assert total == sum(expected.values())
