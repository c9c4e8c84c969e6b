"""Round-8 regression tests for the ADVICE.md code-review items:

- ``vector._lloyd_iterate``: a FULLY empty embeddings table seeds
  zero centroids (the wrappers' ``vec_id < k`` collect returns no
  rows), so ``cents == []`` must short-circuit before ``cents[0]``
  — the r07 guard only covered empty data WITH non-empty centroids;
- ``kmeans_lloyd`` / ``kmeans_lloyd_converged``: the end-to-end
  wrappers over that same empty table return an empty fingerprint
  frame instead of crashing;
- ``stats.corr_matrix``: fewer than two columns raises a clear
  ValueError instead of an IndexError at ``pairs[0]``.
"""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.functions import vector
from inf2106_map_reduce_spark.operators import stats


def _empty_embeddings(spark):
    return spark.createDataFrame(
        [], schema="vec_id bigint, embedding array<double>"
    )


def test_lloyd_iterate_empty_centroids(spark):
    empty = spark.createDataFrame(
        [], schema="vec_id bigint, emb array<double>"
    )
    assigned, cents, rounds, shift = vector._lloyd_iterate(
        empty, [], n_rounds=5, tol=1e-4
    )
    assert assigned.count() == 0
    assert assigned.columns == ["vec_id", "emb", "cid"]
    assert cents == [] and rounds == 0 and shift is None


def test_kmeans_lloyd_fully_empty_table(spark):
    out = vector.kmeans_lloyd(_empty_embeddings(spark), k=4, n_iter=3)
    assert out.count() == 0
    assert out.columns == [
        "cid",
        "n_members",
        "min_member",
        "max_member",
        "member_id_sum",
    ]


def test_kmeans_converged_fully_empty_table(spark):
    out, info = vector.kmeans_lloyd_converged(
        _empty_embeddings(spark), k=4, tol=1e-4, max_iter=5
    )
    assert out.count() == 0
    assert info == {"rounds": 0, "shift": None}


@pytest.mark.parametrize("cols", [[], ["a"]])
def test_corr_matrix_degenerate_arity_raises(spark, cols):
    df = spark.createDataFrame([(1.0, 2.0)], schema="a double, b double")
    with pytest.raises(ValueError, match="at least two columns"):
        stats.corr_matrix(df, cols)
