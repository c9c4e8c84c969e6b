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
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Logistic-regression trainer (round 8 new family)
# ---------------------------------------------------------------------------


def test_logreg_empty_input_returns_empty_frame(spark):
    from inf2106_map_reduce_spark.operators import stats

    empty = spark.createDataFrame([], "v double, y int")
    out = stats.logreg_train(
        empty, features=[("x", F.col("v"))], label=F.col("y")
    )
    assert out.count() == 0
    assert out.columns == ["coef", "weight", "n_rows", "accuracy", "log_loss"]


def test_logreg_learns_separable_data(spark):
    # y = 1 iff x > 0 on a symmetric separable set: GD from w=0 must
    # move the feature weight positive and beat the null model's
    # ln(2) log-loss; the bias stays ~0 by symmetry.
    from inf2106_map_reduce_spark.operators import stats

    rows = [(float(v), 1 if v > 0 else 0) for v in range(-20, 21) if v != 0]
    df = spark.createDataFrame(rows, "v double, y int")
    out = stats.logreg_train(
        df, features=[("x", F.col("v") / 20)], label=F.col("y"), steps=8
    )
    got = {r.coef: r for r in out.collect()}
    assert set(got) == {"bias", "x"}
    assert got["x"].weight > 0.5
    assert abs(got["bias"].weight) < 1e-6
    assert got["x"].log_loss < 0.6931
    assert got["x"].accuracy == 1.0
    assert got["x"].n_rows == 40


def test_logreg_trajectory_is_deterministic(spark, sf_oracle):
    from inf2106_map_reduce_spark.operators import stats

    a = stats.lineitem_logreg_returns(spark, sf_oracle).collect()
    b = stats.lineitem_logreg_returns(spark, sf_oracle).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_both_matches_single_width_forms(spark, sf_oracle):
    # the fused both-width aggregation must be bit-identical to the
    # standalone simhash/simhash64 it replaces in the session stage
    from inf2106_map_reduce_spark.functions import dedup
    from inf2106_map_reduce_spark.tables import load_table

    d = load_table(spark, sf_oracle, "documents")
    both = {
        r.doc_id: (r.simhash32, r.simhash64)
        for r in dedup.simhash_signatures_both(d).collect()
    }
    s32 = {r.doc_id: r.simhash32 for r in dedup.simhash(d).collect()}
    s64 = {r.doc_id: r.simhash64 for r in dedup.simhash64(d).collect()}
    assert {k: v[0] for k, v in both.items()} == s32
    assert {k: v[1] for k, v in both.items()} == s64
