"""Vector similarity tests: brute-force correctness on a constructed
corpus + LSH ANN recall against brute force on the real table."""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import vector
from inf2106_map_reduce_spark.tables import load_table


def test_brute_force_finds_planted_neighbor(spark):
    # vec 1 is nearly parallel to vec 0; vec 2 orthogonal; vec 3 opposite
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = vector.brute_force_topk(df, query_ids=(0,), k=3).collect()
    order = [r["vec_id"] for r in out]
    assert order == [1, 2, 3]
    assert out[0]["cos_sim"] > 0.99
    assert abs(out[1]["cos_sim"]) < 1e-6
    assert out[2]["cos_sim"] == -1.0


def test_lsh_ann_recall_vs_brute_force(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "embeddings")
    qids = (0, 1, 2, 3, 4)
    exact = vector.brute_force_topk(e, query_ids=qids, k=10)
    # tuned defaults (vector.ANN_LSH_TABLES) must clear the shippable
    # bar; the registry's ann_recall_audit hash-checks the same number
    approx = vector.lsh_ann_topk(e, query_ids=qids, k=10)
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= vector.ANN_RECALL_BAR, f"LSH recall {recall:.2f} too low"


def test_ivf_ann_recall_vs_brute_force(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "embeddings")
    qids = (0, 1, 2, 3, 4)
    exact = vector.brute_force_topk(e, query_ids=qids, k=10)
    # tuned defaults (vector.ANN_IVF_PROBE) must clear the shippable
    # bar; the registry's ann_recall_audit hash-checks the same number
    approx = vector.ivf_ann_topk(e, query_ids=qids, k=10)
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= vector.ANN_RECALL_BAR, f"IVF recall {recall:.2f} too low"


def test_ivf_is_deterministic(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "embeddings")
    a = vector.ivf_ann_topk(e, k=5).collect()
    b = vector.ivf_ann_topk(e, k=5).collect()
    assert a == b


def test_lsh_is_deterministic(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "embeddings")
    a = vector.lsh_ann_topk(e, k=5).collect()
    b = vector.lsh_ann_topk(e, k=5).collect()
    assert a == b


def test_cosine_self_similarity_is_one(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "embeddings").limit(20)
    sim = e.select(
        F.round(vector.cosine(F.col("embedding"), F.col("embedding")), 6).alias("c")
    ).collect()
    assert all(r["c"] == 1.0 for r in sim)


def test_kmeans_empty_cluster_carries_centroid_forward(spark):
    """Duplicate seed embeddings make cluster 2's centroid identical to
    cluster 1's, so the argmin tiebreak (first match) empties cluster 2
    in iteration 1; iteration 2 can only re-populate it if the rebuild
    keyed the collected rows by cid and carried the empty cluster's
    centroid forward. The old positional rebuild shrank the centroid
    list and dropped cid 2 entirely."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [5.0, 5.0]),
        (2, [5.0, 5.0]),  # exact dup of the cid-1 seed
        (3, [5.1, 5.0]),
        (4, [0.1, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {
        r["cid"]: (r["n_members"], r["min_member"], r["max_member"], r["member_id_sum"])
        for r in vector.kmeans_lloyd(e, k=3, n_iter=2).collect()
    }
    # iter1: c2 empty (ties go to c1); update moves c1 to ~[5.033, 5],
    # c2 stays [5, 5]; iter2: the two [5,5] points defect to c2.
    assert out == {0: (2, 0, 4, 4), 1: (1, 3, 3, 3), 2: (2, 1, 2, 3)}


def test_quantize_zero_vector_is_defined(spark):
    """An all-zero embedding must quantize to zeros with zero error and
    scale 1 (the 127/absmax division guard), not a NULL row."""
    rows = [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in vector.quantize_int8(e).collect()}
    assert out[0]["scale"] == 1.0
    assert out[0]["n_saturated"] == 0
    assert out[0]["rms_error"] == 0.0
    assert out[1]["scale"] == 63.5  # 127 / 2
    assert out[1]["n_saturated"] == 1  # the -2 component hits -127
    assert out[1]["rms_error"] is not None


def test_quantize_null_empty_and_ragged_vectors(spark):
    """NULL and zero-length embeddings emit NULL stats rows (the
    pre-vectorized behavior) instead of crashing the Arrow worker;
    mixed dimensionalities are handled per length group."""
    rows = [
        (0, None),
        (1, []),
        (2, [1.0, -2.0, 0.5]),
        (3, [4.0, 0.0]),  # different dim than row 2 — ragged batch
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["vec_id"]: r for r in vector.quantize_int8(e).collect()}
    assert len(out) == 4
    for bad in (0, 1):
        assert out[bad]["scale"] is None
        assert out[bad]["n_saturated"] is None
        assert out[bad]["rms_error"] is None
    assert out[2]["scale"] == 63.5
    assert out[2]["n_saturated"] == 1
    assert out[3]["scale"] == 31.75  # 127 / 4, dim-2 group
    assert out[3]["n_saturated"] == 1


def test_kmeans_converges_on_embeddings(spark, sf_oracle):
    """The tol-driven variant must converge well before the iteration
    cap on real embeddings, and the cluster assignment must be stable:
    re-running one extra round from the converged state yields the
    same cluster fingerprints."""
    from inf2106_map_reduce_spark.tables import load_table

    e = load_table(spark, sf_oracle, "embeddings")
    df, info = vector.kmeans_lloyd_converged(e, k=8, tol=1e-3, max_iter=25)
    assert 1 <= info["rounds"] < 25, info
    assert info["shift"] is not None and info["shift"] < 1e-3
    sizes = {r["cid"]: r["n_members"] for r in df.collect()}
    assert sum(sizes.values()) == e.count()
    # stability: a stricter tol from the same seeds must end at the
    # same partition of the data (sizes identical), just maybe later
    df2, info2 = vector.kmeans_lloyd_converged(e, k=8, tol=1e-4, max_iter=40)
    sizes2 = {r["cid"]: r["n_members"] for r in df2.collect()}
    assert info2["rounds"] >= info["rounds"]
    assert sizes2 == sizes


def test_brute_force_exclude_pairs_reranks(spark):
    """Exclusion removes the pair in either orientation and ranks are
    recomputed on the survivors (no gaps)."""
    import math

    from inf2106_map_reduce_spark.functions import vector

    # 4 unit-ish vectors: 1 closest to 0, then 2, then 3
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),
        (2, [0.9, 0.44]),
        (3, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    base = {
        r["rank"]: r["vec_id"]
        for r in vector.brute_force_topk(emb, query_ids=(0,), k=3).collect()
    }
    assert base == {1: 1, 2: 2, 3: 3}
    ex = spark.createDataFrame([(1, 0)], "id_a bigint, id_b bigint")  # flipped
    got = {
        r["rank"]: r["vec_id"]
        for r in vector.brute_force_topk(
            emb, query_ids=(0,), k=3, exclude_pairs=ex
        ).collect()
    }
    assert got == {1: 2, 2: 3}
