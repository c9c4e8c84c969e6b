"""Entity resolution / record linkage: blocking + pairwise fuzzy
verification.

The classic MDM (master-data-management) shape — find records that
refer to the same real-world entity despite textual noise — and the
string-space counterpart of the embedding near-dup pipeline in
:mod:`..functions.dedup`: both are candidate-generation (cheap, high
recall) followed by exact verification (expensive, run only on
candidates). Blocking here plays the role LSH bands play there:
pairwise edit distance over n records is O(n²) and dead at corpus
scale, so candidates are generated ONLY within blocks — records
agreeing on cheap deterministic keys — and the quadratic cost is
bounded per block, never per corpus.

Superset capability vs the reference (which has no string-similarity
surface at all); built on Spark's JVM-side ``levenshtein`` (same
classic edit-distance definition DuckDB implements, so the oracle is
exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_distance: int = 1,
) -> DataFrame:
    """Blocked pairwise fuzzy match: candidate pairs share every
    blocking key (plus name length — edit distance ≤ k implies length
    difference ≤ k, so same-length blocking at k=1 only drops
    insert/delete matches, the standard cheap recall trade); matches
    are candidates with ``levenshtein(name_a, name_b) <=
    max_distance``.

    Scale: the self-join is an EQUI-join on the block key (shuffle
    both sides on the key, pairs form within a block's partition), so
    cost is Σ_blocks |block|² — the blocking key must keep blocks
    bounded (here nation × segment × length; production adds more keys
    or salts oversized blocks exactly like the skew-join operator).
    The ``id_a < id_b`` filter halves the pair space and makes the
    output canonical. Spark 4 pushes the distance ceiling INTO the
    levenshtein call (early-exit threshold form) — the verify step is
    JVM codegen, no Python.
    """
    sides = []
    for side in ("a", "b"):
        sides.append(
            df.select(
                F.col(id_col).alias(f"id_{side}"),
                F.col(name_col).alias(f"name_{side}"),
                F.length(name_col).alias(f"_len_{side}"),
                *[F.col(c).alias(f"_{c}_{side}") for c in block_cols],
            )
        )
    a, b = sides
    cond = (F.col("_len_a") == F.col("_len_b")) & (
        F.col("id_a") < F.col("id_b")
    )
    for c in block_cols:
        cond = cond & (F.col(f"_{c}_a") == F.col(f"_{c}_b"))
    return (
        a.join(b, cond)
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b", max_distance + 1).alias("_d"),
        )
        # the thresholded levenshtein returns -1 once distance exceeds
        # the ceiling — filter keeps true distances only
        .filter((F.col("_d") >= 0) & (F.col("_d") <= max_distance))
        .withColumnRenamed("_d", "distance")
    )


def customer_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: near-identical customer names within
    (nation, market-segment) blocks at edit distance ≤ 1 — the
    duplicate-account candidates an MDM pass would queue for review.
    """
    return fuzzy_pairs(
        load_table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        max_distance=1,
    )
