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

from inf2106_map_reduce_spark.tables import ensure_parallelism, load_table


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
    # The build side broadcasts, so the probe side's input splits ARE
    # the join's parallelism — a one-split small file would run the
    # whole |block|²-candidate levenshtein probe in a single task
    # (measured 5.4 s -> 2.5 s at sf0.1); no-op at scale.
    a = ensure_parallelism(a)
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


def golden_record(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    balance_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Golden-record resolution (MDM survivorship): fuzzy-match edges
    → connected components → one surviving record per entity. The
    full master-data pipeline: :func:`fuzzy_pairs` generates the
    match graph, :func:`..functions.dedup.connected_components`
    resolves transitive identity (A≈B, B≈C ⇒ one entity even when
    A and C differ by 2 edits), and a survivorship rule — highest
    balance, ties to the lowest id — picks each entity's canonical
    row. Output: one row per MULTI-member entity (singletons are
    already golden) with membership fingerprints, the survivor, and
    the merged balance.

    Scale: edges are block-bounded (never n²); components over a
    fuzzy-match graph are tiny (name-edit chains), so the CC rounds
    converge in a couple of iterations; the survivorship pick is a
    per-entity window over |matched records| rows — the corpus-sized
    table is touched exactly once, by the blocked self-join.
    """
    from pyspark.sql import Window

    from inf2106_map_reduce_spark.functions.dedup import connected_components

    pairs = fuzzy_pairs(
        df, id_col, name_col, block_cols, max_distance=max_distance
    )
    comp = connected_components(pairs.select("id_a", "id_b"))
    members = comp.join(
        df.select(
            F.col(id_col).alias("node"),
            F.col(balance_col).alias("_bal"),
        ),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("_bal").desc(), F.col("node")
    )
    ranked = members.select(
        "component",
        "node",
        "_bal",
        F.row_number().over(w).alias("_rn"),
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("node").alias("member_id_sum"),
            F.max(F.when(F.col("_rn") == 1, F.col("node"))).alias(
                "survivor_id"
            ),
            F.round(
                F.max(F.when(F.col("_rn") == 1, F.col("_bal"))), 2
            ).alias("survivor_balance"),
            F.round(F.sum("_bal"), 2).alias("total_balance"),
        )
        .withColumnRenamed("component", "entity_id")
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


def customer_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: golden-record resolution over customers — fuzzy
    name matches within (nation, segment) blocks resolved into
    entities, survivor = highest account balance (ties: lowest key)."""
    return golden_record(
        load_table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        balance_col="c_acctbal",
        max_distance=1,
    )
