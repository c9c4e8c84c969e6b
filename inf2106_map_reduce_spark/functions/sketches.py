"""Approximate (sketch-based) aggregates: HyperLogLog++ distinct
counting and quantile sketches.

At 100 TB these are often the only viable form of their exact
counterparts: exact COUNT(DISTINCT) shuffles every distinct value,
HLL++ merges fixed ~KB sketches (one narrow pass + tiny combine);
exact percentiles sort, the quantile sketch streams. Accuracy is a
knob (``rsd`` / ``accuracy``), checked by tolerance tests against the
exact answers (tests/test_sketches.py) — sketch outputs can't
hash-match an exact SQL oracle by construction, so the registry
entries take the weaker rows-only check and the tolerance tests carry
the correctness weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def approx_distinct(
    df: DataFrame, value_col: str, group_cols: list[str], rsd: float = 0.02
) -> DataFrame:
    """HLL++ approximate distinct count per group (relative standard
    deviation ``rsd``; sketch size grows as 1/rsd²)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(f"approx_distinct_{value_col}")
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate percentiles per group (Greenwald-Khanna style
    sketch; error ≤ 1/accuracy of the rank)."""
    probs = "array(" + ", ".join(str(p) for p in probabilities) + ")"
    agg = df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_percentile({value_col}, {probs}, {accuracy})"
        ).alias("approx_quantiles")
    )
    # Flatten the array into one scalar column per probability: sketch
    # state stays an array through the merge (cheap), but the OUTPUT
    # must be scalar — array cells are unhashable downstream (pandas
    # canonicalizers, BI tools) and carry no extra information here.
    return agg.select(
        *group_cols,
        *[
            # round() not int(): float representation makes int(0.35*100)
            # truncate to 34 — defaults happen to be exact, overrides not.
            F.col("approx_quantiles")[i].alias(f"q{int(round(p * 100))}")
            for i, p in enumerate(probabilities)
        ],
    )


def sketch_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (rows-only): HLL++ distinct customers + quantile
    sketch of order totals per status — scalar columns q25/q50/q75/q95."""
    o = load_table(spark, sf_dir, "orders")
    d = approx_distinct(o, "o_custkey", ["o_orderstatus"])
    q = approx_quantiles(o, "o_totalprice", ["o_orderstatus"])
    return d.join(q, "o_orderstatus")
