"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full registry
(:mod:`inf2106_map_reduce_spark.queries`) for the t2 DuckDB-oracle
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from inf2106_map_reduce_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shape 3-way
    join + agg + deterministic top-10 (driver checks rows >= 0)."""
    from inf2106_map_reduce_spark.operators.relational import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.5."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — since round 5 EVERY
    registry entry has an exact oracle (no rows-only rows remain):
    ann_lsh / ann_ivf embed their seeded hyperplanes/centroids as SQL
    literals (round 4), and sketch_orders_per_status emits exact
    keys/counts plus in-plan error-envelope verdicts about its HLL++/
    quantile estimates, which an exact oracle can hash-match (round 5;
    raw-estimate tolerances stay in tests/test_sketches.py)."""
    return _registry.oracle_sql()
