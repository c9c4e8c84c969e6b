"""Grouped-aggregate Pandas UDAFs — the ``Aggregator``-style UDF
surface (SURVEY.md §7.4c): unlike ``applyInPandas`` (whole group
materialized, the reference's Reducer contract, ``idl:67``), a
grouped-agg pandas_udf slots into ``groupBy().agg()`` beside built-in
aggregates and receives the group as Arrow-batched Series.

Scale: grouped-agg UDFs do NOT do partial aggregation — the full group
shuffles to one task (same memory profile as the reference's
materialized value array). Keep them for moderate-cardinality groups;
for decomposable aggregates prefer built-ins (partial+final).

Determinism (oracle parity): the weighted mean is computed from
integer-exact sums (prices have 2 decimals → x100 units in int64), so
both engines divide the same two integers — no summation-order drift.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from inf2106_map_reduce_spark.tables import load_table


# explicit DataType: the DDL-string form needs an active session to
# parse at import time; DoubleType() keeps the module importable anywhere
@pandas_udf(DoubleType())
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    num = (price * qty * 100).round().astype("int64").sum()
    den = qty.astype("int64").sum()
    return float(num) / (100.0 * float(den))


@pandas_udf(LongType())
def group_size(qty: pd.Series) -> int:
    return int(len(qty))


def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: quantity-weighted average extended price per
    return flag. Spark forbids mixing grouped-agg pandas UDFs with
    JVM aggregates in one ``agg()`` (INVALID_PANDAS_UDF_PLACEMENT),
    so the row count is a second pandas UDAF."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg_price("l_extendedprice", "l_quantity").alias("wavg_price"),
        group_size("l_quantity").alias("n_items"),
    )


UDAF_WEIGHTED_AVG_ORACLE = """
SELECT l_returnflag,
       SUM(CAST(ROUND(l_extendedprice * l_quantity * 100, 0) AS BIGINT))
         / (100.0 * SUM(CAST(l_quantity AS BIGINT))) AS wavg_price,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""
