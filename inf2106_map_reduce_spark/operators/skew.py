"""Skew-aware joins: key salting for hot keys.

AQE's skew-join splitting (on by default in the session factory)
handles most skew at runtime; explicit salting remains the tool when
one side must be pre-replicated — e.g. a hot-key dimension join where
a single key carries 30% of the fact rows and even a split partition
hot-spots the build side.

``salted_join``: fact rows get a deterministic salt in [0, n_salts)
derived from a high-cardinality disambiguator column; the (small) dim
side is replicated n_salts × and the join runs on (key, salt) —
spreading each hot key over n_salts reducers. Result is row-identical
to the unsalted join (tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on key with the fact side salted.

    ``salt_source``: a fact column (ideally unique-ish) hashed to pick
    the salt — deterministic, so re-runs and retries are stable (never
    use rand(): breaks task retry idempotence).
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salted_fact = fact.withColumn("_salt", F.pmod(F.hash(src), F.lit(n_salts)))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
        how,
    )
    return out.drop("_salt")


def skew_salted_events_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the salted fact⋈dim join end-to-end — events
    (hot user keys) salted over 8 reducers per key against the customer
    dim, aggregated per segment. The oracle is the PLAIN join's SQL:
    salting must be invisible in the result, which is exactly the
    property this query gates."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(ev, c, "user_id", "c_custkey", "event_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
