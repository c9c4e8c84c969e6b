"""Salted-join equivalence: salting redistributes hot keys without
changing the join result."""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of fact rows carry key 0 — the canonical hot-key shape
    fact = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, fact.k == dim.dk).select("row_id", "k", "payload", "name")
    salted = salted_join(fact, dim, "k", "dk", salt_source="row_id").select(
        "row_id", "k", "payload", "name"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    fact, dim = _skewed_frames(spark)
    salted_fact = fact.withColumn("_salt", F.pmod(F.hash("row_id"), F.lit(16)))
    per_salt = (
        salted_fact.filter(F.col("k") == 0)
        .groupBy("_salt")
        .count()
        .collect()
    )
    # the hot key's rows land on many salts, none dominating
    assert len(per_salt) == 16
    assert max(r["count"] for r in per_salt) < 9000 * 0.25
