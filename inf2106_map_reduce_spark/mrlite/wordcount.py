"""Word count — the reference's flagship (and only) application,
Spark-first (SURVEY.md §7.2 M1).

The mrlite ``word_count_job`` reproduces the UDF pipeline; this module
is the *idiomatic* version: declarative split/explode/groupBy that
Catalyst compiles to a partial+final hash aggregate with whole-stage
codegen — the combiner (M5), shuffle (M4/R1), merge (R2) and sorted
group reduce (R3) of the reference collapse into one ``groupBy``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_count(spark: SparkSession, path: str) -> DataFrame:
    """``(word, count)`` over whitespace-separated text.

    Scale: the only shuffle is the partial→final hash aggregate on
    ``word`` (map-side combine automatic); input parallelism follows
    ``spark.sql.files.maxPartitionBytes`` byte-range splits — the
    reference materialized each split to its own file
    (``IOFormatServant.java:130-164``); Spark splits logically.
    """
    lines = spark.read.text(path)
    words = lines.select(
        F.explode(F.split(F.col("value"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def word_count_sql(spark: SparkSession, path: str) -> DataFrame:
    """Same plan via SQL, proving the surface is also SQL-reachable."""
    spark.read.text(path).createOrReplaceTempView("raw_text")
    return spark.sql(
        """
        SELECT word, COUNT(*) AS count
        FROM (
          SELECT explode(split(value, '\\\\s+')) AS word FROM raw_text
        )
        WHERE word != ''
        GROUP BY word
        """
    )
