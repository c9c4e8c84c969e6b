"""Declarative format connectors: parquet / CSV / JSON-lines / text.

Counterpart of the reference's ``IOFormat`` factory
(``servant/IOFormatServant.java:32-128`` + reflection selection at
``MapTaskServant.java:49-60``): there, a format is a user CORBA class
materializing split files; here it is a (reader, writer) pair over
Spark's DataSource API, so splits are logical byte ranges, schema is
explicit, and every scan supports predicate pushdown / column pruning.

Scale notes baked into the defaults:
- reads take an explicit schema or DDL string — schema inference is a
  full extra pass over 100 TB, so it is opt-in, never silent;
- CSV/JSON readers run in ``PERMISSIVE`` mode with a
  ``_corrupt_record`` column by request, ``FAILFAST`` by default —
  corrupt data should fail loudly in pipelines unless quarantined;
- writers accept ``partition_by`` (hive-style directory layout →
  partition pruning downstream) and never ``coalesce(1)`` implicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _schema_arg(schema: StructType | str | None) -> StructType | str | None:
    return schema


# ---------------------------------------------------------------------------
# parquet
# ---------------------------------------------------------------------------

def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: schema from footer, vectorized reader, pushdown."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


# ---------------------------------------------------------------------------
# ORC
# ---------------------------------------------------------------------------

def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC scan (vectorized reader, pushdown — parquet's peer
    for Hive-ecosystem interchange)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


# ---------------------------------------------------------------------------
# CSV
# ---------------------------------------------------------------------------

def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
    permissive: bool = False,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV scan with explicit schema (inference only when schema=None,
    which costs an extra pass — avoid on large inputs)."""
    r = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    )
    if timestamp_format:
        r = r.option("timestampFormat", timestamp_format)
    if schema is not None:
        r = r.schema(_schema_arg(schema))
    else:
        r = r.option("inferSchema", True)
    return r.csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    sep: str = ",",
    partition_by: list[str] | None = None,
    timestamp_format: str | None = None,
    compression: str | None = None,
) -> None:
    w = df.write.mode(mode).option("header", header).option("sep", sep)
    if timestamp_format:
        w = w.option("timestampFormat", timestamp_format)
    if compression:
        # any Hadoop codec name Spark ships (gzip, bzip2, lz4, snappy,
        # deflate, zstd); readers splitting matters at scale — gzip
        # files are NOT splittable, so one file = one task on read:
        # fine for staging exports, wrong for 100 TB ingest (prefer
        # zstd/lz4 or parquet there — see source_csv_gzip_roundtrip)
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


# ---------------------------------------------------------------------------
# JSON lines
# ---------------------------------------------------------------------------

def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    permissive: bool = False,
) -> DataFrame:
    """JSON-lines scan (one object per line — the only JSON layout that
    splits by byte range; multiLine JSON is whole-file-per-task and is
    deliberately not offered here)."""
    r = spark.read.option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    if schema is not None:
        r = r.schema(_schema_arg(schema))
    return r.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


# ---------------------------------------------------------------------------
# plain text
# ---------------------------------------------------------------------------

def read_text(spark: SparkSession, path: str, whole_text: bool = False) -> DataFrame:
    """Line-oriented text scan → single ``value: string`` column.
    ``whole_text=True`` reads each file as one row (small-file use only)."""
    return spark.read.option("wholetext", whole_text).text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a single string column as text, one row per line."""
    df.write.mode(mode).text(path)


# ---------------------------------------------------------------------------
# XML (Spark 4 native source)
# ---------------------------------------------------------------------------

def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Spark 4 built-in XML scan: one record per ``row_tag`` element.
    Schema explicit by the same rule as CSV/JSON (inference is an
    extra full pass — opt-in only)."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
