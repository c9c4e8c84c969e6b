"""t2 correctness: every registry query hash-matches its DuckDB oracle
at sf0.01 (mirrors the driver's CORRECTNESS gate: row count + schema +
order-insensitive exact values)."""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.queries import REGISTRY, oracle_for

from tests.oracle_utils import assert_matches_oracle, duckdb_connection

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_connection(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_oracle, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_oracle)
    assert_matches_oracle(df, con, oracle_for(name, sf_oracle))


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """The engine session with ANSI mode ON — the driver runs a vanilla
    SparkSession where ANSI is the Spark 4 default, while session.py
    pins it off; ANSI-only bugs (e.g. a sum-of-xxhash64 long overflow
    that wraps silently when off but raises when on) otherwise surface
    only in the hand-run driver-sim. ``ansi.enabled`` is a runtime
    conf, so flipping it on the shared session is exact."""
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.mark.ansi
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_ansi(ansi_spark, sf_oracle, con, name):
    """The full parity suite, ANSI-on (`pytest -m ansi`) — excluded
    from the default run (pytest.ini addopts) because it doubles the
    suite; part of the pre-driver round ritual."""
    spec = REGISTRY[name]
    df = spec.fn(ansi_spark, sf_oracle)
    assert_matches_oracle(df, con, oracle_for(name, sf_oracle))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_oracle, name):
    df = REGISTRY[name].fn(spark, sf_oracle)
    assert df.count() >= 0 and len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
