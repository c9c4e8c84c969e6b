"""t2 correctness: every registry query hash-matches its DuckDB oracle
at sf0.01 (mirrors the driver's CORRECTNESS gate: row count + schema +
order-insensitive exact values)."""

from __future__ import annotations

import pytest

from inf2106_map_reduce_spark.queries import REGISTRY

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
    assert_matches_oracle(df, con, spec.oracle)


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
