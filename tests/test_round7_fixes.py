"""Round-7 regression tests for the null-semantics code-review fixes:

- ``stats._moments`` / ``corr_matrix``: PAIRWISE-COMPLETE counting —
  n and every sum share one null-excluding predicate (a nullable x/y
  previously inflated n while contributing nothing to the sums,
  silently biasing slope/intercept/r²/pearson_r);
- ``_TTEST_ORACLE``: the registry oracle now encodes the engine's
  null-skipping Welch contract (counts exclude NULL samples);
- ``stats.grouped_mode``: NULL values are not modal candidates and
  don't count toward the share denominator;
- ``relational.dq_expectations_orders``: a NULL o_orderstatus counts
  as a domain violation (bare NOT IN is NULL under 3VL);
- ``vector._lloyd_iterate``: an empty input returns an empty
  assignment instead of crashing in the local-solve fast path.

Every differential case runs the ENGINE against DuckDB over the same
null-bearing data — the gate tables are non-null, so these edges are
exactly what the registry parity suite cannot see.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from inf2106_map_reduce_spark.operators import relational, stats
from tests.oracle_utils import assert_matches_oracle


def _con_with(df_map: dict[str, pd.DataFrame]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name, pdf in df_map.items():
        con.register(f"_{name}_pdf", pdf)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM _{name}_pdf")
    return con


# ---------------------------------------------------------------------------
# grouped_ols: pairwise-complete moments
# ---------------------------------------------------------------------------

_OLS_NULL_PDF = pd.DataFrame(
    {
        "g": ["a", "a", "a", "a", "a", "b", "b", "b", "c"],
        "x": [1.0, 2.0, 3.0, None, 5.0, 1.0, 2.0, None, None],
        "y": [2.0, 4.1, 5.9, 7.0, None, 3.0, None, 9.0, None],
    }
)

_OLS_NULL_SQL = """
WITH m AS (
  SELECT g,
         CAST(COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
              AS DOUBLE) AS n,
         SUM(CASE WHEN y IS NOT NULL THEN x END) AS sx,
         SUM(CASE WHEN x IS NOT NULL THEN y END) AS sy,
         SUM(CASE WHEN y IS NOT NULL THEN x * x END) AS sxx,
         SUM(CASE WHEN x IS NOT NULL THEN y * y END) AS syy,
         SUM(x * y) AS sxy
  FROM t GROUP BY g
)
SELECT g,
       CAST(n AS BIGINT) AS n_rows,
       ROUND(CASE WHEN n * sxx - sx * sx != 0
             THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
       ROUND(CASE WHEN n * sxx - sx * sx != 0
             THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             END, 4) AS intercept,
       ROUND(CASE WHEN n * sxx - sx * sx != 0 AND n * syy - sy * sy != 0
             THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
FROM m ORDER BY g
"""


def test_grouped_ols_pairwise_complete_nulls(spark):
    df = spark.createDataFrame(_OLS_NULL_PDF)
    out = stats.grouped_ols(df, "x", "y", ["g"]).orderBy("g")
    assert_matches_oracle(out, _con_with({"t": _OLS_NULL_PDF}), _OLS_NULL_SQL)
    rows = {r["g"]: r for r in out.collect()}
    # n_rows is the COMPLETE-pair count, not the group row count
    assert rows["a"]["n_rows"] == 3  # 5 rows, 2 incomplete
    assert rows["b"]["n_rows"] == 1  # one complete pair -> no variance
    assert rows["b"]["slope"] is None
    assert rows["c"]["n_rows"] == 0  # no complete pair at all
    assert rows["c"]["slope"] is None and rows["c"]["r2"] is None


def test_grouped_ols_null_bias_actually_removed(spark):
    """The pre-fix form (n = COUNT(*)) produces a DIFFERENT slope on
    this data — guard that the fix changes the arithmetic, not just
    the docstring."""
    df = spark.createDataFrame(_OLS_NULL_PDF)
    row = {
        r["g"]: r for r in stats.grouped_ols(df, "x", "y", ["g"]).collect()
    }["a"]
    con = _con_with({"t": _OLS_NULL_PDF})
    biased = con.execute(
        """
        SELECT ROUND((COUNT(*) * SUM(x*y) - SUM(x) * SUM(y))
               / (COUNT(*) * SUM(x*x) - SUM(x) * SUM(x)), 6)
        FROM t WHERE g = 'a'
        """
    ).fetchone()[0]
    assert row["slope"] is not None and row["slope"] != biased


# ---------------------------------------------------------------------------
# corr_matrix: per-pair pairwise-complete moments
# ---------------------------------------------------------------------------


def test_corr_matrix_pairwise_complete_nulls(spark):
    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0, 4.0, None, 6.0],
            "b": [2.0, 1.0, 4.0, None, 5.0, 6.5],
            "c": [None, 3.0, 2.0, 5.0, 4.0, 1.0],
        }
    )
    out = stats.corr_matrix(spark.createDataFrame(pdf), ["a", "b", "c"])
    branches = []
    for x, y in (("a", "b"), ("a", "c"), ("b", "c")):
        both = f"{x} IS NOT NULL AND {y} IS NOT NULL"
        branches.append(
            f"""
            SELECT '{x}' AS col_x, '{y}' AS col_y,
              ROUND((n * p - sx * sy)
                / sqrt((n * qx - sx * sx) * (n * qy - sy * sy)), 6)
                AS pearson_r
            FROM (SELECT
              CAST(COUNT(CASE WHEN {both} THEN 1 END) AS DOUBLE) AS n,
              SUM(CASE WHEN {both} THEN {x} END) AS sx,
              SUM(CASE WHEN {both} THEN {y} END) AS sy,
              SUM(CASE WHEN {both} THEN {x} * {x} END) AS qx,
              SUM(CASE WHEN {both} THEN {y} * {y} END) AS qy,
              SUM(CASE WHEN {both} THEN {x} * {y} END) AS p
            FROM t)
            """
        )
    assert_matches_oracle(
        out, _con_with({"t": pdf}), "\nUNION ALL ".join(branches)
    )


# ---------------------------------------------------------------------------
# welch_ttest + its REGISTRY oracle: null-skipping on both sides
# ---------------------------------------------------------------------------


def test_ttest_registry_oracle_encodes_null_skipping(spark):
    """Run the actual `_TTEST_ORACLE` registry SQL against a
    null-bearing customer view — it must agree with the engine, i.e.
    its counts must exclude NULL c_acctbal like the engine's
    ``(group match) AND v.isNotNull()`` predicate does."""
    from inf2106_map_reduce_spark import queries

    pdf = pd.DataFrame(
        {
            "c_mktsegment": ["BUILDING"] * 5 + ["MACHINERY"] * 5 + ["AUTO"],
            "c_acctbal": [
                10.0, 20.0, None, 40.0, 55.0,
                5.0, None, None, 30.0, 45.0,
                99.0,
            ],
        }
    )
    out = stats.welch_ttest(
        spark.createDataFrame(pdf),
        "c_acctbal",
        "c_mktsegment",
        "BUILDING",
        "MACHINERY",
    )
    oracle = queries.REGISTRY["segment_balance_ttest"].oracle
    assert_matches_oracle(out, _con_with({"customer": pdf}), oracle)
    row = out.collect()[0]
    assert row["n_a"] == 4 and row["n_b"] == 3  # NULLs excluded from counts


# ---------------------------------------------------------------------------
# grouped_mode: NULL values are not modal candidates
# ---------------------------------------------------------------------------


def test_grouped_mode_ignores_null_values(spark):
    pdf = pd.DataFrame(
        {
            # g1: NULL is the raw plurality (3x) but "red" (2x) must win;
            #     share denominator = 3 non-null rows, not 6
            # g2: all NULL -> no output row
            "g": ["g1"] * 6 + ["g2"] * 2,
            "v": ["red", "red", "blue", None, None, None, None, None],
        }
    )
    out = stats.grouped_mode(spark.createDataFrame(pdf), "v", ["g"])
    assert_matches_oracle(
        out,
        _con_with({"t": pdf}),
        """
        WITH c AS (
          SELECT g, v, COUNT(*) AS n FROM t WHERE v IS NOT NULL
          GROUP BY 1, 2
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                      ORDER BY n DESC, v) AS rn,
                 SUM(n) OVER (PARTITION BY g) AS tot
          FROM c
        )
        SELECT g, v AS modal_value, n AS modal_count,
               ROUND(n / CAST(tot AS DOUBLE), 6) AS modal_share
        FROM r WHERE rn = 1
        """,
    )
    rows = out.collect()
    assert len(rows) == 1  # g2 (all-NULL) emits nothing
    assert rows[0]["modal_value"] == "red"
    assert rows[0]["modal_count"] == 2
    assert rows[0]["modal_share"] == pytest.approx(2 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# dq_expectations_orders: NULL status counts as a domain violation
# ---------------------------------------------------------------------------


def test_dq_null_status_is_domain_violation(spark, tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [1, 1, 2, 2],
            "o_orderstatus": ["O", None, "X", "F"],
            "o_totalprice": [100.0, 200.0, 300.0, 400.0],
            "o_orderdate": pd.to_datetime(["1996-01-01"] * 4),
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": pd.array([0, 1], dtype="int32"),
            "c_acctbal": [1.0, 2.0],
            "c_mktsegment": ["BUILDING", "AUTO"],
        }
    )
    # µs timestamps like the real testdata (ns-precision parquet reads
    # back differently and NULLs the engine's to_date range check)
    orders.to_parquet(tmp_path / "orders.parquet", coerce_timestamps="us")
    customer.to_parquet(tmp_path / "customer.parquet")
    out = relational.dq_expectations_orders(spark, str(tmp_path))
    status = [
        r for r in out.collect() if r["expectation"] == "orderstatus_in_domain"
    ][0]
    # the NULL row AND the 'X' row are both violations
    assert status["n_violations"] == 2
    assert not status["passed"]
    # and the registry oracle agrees on the same data
    from inf2106_map_reduce_spark import queries

    assert_matches_oracle(
        out.orderBy("expectation"),
        _con_with({"orders": orders, "customer": customer}),
        f"SELECT * FROM ({queries.REGISTRY['dq_expectations_orders'].oracle})"
        " ORDER BY expectation",
    )


# ---------------------------------------------------------------------------
# _lloyd_iterate: empty input takes the local path without crashing
# ---------------------------------------------------------------------------


def test_lloyd_iterate_empty_input(spark):
    from inf2106_map_reduce_spark.functions import vector

    empty = spark.createDataFrame(
        [], schema="vec_id bigint, emb array<double>"
    )
    cents = [[0.0, 0.0], [1.0, 1.0]]
    assigned, out_cents, rounds, shift = vector._lloyd_iterate(
        empty, cents, n_rounds=5, tol=1e-4
    )
    assert assigned.count() == 0
    assert [c for c in assigned.columns] == ["vec_id", "emb", "cid"]
    assert out_cents == cents  # centroids unchanged
    assert rounds == 0 and shift is None
