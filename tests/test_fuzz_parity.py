"""Property-based differential fuzzing of the relational surface:
randomly generated filter+groupBy+agg specs over ``orders`` are
rendered BOTH as a DataFrame plan and as SQL, and must hash-match the
DuckDB oracle exactly — the registry checks 175 hand-written queries;
this checks the COMPOSITION SPACE between them.

Determinism rules baked into the generator (the same rules every
registry oracle follows): only order-insensitive aggregates (count /
min / max / integer sum / count-distinct), no float summation, filters
on exact-comparable columns, and a deterministic seed so failures
reproduce.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table
from tests.oracle_utils import assert_matches_oracle, duckdb_connection

GROUP_COLS = {
    "o_orderstatus": "o_orderstatus",
    "o_orderpriority": "o_orderpriority",
    "order_year": "CAST(year(o_orderdate) AS INT)",
}

AGGS = {
    "n_rows": (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "COUNT(*) AS n_rows",
    ),
    "n_cust": (
        lambda: F.count_distinct(F.col("o_custkey")).alias("n_cust"),
        "COUNT(DISTINCT o_custkey) AS n_cust",
    ),
    "min_price": (
        lambda: F.round(F.min("o_totalprice"), 2).alias("min_price"),
        "ROUND(MIN(o_totalprice), 2) AS min_price",
    ),
    "max_price": (
        lambda: F.round(F.max("o_totalprice"), 2).alias("max_price"),
        "ROUND(MAX(o_totalprice), 2) AS max_price",
    ),
    "sum_key": (
        lambda: F.sum("o_orderkey").cast("bigint").alias("sum_key"),
        "CAST(SUM(o_orderkey) AS BIGINT) AS sum_key",
    ),
    "min_date": (
        lambda: F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        "MIN(CAST(o_orderdate AS DATE)) AS min_date",
    ),
}

FILTERS = [
    (
        lambda: F.col("o_orderstatus") == "F",
        "o_orderstatus = 'F'",
    ),
    (
        lambda: F.col("o_totalprice") > 150000.0,
        "o_totalprice > 150000.0",
    ),
    (
        lambda: F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"),
        "o_orderdate >= TIMESTAMP '1995-01-01'",
    ),
    (
        lambda: F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    ),
    (
        lambda: F.col("o_custkey") % 7 == 3,
        "o_custkey % 7 = 3",
    ),
]


def _cases(n: int, seed: int = 2026):
    rng = random.Random(seed)
    for i in range(n):
        groups = rng.sample(sorted(GROUP_COLS), rng.randint(0, 2))
        aggs = rng.sample(sorted(AGGS), rng.randint(1, 3))
        filters = rng.sample(range(len(FILTERS)), rng.randint(0, 2))
        yield i, groups, aggs, filters


def test_random_relational_specs_match_duckdb(spark, sf_smoke):
    con = duckdb_connection(sf_smoke)
    o = load_table(spark, sf_smoke, "orders")
    for i, groups, aggs, filters in _cases(25):
        df = o
        conds = []
        for fi in filters:
            df = df.filter(FILTERS[fi][0]())
            conds.append(FILTERS[fi][1])
        gexprs = {
            "o_orderstatus": F.col("o_orderstatus"),
            "o_orderpriority": F.col("o_orderpriority"),
            "order_year": F.year("o_orderdate").cast("int").alias("order_year"),
        }
        agg_cols = [AGGS[a][0]() for a in aggs]
        if groups:
            df = df.groupBy(*[gexprs[g].alias(g) for g in groups]).agg(*agg_cols)
        else:
            df = df.agg(*agg_cols)
        sql = "SELECT "
        sel = [f"{GROUP_COLS[g]} AS {g}" for g in groups] + [AGGS[a][1] for a in aggs]
        sql += ", ".join(sel) + " FROM orders"
        if conds:
            sql += " WHERE " + " AND ".join(conds)
        if groups:
            sql += " GROUP BY " + ", ".join(GROUP_COLS[g] for g in groups)
        try:
            assert_matches_oracle(df, con, sql)
        except AssertionError as e:
            raise AssertionError(
                f"fuzz case {i} diverged: groups={groups} aggs={aggs} "
                f"filters={[FILTERS[f][1] for f in filters]}\n{e}"
            ) from e


JOIN_TYPES = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "left_semi": "SEMI JOIN",
    "left_anti": "ANTI JOIN",
}

JOIN_GROUPS = {
    "c_mktsegment": "c_mktsegment",
    "o_orderstatus": "o_orderstatus",
    "c_nationkey": "c_nationkey",
}

JOIN_AGGS = {
    "n_rows": (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "COUNT(*) AS n_rows",
    ),
    "n_orders": (
        lambda: F.count_distinct(F.col("o_orderkey")).alias("n_orders"),
        "COUNT(DISTINCT o_orderkey) AS n_orders",
    ),
    "max_bal": (
        lambda: F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        "ROUND(MAX(c_acctbal), 2) AS max_bal",
    ),
    "min_key": (
        lambda: F.min("c_custkey").alias("min_key"),
        "MIN(c_custkey) AS min_key",
    ),
}

JOIN_FILTERS = [
    (lambda: F.col("c_acctbal") > 0.0, "c_acctbal > 0.0"),
    (
        lambda: F.col("c_mktsegment").isin("BUILDING", "MACHINERY"),
        "c_mktsegment IN ('BUILDING', 'MACHINERY')",
    ),
    (lambda: F.col("c_nationkey") < 13, "c_nationkey < 13"),
]


def test_random_join_specs_match_duckdb(spark, sf_smoke):
    """Same differential game over the join composition space:
    customer x orders through inner/left/semi/anti joins. Semi/anti
    restrict the groupable/aggregable columns to the left side, which
    the generator respects — exactly the asymmetry a hand-written
    suite under-covers."""
    con = duckdb_connection(sf_smoke)
    c = load_table(spark, sf_smoke, "customer")
    o = load_table(spark, sf_smoke, "orders")
    rng = random.Random(64_2026)
    for i in range(20):
        jt = rng.choice(sorted(JOIN_TYPES))
        left_only = jt in ("left_semi", "left_anti")
        groups = rng.sample(
            [g for g in sorted(JOIN_GROUPS) if not (left_only and g.startswith("o_"))],
            rng.randint(0, 2),
        )
        aggs = rng.sample(
            [
                a
                for a in sorted(JOIN_AGGS)
                if not (left_only and a in ("n_orders",))
            ],
            rng.randint(1, 2),
        )
        filters = rng.sample(range(len(JOIN_FILTERS)), rng.randint(0, 2))

        cf = c
        conds = []
        for fi in filters:
            cf = cf.filter(JOIN_FILTERS[fi][0]())
            conds.append(JOIN_FILTERS[fi][1])
        df = cf.join(o, cf.c_custkey == o.o_custkey, jt)
        agg_cols = [JOIN_AGGS[a][0]() for a in aggs]
        if groups:
            df = df.groupBy(*groups).agg(*agg_cols)
        else:
            df = df.agg(*agg_cols)

        where = (" WHERE " + " AND ".join(conds)) if conds else ""
        base = f"(SELECT * FROM customer{where}) c"
        sel = [JOIN_GROUPS[g] for g in groups] + [JOIN_AGGS[a][1] for a in aggs]
        sql = (
            f"SELECT {', '.join(sel)} FROM {base} "
            f"{JOIN_TYPES[jt]} orders ON c.c_custkey = orders.o_custkey"
        )
        if groups:
            sql += " GROUP BY " + ", ".join(JOIN_GROUPS[g] for g in groups)
        try:
            assert_matches_oracle(df, con, sql)
        except AssertionError as e:
            raise AssertionError(
                f"join fuzz case {i} diverged: jt={jt} groups={groups} "
                f"aggs={aggs} filters={[JOIN_FILTERS[f][1] for f in filters]}\n{e}"
            ) from e


def test_random_window_specs_match_duckdb(spark, sf_smoke):
    """Differential fuzzing of the window surface: random partition /
    total-order / function / frame combinations, ROWS frames spelled
    explicitly on both sides, integer aggregates only. Ordering is
    always made total with the orderkey tiebreak — the rule every
    registry window query follows."""
    from pyspark.sql import Window

    con = duckdb_connection(sf_smoke)
    o = load_table(spark, sf_smoke, "orders").filter(
        F.col("o_custkey") % 37 == 1
    )

    parts = {
        "": None,
        "o_orderstatus": "o_orderstatus",
        "o_orderpriority": "o_orderpriority",
    }
    orders_by = {
        "date": (
            [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
            "o_orderdate ASC, o_orderkey ASC",
        ),
        "price_desc": (
            [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
            "o_totalprice DESC, o_orderkey ASC",
        ),
    }
    rng = random.Random(1789)
    for i in range(15):
        pkey = rng.choice(sorted(parts))
        okey = rng.choice(sorted(orders_by))
        ocols, osql = orders_by[okey]
        w = Window.partitionBy(*([pkey] if pkey else [])).orderBy(*ocols)
        over = (
            f"OVER (PARTITION BY {parts[pkey]} ORDER BY {osql}"
            if pkey
            else f"OVER (ORDER BY {osql}"
        )
        fn = rng.choice(["row_number", "lag", "running_sum", "moving_min"])
        if fn == "row_number":
            col = F.row_number().over(w).alias("v")
            vsql = f"ROW_NUMBER() {over}) AS v"
        elif fn == "lag":
            col = F.lag("o_orderkey", 1).over(w).alias("v")
            vsql = f"LAG(o_orderkey, 1) {over}) AS v"
        elif fn == "running_sum":
            wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            col = F.sum("o_orderkey").over(wf).cast("bigint").alias("v")
            vsql = (
                f"CAST(SUM(o_orderkey) {over} ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND CURRENT ROW) AS BIGINT) AS v"
            )
        else:
            wf = w.rowsBetween(-2, Window.currentRow)
            col = F.min("o_orderkey").over(wf).alias("v")
            vsql = (
                f"MIN(o_orderkey) {over} ROWS BETWEEN 2 PRECEDING "
                "AND CURRENT ROW) AS v"
            )
        df = o.select("o_orderkey", col)
        sql = (
            f"SELECT o_orderkey, {vsql} FROM orders WHERE o_custkey % 37 = 1"
        )
        try:
            assert_matches_oracle(df, con, sql)
        except AssertionError as e:
            raise AssertionError(
                f"window fuzz case {i} diverged: part={pkey!r} order={okey} fn={fn}\n{e}"
            ) from e


# ---------------------------------------------------------------------------
# Null-heavy dimension: 3VL composition over deterministically-nulled
# columns — IS [NOT] NULL filters, null-safe equality, null-skipping
# and null-counting aggregates, and NULL group keys.
# ---------------------------------------------------------------------------

_NULLED_SRC_SQL = (
    "(SELECT o_orderkey, o_orderpriority, "
    "CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS v, "
    "CASE WHEN o_custkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS s "
    "FROM orders) t"
)

NULL_GROUPS = {
    "o_orderpriority": "o_orderpriority",
    "s": "s",  # nullable group key: NULLs form their own group
}

NULL_AGGS = {
    "n_rows": (lambda: F.count(F.lit(1)).alias("n_rows"), "COUNT(*) AS n_rows"),
    "n_v": (lambda: F.count("v").alias("n_v"), "COUNT(v) AS n_v"),
    "n_s_distinct": (
        lambda: F.count_distinct(F.col("s")).alias("n_s_distinct"),
        "COUNT(DISTINCT s) AS n_s_distinct",
    ),
    "min_v": (
        lambda: F.round(F.min("v"), 2).alias("min_v"),
        "ROUND(MIN(v), 2) AS min_v",
    ),
    "n_null_v": (
        lambda: F.sum(F.col("v").isNull().cast("bigint")).alias("n_null_v"),
        "CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_null_v",
    ),
}

NULL_FILTERS = [
    (lambda: F.col("v").isNull(), "v IS NULL"),
    (lambda: F.col("v").isNotNull(), "v IS NOT NULL"),
    (
        lambda: F.col("s").eqNullSafe(F.lit("F")),
        "s IS NOT DISTINCT FROM 'F'",
    ),
    (
        lambda: F.coalesce(F.col("v"), F.lit(0.0)) > 150000.0,
        "COALESCE(v, 0.0) > 150000.0",
    ),
    # plain 3VL comparison: NULL rows silently drop
    (lambda: F.col("s") == "O", "s = 'O'"),
]


def test_random_null_semantics_specs_match_duckdb(spark, sf_smoke):
    con = duckdb_connection(sf_smoke)
    o = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % 5 != 0, F.col("o_totalprice")
        ).alias("v"),
        F.when(
            F.col("o_custkey") % 3 != 0, F.col("o_orderstatus")
        ).alias("s"),
    )
    rng = random.Random(777)
    for i in range(25):
        groups = rng.sample(sorted(NULL_GROUPS), rng.randint(0, 2))
        aggs = rng.sample(sorted(NULL_AGGS), rng.randint(1, 3))
        filters = rng.sample(range(len(NULL_FILTERS)), rng.randint(0, 2))
        df = o
        conds = []
        for fi in filters:
            df = df.filter(NULL_FILTERS[fi][0]())
            conds.append(NULL_FILTERS[fi][1])
        agg_cols = [NULL_AGGS[a][0]() for a in aggs]
        if groups:
            df = df.groupBy(*groups).agg(*agg_cols)
        else:
            df = df.agg(*agg_cols)
        sel = [f"{NULL_GROUPS[g]} AS {g}" for g in groups] + [
            NULL_AGGS[a][1] for a in aggs
        ]
        sql = "SELECT " + ", ".join(sel) + f" FROM {_NULLED_SRC_SQL}"
        if conds:
            sql += " WHERE " + " AND ".join(conds)
        if groups:
            sql += " GROUP BY " + ", ".join(NULL_GROUPS[g] for g in groups)
        try:
            assert_matches_oracle(df, con, sql)
        except AssertionError as e:
            raise AssertionError(
                f"null-fuzz case {i} diverged: groups={groups} aggs={aggs} "
                f"filters={[NULL_FILTERS[f][1] for f in filters]}\n{e}"
            ) from e
