"""Relational operator surface (SURVEY.md §2.5).

The reference has no relational operators — its only dataflow is
map/shuffle/reduce (SURVEY.md §2). This package is the superset query
surface, each operator a composable, partition-parallel DataFrame
function with a DuckDB-oracle-checked query in the registry
(:mod:`inf2106_map_reduce_spark.queries`).
"""
