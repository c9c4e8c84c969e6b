"""Structured Streaming slice (SURVEY.md §7.2 M5).

The reference is strictly batch (SURVEY.md §2.5); this package is the
streaming superset: tumbling / sliding / session windows with
watermarks over the ``events`` table, runnable in batch (for the
DuckDB oracle) and as a real stream via ``Trigger.AvailableNow`` with
batch-parity tests.
"""
