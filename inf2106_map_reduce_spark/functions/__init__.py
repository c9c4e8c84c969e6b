"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal column plumbing.

These extend the reference's capability surface (its only "pipeline"
is word count, SURVEY.md §0) with the ops a 100 TB LLM-data pipeline
needs. All hot paths are built-in JVM expressions (md5, explode,
aggregate/zip_with) — no Python in any per-row loop; Pandas UDFs appear
only in multimodal decode plumbing where a real decoder library would
sit.
"""
