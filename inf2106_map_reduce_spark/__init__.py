"""PySpark-native analytics engine with the query & data-processing
capabilities of brunofms/inf2106_map-reduce (reference: a Java/CORBA
MapReduce framework, see SURVEY.md).

Layers
------
- :mod:`inf2106_map_reduce_spark.mrlite` — the reference's programming
  model (Mapper/Reducer/Combiner/Partitioner jobs over ``key|value``
  token text), re-expressed on Spark primitives.
- :mod:`inf2106_map_reduce_spark.operators` — the relational query
  surface (joins, aggregation, windows, set ops, top-k, as-of/range
  joins) as composable ``DataFrame -> DataFrame`` functions.
- :mod:`inf2106_map_reduce_spark.functions` — large-scale training-data
  pipeline ops: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search over embeddings, text analysis, multimodal column
  plumbing.
- :mod:`inf2106_map_reduce_spark.streaming` — Structured Streaming
  windows/watermark/stateful slice over the ``events`` table.
- :mod:`inf2106_map_reduce_spark.plans` — plan inspection helpers
  (pushdown / broadcast / codegen assertions used by tests).

Everything is designed partition-parallel for ~100 TB scale: no
driver-side ``collect`` in any operator, AQE on, broadcast hints for
dimension tables, and documented shuffle behavior per operator.
"""

from inf2106_map_reduce_spark.session import get_spark
from inf2106_map_reduce_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]
