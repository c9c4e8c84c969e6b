"""Source / sink connectors (SURVEY.md §2.1 S1-S3, §7.2 M3 scans).

The reference's only format is the token ``k|v`` text stream
(:mod:`inf2106_map_reduce_spark.mrlite.tokenformat`); this package is
the superset format registry a Spark engine gets from
``DataFrameReader``/``DataFrameWriter``: parquet, CSV, JSON-lines and
plain text, each with explicit-schema reads so scans never pay
inference and Catalyst keeps pushdown + pruning.
"""

from inf2106_map_reduce_spark.mrlite.tokenformat import (  # noqa: F401
    read_token_file,
    write_token_file,
)
from inf2106_map_reduce_spark.sources.formats import (  # noqa: F401
    read_csv,
    read_jsonl,
    read_orc,
    read_parquet,
    read_text,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
    write_text,
)
