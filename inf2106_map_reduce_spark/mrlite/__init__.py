"""mrlite — the reference's MapReduce programming model on Spark.

Reproduces the observable behavior of the reference dataflow
(SURVEY.md §2): split → record-read → map → partition → sort →
(combine) → shuffle → sorted-group reduce → record-write, with
pluggable Python mapper / reducer / combiner / partitioner and the
``key|value`` token text format.

Spark supplies every mechanism the reference hand-built: input
splitting (``IOFormatServant.java:130-164``) is logical byte-ranges,
the buffered sort-shuffle (``BufferOutputCollectorServant.java``) and
the k=4 external merge (``ReduceTaskServant.java:206-261``) are the
sort-based shuffle with managed spill, and fault tolerance is lineage
re-execution instead of the master's monitor threads.
"""

from inf2106_map_reduce_spark.mrlite.job import Job, java_string_hashcode
from inf2106_map_reduce_spark.mrlite.tokenformat import (
    NONE_KEY,
    read_token_file,
    serialize_records,
    write_token_file,
)
from inf2106_map_reduce_spark.mrlite.wordcount import word_count, word_count_sql

__all__ = [
    "Job",
    "java_string_hashcode",
    "NONE_KEY",
    "read_token_file",
    "write_token_file",
    "serialize_records",
    "word_count",
    "word_count_sql",
]
