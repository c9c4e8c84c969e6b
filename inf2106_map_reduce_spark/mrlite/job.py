"""mrlite Job: pluggable map/reduce over Spark.

The reference job surface (SURVEY.md §3) is a config naming Mapper /
Reducer / Partitioner / Combiner classes plus ``num_reducers``; the
dataflow is fixed: read → map → partition → sort → (combine) → shuffle →
sorted-group reduce → write (``MapTaskServant.java:192-236``,
``ReduceTaskServant.java:206-316``). ``Job`` reproduces that contract:

- ``mapper(key, value) -> iterable[(key, value)]``  (M1, 1→N flat map;
  ``Mapper.map``, ``mapReduce.idl:70-73``)
- ``reducer(key, values: list) -> iterable[(key, value)]``  (R3; values
  fully materialized per key, matching ``sequence<any> Iterator``,
  ``idl:67`` / ``ReduceTaskServant.java:270-301``)
- ``combiner`` — same signature as reducer, applied map-side per
  partition after the local sort (M5,
  ``BufferOutputCollectorServant.java:140-175``)
- ``partitioner(key, num_partitions) -> int``  (M2; default
  ``abs(java_string_hashcode(key)) % n`` for placement parity with
  ``PartitionerServant.java:20-23``)
- ``num_reducers == 0`` → map-only job, no shuffle (M6,
  ``DirectOutputCollectorServant.java``).

Implementation notes (Spark-first): the map side is ``flatMap``; the
shuffle+sort is ``repartitionAndSortWithinPartitions`` (sort-based
shuffle with managed spill — the reference's no-spill in-heap buffer,
``BufferOutputCollectorServant.java:70``, simply OOMs past RAM); the
reduce side is a per-partition sorted group scan. This is the RDD layer
by design: the contract is imperative per-record UDFs, exactly the one
case SURVEY.md reserves for RDDs. Everything relational lives in
:mod:`inf2106_map_reduce_spark.operators` on DataFrames instead.

Scale: group values are materialized per key (reference contract).
For giant hot keys prefer the DataFrame layer (hash aggregation /
``applyInPandas``). Skewed shuffles: pass a salting partitioner or
raise ``num_reducers``.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from inf2106_map_reduce_spark.mrlite.tokenformat import (
    NONE_KEY,
    read_token_file,
    write_token_file,
)

KV = tuple[str, str]
MapFn = Callable[[str, str], Iterable[KV]]
ReduceFn = Callable[[str, list[str]], Iterable[KV]]
PartitionFn = Callable[[str, int], int]


def java_string_hashcode(s: str) -> int:
    """Java ``String.hashCode`` — 32-bit rolling hash. Lets tests pin
    partition placement against the reference's committed 6-reducer run
    (``mapreduce/dataset/teste100k*reduced<0-5>.txt``)."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    if h >= 0x80000000:
        h -= 0x100000000
    return h


def default_partitioner(key: str, n: int) -> int:
    """``abs(key.hashCode()) % n`` (``PartitionerServant.java:20-23``)."""
    return abs(java_string_hashcode(key)) % n


def _group_sorted(records: Iterator[KV], fn: ReduceFn) -> Iterator[KV]:
    """Sorted group scan: one ``fn(key, values)`` call per equal-key run
    (``ReduceTaskServant.java:263-301``)."""
    for key, group in itertools.groupby(records, key=lambda kv: kv[0]):
        yield from fn(key, [v for _, v in group])


class Job:
    """A reference-style MapReduce job executed on Spark.

    >>> job = Job(mapper=lambda k, v: [(w, "1") for w in v.split()],
    ...           reducer=lambda k, vs: [(k, str(sum(map(int, vs))))],
    ...           num_reducers=4)
    >>> df = job.run(spark, "input.txt", "out_dir")
    """

    def __init__(
        self,
        mapper: MapFn,
        reducer: ReduceFn | None = None,
        combiner: ReduceFn | None = None,
        partitioner: PartitionFn | None = None,
        num_reducers: int = 1,
    ) -> None:
        if num_reducers < 0:
            raise ValueError("num_reducers must be >= 0")
        if num_reducers > 0 and reducer is None:
            raise ValueError("reducer required when num_reducers > 0")
        self.mapper = mapper
        self.reducer = reducer
        self.combiner = combiner
        self.partitioner = partitioner or default_partitioner
        self.num_reducers = num_reducers

    def transform(self, records: DataFrame) -> DataFrame:
        """Run the dataflow on an existing ``(key, value)`` DataFrame
        and return the result as a ``(key, value)`` DataFrame."""
        spark = records.sparkSession
        mapper, reducer, combiner = self.mapper, self.reducer, self.combiner
        part_fn, n_red = self.partitioner, self.num_reducers

        rdd = records.rdd.map(lambda row: (row[0], row[1]))
        mapped = rdd.flatMap(lambda kv: mapper(kv[0], kv[1]))

        if n_red == 0:
            # M6 map-only path: narrow pipeline, no shuffle.
            return spark.createDataFrame(mapped, schema="key string, value string")

        if combiner is not None:
            # M5: map-side partial aggregation — local sort + group per
            # input partition, before the shuffle (cuts shuffle bytes,
            # the whole point at scale).
            mapped = mapped.mapPartitions(
                lambda it: _group_sorted(sorted(it), combiner)
            )

        shuffled = mapped.repartitionAndSortWithinPartitions(
            numPartitions=n_red,
            partitionFunc=lambda k: part_fn(k, n_red),
            keyfunc=lambda k: k,
        )
        reduced = shuffled.mapPartitions(lambda it: _group_sorted(it, reducer))
        return spark.createDataFrame(reduced, schema="key string, value string")

    def run(
        self,
        spark: SparkSession,
        input_path: str,
        output_path: str | None = None,
        single_file: bool = False,
    ) -> DataFrame:
        """Read token input, run the dataflow, optionally write token
        output; returns the result DataFrame either way."""
        result = self.transform(read_token_file(spark, input_path))
        if output_path is not None:
            write_token_file(result, output_path, single_file=single_file)
        return result


def word_count_job(num_reducers: int = 1, combine: bool = True) -> Job:
    """The reference's shipped application (``WordMapperServant.java:24-37``
    emits ``(word, "1")``; ``WordReducerServant.java:24-40`` integer-sums)."""

    def mapper(key: str, value: str) -> Iterable[KV]:
        del key  # raw tokens arrive keyed "none"
        return [(value, "1")]

    def reducer(key: str, values: list[str]) -> Iterable[KV]:
        return [(key, str(sum(int(v) for v in values)))]

    return Job(
        mapper=mapper,
        reducer=reducer,
        combiner=reducer if combine else None,
        num_reducers=num_reducers,
    )


__all__ = [
    "Job",
    "word_count_job",
    "java_string_hashcode",
    "default_partitioner",
    "NONE_KEY",
]
