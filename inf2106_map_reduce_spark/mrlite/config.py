"""Properties-file job front-end: run an mrlite :class:`Job` from the
reference's ``mapred.*`` config format.

The reference has no query language — a "query" is a Java properties
file naming the UDF servant classes, read in
``MasterServant.getProperties`` (``schedule/MasterServant.java:116-215``).
This module reproduces that interface for the Spark engine so a
reference user's job configs carry over: UDFs register under their
servant names, and :func:`run_config` wires up the same properties with
the same defaults —

- ``mapred.Input.name``          input token file (required)
- ``mapred.Mapper.servant-name`` mapper UDF name (required)
- ``mapred.Reducer.servant-name`` reducer UDF name
- ``mapred.Partitioner.servant-name`` partitioner UDF name (optional;
  default = Java ``String.hashCode`` parity, as the reference's
  ``PartitionerServant.java:20-23``)
- ``mapred.Reducers.number``     default ``"0"`` = map-only
  (``MasterServant.java:184``)
- ``mapred.Combine.flag``        default ``"false"``; when true,
  ``mapred.Combiner.servant-name`` defaults to the REDUCER name
  (``MasterServant.java:198-201``)
- ``mapred.Output.name``         output token dir (engine addition —
  the reference derives output names from the input; pass explicitly
  here or consume the returned DataFrame)
- ``mapred.Join.flag`` / ``mapred.Join.file-name`` — declared by the
  reference but NEVER implemented (``MasterServant.java:210-212``
  reads the flag; no code consumes it). This engine defines and
  implements the obvious semantic: when the flag is true, the job
  result is inner-joined on ``key`` against the named token file and
  the joined value is appended pipe-separated (``value|joined``) —
  the natural composition in the ``k|v`` record model.

  Deliberate default divergence: the reference defaults the flag to
  ``"true"`` (``MasterServant.java`` ``getProperty("mapred.Join.flag",
  "true")``) — harmless there because nothing consumes it. This engine
  ACTUALLY joins, so defaulting true would make every flag-less config
  fail on the missing ``mapred.Join.file-name``; the default here is
  ``"false"`` (join is opt-in). Configs that set the flag without
  naming the join file get an explicit missing-property error.

Cluster/CORBA plumbing properties (``corbaloc-host``, ``exec-nodes``,
container names, buffer sizes, reporter settings) have no Spark
analogue — Spark owns placement and buffering — and are accepted but
ignored, so unmodified reference configs parse cleanly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from inf2106_map_reduce_spark.mrlite.job import Job

#: servant-name -> Python UDF, the analogue of the reference's CORBA
#: naming-service lookup of Mapper/Reducer/Combiner/Partitioner servants
UDF_REGISTRY: dict[str, Callable] = {}


def register_udf(name: str):
    """Register a mapper/reducer/combiner/partitioner under a servant
    name so ``mapred.*.servant-name`` properties can resolve it."""

    def deco(fn: Callable) -> Callable:
        UDF_REGISTRY[name] = fn
        return fn

    return deco


def parse_properties(path: str) -> dict[str, str]:
    """Minimal Java ``.properties`` reader: ``k=v`` / ``k: v`` lines,
    ``#``/``!`` comments, surrounding whitespace stripped — the subset
    the reference's configs use (``java.util.Properties`` via
    ``MapReduceApp.java:92-97``)."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line[0] in "#!":
                continue
            # java.util.Properties splits at the FIRST separator in the
            # line, whichever of '='/':' that is — 'key: a=b' must parse
            # as key/'a=b', not 'key: a'/'b'.
            cuts = [i for i in (line.find("="), line.find(":")) if i >= 0]
            if cuts:
                cut = min(cuts)
                props[line[:cut].strip()] = line[cut + 1 :].strip()
    return props


def _required(props: dict[str, str], key: str) -> str:
    if key not in props:
        raise KeyError(f"job config is missing required property {key!r}")
    return props[key]


def _udf(name: str) -> Callable:
    if name not in UDF_REGISTRY:
        raise KeyError(
            f"no UDF registered under servant name {name!r}; register it "
            f"with @register_udf({name!r}) (known: {sorted(UDF_REGISTRY)})"
        )
    return UDF_REGISTRY[name]


def cluster_hints(props: dict[str, str]) -> dict[str, int]:
    """Map the reference's cluster-sizing properties to
    ``get_spark(profile="cluster")`` hints:

    - ``mapred.Workers.exec-nodes`` — ``;``-separated host list the
      reference instantiates one worker per node on
      (``MasterServant.java:172-181``) → ``executors``;
    - ``mapred.Mappers.number`` — defaults to the node count in the
      reference (``MasterServant.java:183-184``) → ``n_mappers``
      (informational; Spark derives map-task counts from splits).

    Usage: ``get_spark(profile="cluster",
    executors=cluster_hints(props)["executors"])`` — the properties
    file that sized the reference cluster sizes the Spark session's
    shuffle/speculation profile the same way."""
    nodes = [
        n
        for n in props.get("mapred.Workers.exec-nodes", "").split(";")
        if n.strip()
    ]
    executors = max(1, len(nodes))
    return {
        "executors": executors,
        "n_mappers": int(props.get("mapred.Mappers.number", str(executors))),
    }


def job_from_properties(props: dict[str, str]) -> tuple[Job, str, str | None]:
    """Build the :class:`Job` plus (input_path, output_path) from
    parsed ``mapred.*`` properties, with the reference's defaults."""
    input_path = _required(props, "mapred.Input.name")
    mapper = _udf(_required(props, "mapred.Mapper.servant-name"))
    num_reducers = int(props.get("mapred.Reducers.number", "0"))
    reducer = None
    if num_reducers > 0:
        reducer = _udf(_required(props, "mapred.Reducer.servant-name"))
    combiner = None
    if props.get("mapred.Combine.flag", "false").lower() == "true":
        combiner = _udf(
            props.get(
                "mapred.Combiner.servant-name",
                _required(props, "mapred.Reducer.servant-name"),
            )
        )
    partitioner = None
    if "mapred.Partitioner.servant-name" in props:
        partitioner = _udf(props["mapred.Partitioner.servant-name"])
    job = Job(
        mapper=mapper,
        reducer=reducer,
        combiner=combiner,
        partitioner=partitioner,
        num_reducers=num_reducers,
    )
    return job, input_path, props.get("mapred.Output.name")


def run_config(spark: SparkSession, path: str) -> DataFrame:
    """Parse a ``mapred.*`` properties file and run the job it names;
    returns the result DataFrame (and writes token output when
    ``mapred.Output.name`` is set)."""
    from pyspark.sql import functions as F

    from inf2106_map_reduce_spark.mrlite.tokenformat import (
        read_token_file,
        write_token_file,
    )

    props = parse_properties(path)
    job, input_path, output_path = job_from_properties(props)
    result = job.run(spark, input_path)
    if props.get("mapred.Join.flag", "false").lower() == "true":
        if "mapred.Join.file-name" not in props:
            raise KeyError(
                "mapred.Join.flag=true requires mapred.Join.file-name "
                "(the token file to join the job result against)"
            )
        side = read_token_file(spark, props["mapred.Join.file-name"]).select(
            F.col("key"), F.col("value").alias("_jv")
        )
        result = result.join(side, "key").select(
            "key", F.concat_ws("|", "value", "_jv").alias("value")
        )
    if output_path is not None:
        write_token_file(result, output_path)
    return result


# The reference's one shipped application, registered under its servant
# names (`user/WordMapperServant.java`, `user/WordReducerServant.java`)
# so its configs resolve out of the box.
@register_udf("WordMapper")
def word_mapper(key: str, value: str):
    del key  # raw tokens arrive keyed "none"
    return [(value, "1")]


@register_udf("WordReducer")
def word_reducer(key: str, values: list[str]):
    return [(key, str(sum(int(v) for v in values)))]
