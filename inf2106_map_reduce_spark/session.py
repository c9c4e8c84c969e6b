"""SparkSession factory with scale-minded defaults.

The reference system hand-built every execution mechanism this module
configures away (SURVEY.md §4.2): its FIFO scheduler, shared-FS shuffle,
k=4 external merge, straggler kill (``MasterServant.java:499-595``) are
all Spark built-ins or one-line configs here (speculation, AQE).

Local testing runs ``local[N]`` single-JVM; the same config block is what
we would ship to a 1000-executor cluster, with the documented overrides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Root for every write-once staged artifact (bucketed warehouse,
# partitioned/sorted/compacted layout dirs). Repo-adjacent, NOT /tmp:
# /tmp is cleared between driver rounds, which silently re-charged the
# one-time staging writes to whichever bench query touched them first
# (bucketed_orders_lineitem_join paid 5.5 s for a 1.1 s join in r03).
# Gitignored; on a cluster this is the real warehouse/catalog path.
WORK_ROOT = os.environ.get(
    "SPARK_GRAFT_WORK_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".stage"),
)

# Defaults sized for the local[32] test harness. On a real cluster:
#  - shuffle.partitions: ~2-3x total executor cores (AQE coalesces down,
#    so err high; at 100 TB with 1000 executors x 8 cores -> ~20000).
#  - maxPartitionBytes: 256m for parquet scans of wide fact tables keeps
#    scan tasks ~O(100 MB compressed) -> decompressed fits executor mem.
#  - autoBroadcastJoinThreshold: dimension tables (region/nation/
#    supplier/part at TPC-H shape) stay broadcastable far beyond sf1k.
_SCALE_DEFAULTS: dict[str, str] = {
    # Adaptive execution: runtime re-plan, partition coalescing and
    # skew-join splitting replace the reference's straggler heuristics.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Straggler mitigation: the reference kills tasks at 1.2x/2x the
    # running-mean duration (MasterServant.java:510,552). Spark's
    # speculation is the managed equivalent. Harmless in local mode.
    "spark.speculation": "false",  # enable on a real cluster
    # Deterministic timestamp semantics for oracle comparison.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for every pandas UDF / applyInPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: permissive coercion matches DuckDB-oracle-friendly
    # behavior for the test queries (no overflow in these datasets).
    "spark.sql.ansi.enabled": "false",
    # events.parquet carries TIMESTAMP(NANOS); Spark's reader rejects it
    # unless read as raw nanos (we floor-convert to microseconds in
    # tables.load_table — DuckDB's scan truncates identically).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Bucketed-table warehouse (operators.bucketing) — under WORK_ROOT
    # so completed writes survive /tmp cleanup across sessions; on a
    # cluster this is the real catalog/warehouse.
    "spark.sql.warehouse.dir": os.path.join(WORK_ROOT, "warehouse"),
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Quiet progress bars in test output.
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
}


def cluster_conf(
    executors: int = 1000, cores_per_executor: int = 8
) -> dict[str, str]:
    """The documented cluster overrides (SCALING.md table) as an
    executable conf dict — what ``get_spark(profile="cluster")``
    applies on top of the shared defaults:

    - ``shuffle.partitions`` ≈ 2.5× total cores (AQE coalesces down,
      so err high; 1000 executors × 8 cores → 20k);
    - ``maxPartitionBytes`` 256 MB so wide-fact parquet scan tasks stay
      ~O(100 MB compressed) and decompress within executor memory;
    - speculation ON — the managed equivalent of the reference's
      1.2×/2× straggler kill-and-reschedule
      (``MasterServant.java:499-595``).

    The executor/core counts come from the caller (spark-submit /
    k8s operator sizing, or the config front-end's
    ``mapred.Workers.exec-nodes`` hint via
    mrlite.config.cluster_hints)."""
    total_cores = executors * cores_per_executor
    return {
        "spark.sql.shuffle.partitions": str(int(total_cores * 2.5)),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.speculation": "true",
    }


def get_spark(
    app_name: str = "inf2106-map-reduce-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    profile: str = "local",
    executors: int = 1000,
    cores_per_executor: int = 8,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for the test harness; pass an explicit master / rely on spark-submit
    on a cluster.

    ``profile="cluster"`` applies :func:`cluster_conf` (the SCALING.md
    formulas) on top of the shared defaults — the "same config block
    we'd ship" claim, executable. ``extra_conf`` still wins last.
    """
    if profile not in ("local", "cluster"):
        raise ValueError(f"unknown profile {profile!r}")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_SCALE_DEFAULTS)
    if profile == "cluster":
        conf.update(cluster_conf(executors, cores_per_executor))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # The reference's token k|v format is part of the engine's surface;
    # register it so `spark.read.format("tokenkv")` works out of the
    # box on every engine session (idempotent, ~free).
    from inf2106_map_reduce_spark.sources.token_datasource import register

    register(spark)
    return spark
