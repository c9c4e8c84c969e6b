"""Failure-recovery parity with the reference's O4-O6 (failure
detection + task re-creation): Spark's task retry is EXERCISED, not
just documented. A transient task failure (first attempt of one
partition dies) must be retried and produce exactly the same result
as a clean run — the reference's "task re-created on another worker"
semantic (MasterServant's re-queue on worker failure).

Runs in a subprocess because task retries need a
``local[N, maxFailures]`` master, and the shared session fixture is
single-attempt ``local[32]``.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import os, tempfile
from pyspark.sql import SparkSession
from pyspark import TaskContext

marker = tempfile.mkdtemp(prefix="fault_marker_")

spark = (
    SparkSession.builder.master("local[4, 3]")
    .appName("fault-tolerance-parity")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, 1000, 1, 8)

def flaky(it):
    ctx = TaskContext.get()
    # partition 3's first attempt dies AFTER yielding some rows — the
    # retry must not double-count them (orphan-writer safety, the
    # reference's EventSinkMaster re-queue case)
    if ctx.partitionId() == 3 and ctx.attemptNumber() == 0:
        open(os.path.join(marker, "failed_once"), "w").write("1")
        for pdf in it:
            yield pdf.head(2)
            raise RuntimeError("injected transient failure")
    for pdf in it:
        yield pdf

out = df.mapInPandas(flaky, "id long")
total = out.count()
s = out.agg({"id": "sum"}).collect()[0][0]
assert os.path.exists(os.path.join(marker, "failed_once")), "fault never injected"
assert total == 1000, f"row count after retry: {total}"
assert s == 999 * 1000 // 2, f"sum after retry: {s}"
print("RECOVERED-EXACT")
spark.stop()
"""


def test_task_retry_recovers_exact_result():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RECOVERED-EXACT" in out.stdout
