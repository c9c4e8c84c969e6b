"""Settle-protocol measurement for the r14 verdict's three weak rows.

Fresh session, CPU+scan probes on BOTH sides, first-touch + 3 warm
reps per row at sf0.1 (the driver's bench scale), WARMUP applied the
same way bench.py applies it (docs_bm25_topk is a WARMUP entry, so
its operative line is the warm one). Zero code diffs on all three
paths since their last landing commits (git log -L: retrieval.py BM25
last touched 4b305f3-era, pipeline.py bigram 12601fc-era,
roundtrip.py binaryFile cca01c8-era) — this run decides
weather-vs-code per BASELINE.md's settle protocol.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inf2106_map_reduce_spark.session import get_spark  # noqa: E402
from inf2106_map_reduce_spark.queries import REGISTRY  # noqa: E402

ROWS = ["docs_bm25_topk", "docs_bigram_logprob", "source_binaryfile_ingest"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def median5(task):
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        task()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[2], 3)


def main():
    spark = get_spark(app_name="settle-r15")
    spark.sparkContext.setLogLevel("ERROR")

    def cal_cpu():
        return median5(
            lambda: spark.range(200_000_000)
            .selectExpr("sum(id * 3 % 7) AS s")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def cal_scan():
        li = os.path.join(SF_DIR, "lineitem.parquet")
        task = lambda: (  # noqa: E731
            spark.read.parquet(li)
            .groupBy("l_suppkey")
            .agg({"l_quantity": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        task()
        return median5(task)

    out = {"sf_dir": SF_DIR, "probes_before": {"cpu": cal_cpu(), "scan": cal_scan()}}
    for name in ROWS:
        reps = []
        for _ in range(4):  # rep 0 = first-touch, 1-3 = warm
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = reps
    out["probes_after"] = {"cpu": cal_cpu(), "scan": cal_scan()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
