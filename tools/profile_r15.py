"""Round-15 optimization profiler: time individual registry queries
with warm repeats in one session, so per-query reads are medians over
stable plans instead of the bench's single weather-exposed shot.

Usage:
  python tools/profile_r15.py q1_pricing_summary dedup_prefix_jaccard
  python tools/profile_r15.py --repeats 5 --explain plans/r15 NAME...

Each query is warmed once (untimed) then timed ``--repeats`` times with
the noop sink (guide §1.4); prints min/median/max per query plus the
bench-style single cold-ish first shot. ``--explain DIR`` additionally
writes ``DIR/<name>_before.txt`` (or ``_after.txt`` with --tag after)
with the formatted physical plan.

Session caches (quantile bucket maps, dedup stage, state-key
estimates) behave exactly as in bench.py: the first touch pays, warm
repeats measure the steady state — the same accounting the bench's
WARMUP block applies.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inf2106_map_reduce_spark.queries import REGISTRY  # noqa: E402
from inf2106_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default="", help="dir for plan dumps")
    ap.add_argument("--tag", default="before", choices=("before", "after"))
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the untimed warm pass (measure cold)")
    args = ap.parse_args()

    spark = get_spark(app_name="profile-r15")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        if name not in REGISTRY:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs: list[float] = []
        n_total = args.repeats + (0 if args.no_warm else 1)
        for i in range(n_total):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if args.no_warm or i > 0:
                runs.append(dt)
            else:
                first = dt
        med = statistics.median(runs)
        cold = "" if args.no_warm else f" first={first:.3f}"
        print(
            f"{name}: median={med:.3f} min={min(runs):.3f} "
            f"max={max(runs):.3f} n={len(runs)}{cold}",
            flush=True,
        )
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            out = os.path.join(args.explain, f"{name}_{args.tag}.txt")
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(out, "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
