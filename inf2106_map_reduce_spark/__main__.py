"""Command-line entry point: run registry queries or reference-style
``mapred.*`` job configs without writing a script.

    python -m inf2106_map_reduce_spark list [--tag TAG]
    python -m inf2106_map_reduce_spark run <query> [--sf DIR] [--limit N]
    python -m inf2106_map_reduce_spark explain <query> [--sf DIR]
    python -m inf2106_map_reduce_spark job <config.properties>

`run` prints the first rows of the named registry query; `explain`
prints its formatted physical plan; `job` executes an mrlite
properties-file job (the reference's interface, SURVEY.md §3).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="inf2106_map_reduce_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("--tag", default=None, help="filter by tag")

    p_run = sub.add_parser("run", help="run a registry query")
    p_run.add_argument("query")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)

    p_exp = sub.add_parser("explain", help="print a query's physical plan")
    p_exp.add_argument("query")
    p_exp.add_argument("--sf", default="/root/testdata/sf0.01")

    p_job = sub.add_parser("job", help="run a mapred.* properties job")
    p_job.add_argument("config")

    args = ap.parse_args(argv)

    from inf2106_map_reduce_spark.queries import REGISTRY

    if args.cmd == "list":
        for name, spec in sorted(REGISTRY.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            print(f"{name}\t[{', '.join(spec.tags)}]\t{spec.desc}")
        return 0

    from inf2106_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="inf2106-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "job":
            from inf2106_map_reduce_spark.mrlite.config import run_config

            run_config(spark, args.config).show(50, truncate=False)
            return 0
        if args.query not in REGISTRY:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = REGISTRY[args.query].fn(spark, args.sf)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
