#!/usr/bin/env python
"""r06 measurement sidecar (bench.py is FROZEN for the driver; extra
instrumentation lives here per the round brief).

Modes:
  --plans DIR     write explain("formatted") for each query to DIR/<q>.txt
  --noop          time each query with the noop sink (guide §1.4) instead
                  of the frozen harness's .count() — isolates computation
                  from result collection; median of --runs.
  --queries ...   subset (default: the bench.py HEADLINE list)

Job descriptions are set per query (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from bench import HEADLINE
    from wikidata_wikifier_spark.queries import QUERIES
    from wikidata_wikifier_spark.session import get_spark

    names = [n for n in (args.queries or HEADLINE) if n in QUERIES]
    spark = get_spark(app_name="wikifier-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            print(f"wrote {args.plans}/{name}.txt", file=sys.stderr)

    if args.noop:
        out: dict[str, float] = {}
        # warm the JVM once, mirroring bench.py
        QUERIES[names[0]](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in names:
            samples = []
            for i in range(max(args.runs, 1)):
                spark.sparkContext.setJobDescription(f"{name} noop run{i}")
                t0 = time.perf_counter()
                QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            out[name] = round(statistics.median(samples), 3)
            print(f"{name}: {out[name]}s {['%.2f' % s for s in samples]}", file=sys.stderr)
        print(json.dumps({"noop_median": out, "sf_dir": args.sf_dir}))

    spark.stop()


if __name__ == "__main__":
    main()
