#!/usr/bin/env python
"""Pure-map scaling probe: the mention-detection scan (regex extraction +
explode + label normalization + hash aggregate) is the pipeline's dominant
corpus-scale stage and contains ZERO joins and ONE map-side-combined
exchange — as close to embarrassingly parallel as a Spark stage gets. Its
N→4N speedup is therefore an upper bound on what ANY plan can achieve on
this box: if the pure map stops at k× < 4×, the residual efficiency gap of
the full pipeline is hardware (shared memory bus / host interference), not
plan shape.

Usage: python BENCH/map_scaling.py --cpus 2 --files 2000000
Appends one JSON line to BENCH/map_scaling_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = os.path.join(ROOT, "BENCH", "map_scaling_runs.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=2000000)
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from wikidata_wikifier_spark.session import get_spark

    spark = get_spark(
        app_name=f"map-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    src_path = os.path.join(ROOT, "BENCH", ".data", f"files_{args.files}")
    source = spark.read.parquet(src_path).repartition(args.cpus * 2).localCheckpoint()
    n_files = source.count()

    from wikidata_wikifier_spark.operators.mentions import detect_mentions

    t0 = time.perf_counter()
    n = detect_mentions(source, with_context=False).count()
    wall = time.perf_counter() - t0
    rec = {
        "cpus": args.cpus,
        "n_files": n_files,
        "n_mentions": n,
        "wall_sec": round(wall, 2),
        "files_per_sec": round(n_files / wall, 1),
    }
    with open(RUNS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
