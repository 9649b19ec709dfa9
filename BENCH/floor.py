#!/usr/bin/env python
"""Scheduler-floor decomposition for the N→4N efficiency evidence.

The end-to-end KG job is T(N) = S + C(N): a fixed driver/scheduler
component S (job submission, barrier materialization of vocabulary-scale
tables, broadcast exchanges — independent of input size and parallelism)
plus the data-parallel compute C(N). S is measured directly by running
the IDENTICAL pipeline on a near-empty input (1k files): the data work is
negligible, so wall ≈ S. The compute-only efficiency is then

    eff_compute = (T_2 - S) / (4 · (T_8 - S))

which isolates what a real 4× cluster (where S is amortized by much
larger inputs and a dedicated driver) would see. Also reports the Spark
job count of one pipeline run — the per-job cost S/jobs is the floor's
unit price.

Usage: python BENCH/floor.py --cpus 8 [--files 1000]
Appends one JSON line to BENCH/floor_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = os.path.join(ROOT, "BENCH", "floor_runs.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=1000)
    ap.add_argument("--entities", type=int, default=200)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from wikidata_wikifier_spark import datagen
    from wikidata_wikifier_spark.session import get_spark

    spark = get_spark(
        app_name=f"kg-floor-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    source = (
        datagen.distributed_source_repos_df(spark, n_files=args.files)
        .repartition(args.cpus * 2)
        .localCheckpoint()
    )
    index = datagen.entity_index_df(spark, n_entities=args.entities).localCheckpoint()
    source.count()  # warm JVM

    from wikidata_wikifier_spark.pipeline import canonicalize_links, wikify
    from wikidata_wikifier_spark.triples import links_to_triples

    edges = datagen.alias_edges_df(spark, n_entities=args.entities)
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])

    t0 = time.perf_counter()
    links = wikify(source, index, k=1)
    canon = canonicalize_links(links, edges)
    triples = links_to_triples(canon, index)
    n_triples = triples.count()
    wall = time.perf_counter() - t0
    n_jobs = len(tracker.getJobIdsForGroup() or []) - jobs_before

    rec = {
        "cpus": args.cpus,
        "n_files": args.files,
        "n_triples": n_triples,
        "floor_wall_sec": round(wall, 2),
        "n_jobs": n_jobs,
        "sec_per_job": round(wall / max(n_jobs, 1), 3),
    }
    with open(RUNS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
