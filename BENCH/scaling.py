#!/usr/bin/env python
"""N-vs-4N scaling evidence for the north_rule: run the IDENTICAL
end-to-end KG-construction job (mention detection → retrieval → features →
MLP ranking → links → CC canonicalization → triples) on the same input at
local[8] and local[32], report throughput at both and the scaling
efficiency  eff = (T_8 / T_32) / 4.

The input is a deterministically generated source-repo table (datagen,
seed-pinned) written once to BENCH/.data/ and reused by both runs; only
the pipeline is timed (generation and session startup excluded).

Usage:
    python BENCH/scaling.py --cpus 8  --repos 6000
    python BENCH/scaling.py --cpus 32 --repos 6000
Each run appends one JSON line to BENCH/scaling_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA_DIR = os.path.join(ROOT, "BENCH", ".data")
RUNS = os.path.join(ROOT, "BENCH", "scaling_runs.jsonl")


def ensure_data(spark, n_repos: int, n_entities: int, n_files: int | None = None):
    """n_files set → executor-side distributed datagen (scales to millions
    of rows); otherwise the driver-side golden-fixture generator."""
    tag = f"files_{n_files}" if n_files else f"source_repos_{n_repos}"
    src_path = os.path.join(DATA_DIR, tag)
    idx_path = os.path.join(DATA_DIR, f"entity_index_{n_entities}")
    from wikidata_wikifier_spark import datagen

    if not os.path.exists(src_path):
        if n_files:
            src = datagen.distributed_source_repos_df(
                spark, n_files=n_files, n_entities=n_entities
            )
        else:
            src, _ = datagen.source_repos_df(
                spark, n_repos=n_repos, n_entities=n_entities
            )
        src.repartition(64).write.mode("overwrite").parquet(src_path)
    if not os.path.exists(idx_path):
        datagen.entity_index_df(spark, n_entities=n_entities).write.mode(
            "overwrite"
        ).parquet(idx_path)
    return src_path, idx_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--repos", type=int, default=6000)
    ap.add_argument("--files", type=int, default=None,
                    help="use the distributed datagen with this many files")
    ap.add_argument("--entities", type=int, default=200)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from wikidata_wikifier_spark.session import get_spark

    spark = get_spark(
        app_name=f"kg-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    src_path, idx_path = ensure_data(spark, args.repos, args.entities, args.files)
    # right-size scan partitions to the session (the writer's layout may
    # fragment into hundreds of tiny splits; ~2 partitions/core is the
    # sweet spot for the regex-heavy detection stage)
    source = spark.read.parquet(src_path).repartition(args.cpus * 2).localCheckpoint()
    index = spark.read.parquet(idx_path)
    n_files = source.count()  # warm: parquet footers + JVM

    from wikidata_wikifier_spark import datagen
    from wikidata_wikifier_spark.pipeline import canonicalize_links, wikify
    from wikidata_wikifier_spark.triples import links_to_triples

    edges = datagen.alias_edges_df(spark, n_entities=args.entities)

    t0 = time.perf_counter()
    links = wikify(source, index, k=1)
    canon = canonicalize_links(links, edges)
    triples = links_to_triples(canon, index)
    n_triples = triples.count()
    wall = time.perf_counter() - t0

    rec = {
        "cpus": args.cpus,
        "n_files": n_files,
        "n_triples": n_triples,
        "wall_sec": round(wall, 2),
        "triples_per_sec": round(n_triples / wall, 1),
        "files_per_sec": round(n_files / wall, 1),
    }
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    with open(RUNS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
