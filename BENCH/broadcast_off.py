#!/usr/bin/env python
"""Evidence for the size-aware-broadcast path (100× story): run candidate
generation against a 10× larger entity index twice —

  1. default config (size-aware helper broadcasts the index-side tables)
  2. spark.sql.autoBroadcastJoinThreshold=-1 (helper emits NO broadcast
     hints; every index join becomes a shuffle join, the plan shape the
     engine degrades to when the index outgrows executor memory)

and report both wall times. Acceptance (VERDICT r01 #7): the no-broadcast
plan completes within 2× of the broadcast plan.

Usage: python BENCH/broadcast_off.py [--files 200000] [--entities 2000]
Appends one JSON line to BENCH/broadcast_runs.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = os.path.join(ROOT, "BENCH", "broadcast_runs.jsonl")


def run_once(cpus: int, files: int, entities: int, disable_broadcast: bool) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from wikidata_wikifier_spark import datagen
    from wikidata_wikifier_spark.operators import candidates as C
    from wikidata_wikifier_spark.operators.mentions import detect_mentions
    from wikidata_wikifier_spark.session import get_spark

    extra = (
        {"spark.sql.autoBroadcastJoinThreshold": "-1"} if disable_broadcast else {}
    )
    spark = get_spark(
        app_name=f"bcast-{'off' if disable_broadcast else 'on'}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    src_path = os.path.join(ROOT, "BENCH", ".data", f"files_{files}")
    if not os.path.exists(src_path):
        datagen.distributed_source_repos_df(spark, n_files=files).repartition(
            64
        ).write.mode("overwrite").parquet(src_path)
    source = spark.read.parquet(src_path).repartition(cpus * 2).localCheckpoint()
    index = datagen.entity_index_df(spark, n_entities=entities).localCheckpoint()
    source.count()

    t0 = time.perf_counter()
    m = detect_mentions(source).localCheckpoint()
    mm = m.select(F.col("mention_id").alias("row"), "label_clean")
    cands = C.generate_candidates(
        mm, index.select("qnode", "label", "aliases", "pagerank")
    )
    n = cands.count()
    wall = time.perf_counter() - t0
    spark.stop()
    return {"broadcast_disabled": disable_broadcast, "n_candidates": n,
            "wall_sec": round(wall, 2)}


def run_full(cpus: int, files: int, entities: int, disable_broadcast: bool) -> dict:
    """FULL output tail under the degraded plan: wikify → CC
    canonicalization → links_to_triples, with an order-insensitive triple
    digest so on/off runs can be asserted byte-identical (VERDICT r03 #1:
    the size-aware discipline now covers the typing join, the component
    map, and the hintless dimension defaults)."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from wikidata_wikifier_spark import datagen
    from wikidata_wikifier_spark.functions.hashing import md5_long
    from wikidata_wikifier_spark.pipeline import canonicalize_links, wikify
    from wikidata_wikifier_spark.session import get_spark
    from wikidata_wikifier_spark.triples import links_to_triples

    extra = (
        {"spark.sql.autoBroadcastJoinThreshold": "-1"} if disable_broadcast else {}
    )
    spark = get_spark(
        app_name=f"bcast-full-{'off' if disable_broadcast else 'on'}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    src_path = os.path.join(ROOT, "BENCH", ".data", f"files_{files}")
    if not os.path.exists(src_path):
        datagen.distributed_source_repos_df(spark, n_files=files).repartition(
            64
        ).write.mode("overwrite").parquet(src_path)
    source = spark.read.parquet(src_path).repartition(cpus * 2).localCheckpoint()
    index = datagen.entity_index_df(spark, n_entities=entities).localCheckpoint()
    edges = datagen.alias_edges_df(spark, n_entities=entities).localCheckpoint()
    source.count()

    t0 = time.perf_counter()
    links = wikify(source, index, k=1)
    canon = canonicalize_links(links, edges)
    triples = links_to_triples(canon, index, idx_rows=entities)
    row = triples.agg(
        F.count("*").alias("n"),
        F.sum(
            md5_long(F.concat_ws("\x1f", "subj", "pred", "obj")).cast(
                "decimal(38,0)"
            )
        ).alias("digest"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    spark.stop()
    return {
        "broadcast_disabled": disable_broadcast,
        "n_triples": row["n"],
        "digest": str(row["digest"]),
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=200000)
    ap.add_argument("--entities", type=int, default=2000)
    ap.add_argument(
        "--stage", choices=["candidates", "full"], default="candidates",
        help="candidates = retrieval only; full = wikify→CC→triples with "
        "digest equality",
    )
    args = ap.parse_args()

    if args.stage == "full":
        on = run_full(args.cpus, args.files, args.entities, False)
        off = run_full(args.cpus, args.files, args.entities, True)
        rec = {
            "stage": "full_triples",
            "cpus": args.cpus,
            "n_files": args.files,
            "n_entities": args.entities,
            "broadcast_on_sec": on["wall_sec"],
            "broadcast_off_sec": off["wall_sec"],
            "triples_match": (
                on["n_triples"] == off["n_triples"]
                and on["digest"] == off["digest"]
            ),
            "n_triples": on["n_triples"],
            "digest": on["digest"],
            "off_over_on": round(off["wall_sec"] / on["wall_sec"], 2),
        }
    else:
        on = run_once(args.cpus, args.files, args.entities, False)
        off = run_once(args.cpus, args.files, args.entities, True)
        rec = {
            "stage": "candidates",
            "cpus": args.cpus,
            "n_files": args.files,
            "n_entities": args.entities,
            "broadcast_on_sec": on["wall_sec"],
            "broadcast_off_sec": off["wall_sec"],
            "candidates_match": on["n_candidates"] == off["n_candidates"],
            "n_candidates": on["n_candidates"],
            "off_over_on": round(off["wall_sec"] / on["wall_sec"], 2),
        }
    with open(RUNS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
