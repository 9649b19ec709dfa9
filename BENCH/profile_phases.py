#!/usr/bin/env python
"""Phase-level profile of the scaling pipeline: detection / candidates /
features+links / CC+triples, at a given --cpus and --files. Used to find
which phase stops scaling with cores."""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=1000000)
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from pyspark.sql import functions as F

    from wikidata_wikifier_spark.session import get_spark

    spark = get_spark(
        app_name=f"phase-prof-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    src_path = os.path.join(ROOT, "BENCH", ".data", f"files_{args.files}")
    idx_path = os.path.join(ROOT, "BENCH", ".data", "entity_index_200")
    source = spark.read.parquet(src_path).repartition(args.cpus * 2).localCheckpoint()
    index = spark.read.parquet(idx_path)
    source.count()

    from wikidata_wikifier_spark import datagen
    from wikidata_wikifier_spark.operators import candidates as C
    from wikidata_wikifier_spark.operators.mentions import detect_mentions
    from wikidata_wikifier_spark.pipeline import canonicalize_links, wikify
    from wikidata_wikifier_spark.triples import links_to_triples

    t = time.perf_counter()

    def lap(msg, n=None):
        nonlocal t
        now = time.perf_counter()
        print(f"{msg}: {now - t:.1f}s" + (f" ({n} rows)" if n is not None else ""))
        t = now

    m = detect_mentions(source).localCheckpoint()
    lap("detect_mentions", m.count())
    mm = m.select(F.col("mention_id").alias("row"), "label_clean")
    cands = C.generate_candidates(
        mm, index.select("qnode", "label", "aliases", "pagerank")
    )
    lap("generate_candidates", cands.count())
    links = wikify(source, index, k=1).localCheckpoint()
    lap("wikify full (detect+cand+features+mlp+topk)", links.count())
    edges = datagen.alias_edges_df(spark, n_entities=200)
    canon = canonicalize_links(links, edges)
    triples = links_to_triples(canon, index)
    lap("cc+triples", triples.count())
    spark.stop()


if __name__ == "__main__":
    main()
