#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Usage:
    python bench.py                  # default headline set
    python bench.py --cpus 8         # override parallelism (scaling runs)
    python bench.py --all            # every registered query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_volume",
    "candidates_dedup",
    "wikify_end_to_end",
    "triples_emit",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "text_analysis",
    "events_sessionize",
    "connected_components",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    if args.cpus:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from wikidata_wikifier_spark.queries import QUERIES
    from wikidata_wikifier_spark.session import get_spark

    names = args.queries or (sorted(QUERIES.keys()) if args.all else HEADLINE)
    names = [n for n in names if n in QUERIES]

    spark = get_spark(app_name="wikifier-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    QUERIES[names[0]](spark, args.sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    rows_out = 0
    for name in names:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, args.sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        rows_out += n

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "rows_out": rows_out,
    }
    if "triples_emit" in timings and timings["triples_emit"] > 0:
        from wikidata_wikifier_spark.queries import QUERIES as _Q

        n_triples = _Q["triples_emit"](spark, args.sf_dir).count()
        out["triples_per_sec"] = round(n_triples / timings["triples_emit"], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
