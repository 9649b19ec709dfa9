#!/usr/bin/env python
"""Approximate sf1.0 replica for SCALE VALIDATION (r06).

The driver generates its own large-SF dataset at measurement time; the
generator is not shipped, and the sf1.0 directory the round-5 measurement
left behind did not survive the sandbox reset. For before/after validation
at ~6M-lineitem scale this script upscales /root/testdata/sf0.1 by ×COPIES
deterministically:

- every key domain is offset per copy by (max_key+1), so joins hold
  within a copy (lineitem→part/supplier/orders, orders→customer,
  supplier→nation unchanged — nation/region stay global);
- document text gets a per-copy prefix token: exact-dup structure inside
  a copy is preserved, cross-copy texts become near-dups (jaccard
  ~n/(n+2)) — minhash/LSH pair volume grows ~quadratically with copy
  count, matching the driver's observed sf0.1→sf1.0 growth (25→2538);
- embeddings get a small deterministic per-(copy,vec) perturbation so
  ANN work grows without exact-duplicate degeneracy;
- events shift ts by +COPY days per copy and offset user_id, so session
  structure scales linearly.

This is NOT the driver's dataset — numbers from it are only comparable
to other numbers from it (before/after on the same dirs).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from wikidata_wikifier_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("REPLICA_DIR", "/root/sf1_replica")
COPIES = int(os.environ.get("REPLICA_COPIES", "10"))

KEYED = {
    # table: {col: domain} — same domain name ⇒ same offset, preserving FKs
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
}


def main() -> None:
    spark = get_spark(app_name="sf-replica-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    # domain sizes (max+1) once
    dom: dict[str, int] = {}
    for t, cols in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for c, d in cols.items():
            m = df.agg(F.max(c)).first()[0]
            dom[d] = max(dom.get(d, 0), int(m) + 1)
    print("domains:", dom, file=sys.stderr)

    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("_copy"))

    def upscale(t: str, key_cols: dict[str, str], extra=None):
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = df.crossJoin(copies)
        for c, d in key_cols.items():
            out = out.withColumn(c, F.col(c) + F.col("_copy") * F.lit(dom[d]))
        if extra is not None:
            out = extra(out)
        out = out.drop("_copy").select(*df.columns)
        n = max(1, spark.sparkContext.defaultParallelism)
        out.repartition(n).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"wrote {t}", file=sys.stderr)

    for t, cols in KEYED.items():
        upscale(t, cols)

    for t in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    ndoc = spark.read.parquet(f"{SRC}/documents.parquet").agg(
        F.max("doc_id")
    ).first()[0] + 1
    upscale(
        "documents",
        {},
        extra=lambda df: df.withColumn(
            "doc_id", F.col("doc_id") + F.col("_copy") * F.lit(ndoc)
        ).withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                F.concat(F.lit("c"), F.col("_copy").cast("string"), F.lit(" "), F.col("text"))
            ),
        ),
    )

    nvec = spark.read.parquet(f"{SRC}/embeddings.parquet").agg(
        F.max("vec_id")
    ).first()[0] + 1
    upscale(
        "embeddings",
        {},
        extra=lambda df: df.withColumn(
            "vec_id", F.col("vec_id") + F.col("_copy") * F.lit(nvec)
        ).withColumn(
            "embedding",
            # deterministic tiny perturbation: breaks exact duplication
            # across copies without moving vectors between clusters
            F.transform(
                "embedding",
                lambda x, i: x
                + (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), i), F.lit(1000)
                    ).cast("double")
                    - 500.0
                )
                / 50000.0,
            ),
        ),
    )

    nev = spark.read.parquet(f"{SRC}/events.parquet").agg(
        F.max("event_id")
    ).first()[0] + 1
    nuser = spark.read.parquet(f"{SRC}/events.parquet").agg(
        F.max("user_id")
    ).first()[0] + 1
    upscale(
        "events",
        {},
        extra=lambda df: df.withColumn(
            "event_id", F.col("event_id") + F.col("_copy") * F.lit(nev)
        )
        .withColumn("user_id", F.col("user_id") + F.col("_copy") * F.lit(nuser))
        .withColumn("ts", F.col("ts") + F.make_interval(days=F.col("_copy"))),
    )

    with open(os.path.join(DST, "_DONE"), "w") as fh:
        fh.write("replica\n")
    spark.stop()
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
