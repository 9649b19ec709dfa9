"""Connected components over alias/sameAs edges — the canonicalization
pass (BASELINE.json north_rule; no reference counterpart — SURVEY.md §7.7).

Algorithm: min-label propagation with pointer doubling, expressed as
DataFrame joins:

    comp(u) ← min(comp(u), min_{(u,v)∈E} comp(v))      (neighbor step)
    comp(u) ← min(comp(u), comp(comp(u)))               (doubling step)

Both steps per round; pointer doubling halves label-chain lengths so a
component of diameter d converges in O(log d) rounds (the 100-node chain
fixture takes 7). At fixpoint every edge has comp(u) == comp(v) and each
component is labeled by its MINIMUM member id — deterministic across runs
and parallelism levels, matching the DuckDB recursive-CTE oracle's
min(reachable) semantics.

Scale notes: each round is two equi-joins keyed by node — shuffle
partitioned on the node key, AQE-coalesced. Lineage is cut every round
(localCheckpoint; checkpoint() to reliable storage on a cluster) so the
plan depth stays O(1). Convergence is a single-row aggregate (sum of
row-hashes of the comp table) — one cheap job per round, the iterative
pattern SURVEY.md §4 calls out as the custom piece Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """edges(src,dst) → (node, component); component = min member id."""
    e = _symmetrize(
        edges.select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
        )
    ).localCheckpoint()

    # Iterative rounds pay per-task overhead every round; size the working
    # width to the graph, not the session default (a 1k-edge alias graph on
    # 64 shuffle partitions is ~10 jobs of overhead and no compute). At
    # cluster scale n_edges drives the width up to 2x parallelism.
    n_edges = e.count()
    spark = edges.sparkSession
    dp = spark.sparkContext.defaultParallelism
    width = int(max(4, min(dp * 2, n_edges // 50_000 + 4)))
    e = e.repartition(width, "src")

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col(src).cast("string").alias("node")))
        .unionByName(edges.select(F.col(dst).cast("string").alias("node")))
        .distinct()
    )
    comp = nodes.withColumn("comp", F.col("node")).localCheckpoint()

    def digest(c: DataFrame) -> int:
        return c.agg(
            F.sum(md5_long(F.concat_ws("\x1f", "node", "comp")).cast("decimal(38,0)")).alias("d")
        ).first()["d"]

    prev = digest(comp)
    for _ in range(max_iterations):
        # neighbor step: min of neighbor labels
        nbr_min = (
            e.join(
                comp.select(F.col("node").alias("dst"), F.col("comp").alias("dcomp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dcomp").alias("nmin"))
            .withColumnRenamed("src", "node")
        )
        stepped = (
            comp.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        # doubling step: follow the label one hop (comp(comp(u)))
        doubled = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("node").alias("lnode"), F.col("comp").alias("lcomp")
                ).alias("b"),
                F.col("a.comp") == F.col("b.lnode"),
                "left",
            )
            .select(
                F.col("a.node").alias("node"),
                F.least(
                    F.col("a.comp"), F.coalesce(F.col("lcomp"), F.col("a.comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        comp = doubled
        cur = digest(comp)
        if cur == prev:
            break
        prev = cur

    return comp.select("node", F.col("comp").alias("component"))
