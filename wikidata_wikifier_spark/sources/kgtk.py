"""Offline entity-index construction from a KGTK-style edge list
(SURVEY.md §2.1; reference Call-Wikifier-Service.ipynb cells 7-8: Wikidata
dump → KGTK JSONL edges → aggregate per qnode → ES bulk load).

The reference materializes the aggregate as Elasticsearch documents; here
the same per-qnode aggregation produces the entity-index TABLE that every
retrieval strategy joins against — one conditional-aggregation groupBy
(map-side combined), embarrassingly parallel over a 10^10-edge dump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# property vocabulary of the index build (KGTK `label` column values)
P_LABEL = "label"
P_ALIAS = "alias"
P_INSTANCE_OF = "P31"
P_PAGERANK = "pagerank"
P_DESCRIPTION = "description"

# value-type inference for the context harvest (the reference's context.jl
# carries typed property values; wikifier.py:122-130)
_NUM_RE = r"^-?[0-9]+(\.[0-9]+)?$"
_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def build_entity_index(edges: DataFrame) -> DataFrame:
    """(node1, label, node2) edges → one index row per qnode.

    - label/description/class: max() of the single-valued property (max
      rather than first for determinism under any partitioning)
    - aliases: sorted distinct collect of alias edges, with the preferred
      label prepended the way the ES index analyzes both fields together
    - pagerank: the numeric property cast from the edge's string object
    - class_count: COUNT MAP of P31 edge objects (multi-valued instance-of
      — the reference's class_count aux field, wikifier.py:24,136-137)
    - property_count: COUNT MAP per property id over all 'P…' edges
      (property_count aux, wikifier.py:138-139)
    - context_arr: typed (property, value, vtype) entries for every
      non-P31 property edge, vtype inferred date/quantity/string
      (context.jl aux harvest, wikifier.py:122-130)

    All aggregations are per-qnode groupBys with map-side combine —
    embarrassingly parallel over a 10^10-edge dump; the (qnode, property,
    value) pre-aggregation bounds collect_list sizes by an entity's
    distinct property-value degree, not its raw edge count.
    """
    agg = edges.groupBy(F.col("node1").alias("qnode")).agg(
        F.max(F.when(F.col("label") == P_LABEL, F.col("node2"))).alias("label"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.when(F.col("label") == P_ALIAS, F.col("node2")))
            )
        ).alias("alias_list"),
        F.max(F.when(F.col("label") == P_INSTANCE_OF, F.col("node2"))).alias("class"),
        F.max(F.when(F.col("label") == P_DESCRIPTION, F.col("node2"))).alias(
            "description"
        ),
        F.round(
            F.max(
                F.when(F.col("label") == P_PAGERANK, F.col("node2").cast("double"))
            ),
            6,
        ).alias("pagerank"),
    )
    # per-(qnode, property, value) edge counts — the shared pre-aggregate
    # for both count maps and the context harvest
    pv = (
        edges.where(F.col("label").rlike("^P"))
        .groupBy("node1", "label", "node2")
        .agg(F.count("*").alias("cnt"))
    )
    cls = (
        pv.where(F.col("label") == P_INSTANCE_OF)
        .groupBy("node1")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("node2").alias("key"),
                            F.col("cnt").cast("int").alias("cnt"),
                        )
                    )
                )
            ).alias("class_count")
        )
    )
    props = (
        pv.groupBy("node1", "label")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy("node1")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("label").alias("key"),
                            F.col("cnt").cast("int").alias("cnt"),
                        )
                    )
                )
            ).alias("property_count")
        )
    )
    ctx = (
        pv.where(F.col("label") != P_INSTANCE_OF)
        .select(
            "node1",
            F.struct(
                F.col("label").alias("property"),
                F.col("node2").alias("value"),
                F.when(F.col("node2").rlike(_DATE_RE), F.lit("date"))
                .when(F.col("node2").rlike(_NUM_RE), F.lit("quantity"))
                .otherwise(F.lit("string"))
                .alias("vtype"),
            ).alias("e"),
        )
        .groupBy("node1")
        .agg(F.array_sort(F.collect_list("e")).alias("context_arr"))
    )
    for dim in (cls, props, ctx):
        agg = agg.join(dim.withColumnRenamed("node1", "qnode"), "qnode", "left")
    return agg.select(
        "qnode",
        "label",
        F.concat(F.array("label"), "alias_list").alias("aliases"),
        "class",
        "description",
        "pagerank",
        "class_count",
        "property_count",
        "context_arr",
    )
