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


def build_entity_index(edges: DataFrame) -> DataFrame:
    """(node1, label, node2) edges → one index row per qnode.

    - label/description/class: max() of the single-valued property (max
      rather than first for determinism under any partitioning)
    - aliases: sorted distinct collect of alias edges, with the preferred
      label prepended the way the ES index analyzes both fields together
    - pagerank: the numeric property cast from the edge's string object
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
    return agg.select(
        "qnode",
        "label",
        F.concat(F.array("label"), "alias_list").alias("aliases"),
        "class",
        "description",
        "pagerank",
    )
