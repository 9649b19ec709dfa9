"""W3C reconcile request ingestion (SURVEY.md §2.2; reference
wikifier_service.py:73-98).

The reference's /reconcile endpoint receives a JSON body of queries
{"q0": {"query": label, "type": Qxxx, "properties": [{"pid": ..., "v":
...}]}} and reshapes it into the tabular wikifier input: one row per
query, one COLUMN per property pid. Spark-first: from_json (JVM Jackson,
no Python) → explode_outer the property array → groupBy().pivot(pid) with
PINNED pivot values (no extra distinct-scan job; the reconcile API
declares its pid vocabulary up front exactly like the reference's
properties list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..plans.skew import size_aware_broadcast

RECONCILE_QUERY_SCHEMA = StructType(
    [
        StructField("query", StringType()),
        StructField("type", StringType()),
        StructField(
            "properties",
            ArrayType(
                StructType(
                    [
                        StructField("pid", StringType()),
                        StructField("v", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_reconcile_requests(requests: DataFrame, pids: list[str]) -> DataFrame:
    """(request_id, payload JSON) → (request_id, query, type, <pid>...).

    Mirrors wikifier_service.py:73-98: each property pid becomes a context
    column for the downstream canonicalize --add-context reshape. Unknown
    pids are dropped (the service validates against its manifest);
    requests with no properties keep NULL property columns
    (explode_outer)."""
    parsed = requests.select(
        "request_id", F.from_json("payload", RECONCILE_QUERY_SCHEMA).alias("q")
    )
    props = parsed.select(
        "request_id",
        F.col("q.query").alias("query"),
        F.col("q.type").alias("type"),
        F.explode_outer("q.properties").alias("p"),
    ).select(
        "request_id", "query", "type",
        F.col("p.pid").alias("pid"), F.col("p.v").alias("v"),
    )
    return (
        props.groupBy("request_id", "query", "type")
        .pivot("pid", pids)
        .agg(F.first("v"))
    )


def reconcile_response(
    links: DataFrame,
    class_key_dim: DataFrame,
    score_col: str = "siamese_prediction",
    label_dim: DataFrame | None = None,
    dim_rows: int | None = None,
) -> DataFrame:
    """Reconcile response typing (wikifier_service.py:116-142): every
    matched candidate is labeled with its TOP class — the reference splits
    the `top5_class_count` aux string ('Qxxx:count') and resolves the
    class id to a human label, emitting {id, name, type:[{id,name}],
    score, match}.

    class_key_dim: (qnode, key, cnt) exploded class_count map. The top
    class per qnode is max-by (cnt DESC, key ASC) — the count ordering is
    exactly what top5_class_count encodes.

    label_dim: (type_id, type_name) — the ES ids-lookup dimension the
    reference resolves type labels through (wikifier_service.py:18-39,
    used at :134-139). When given, type_name comes from the DIMENSION
    JOIN; classes missing from it (and the no-class branch,
    wikifier_service.py:136-142) fall back to the deterministic
    capitalization of the key / NULL respectively.

    Scale: the typing dimension is entity-scale (one row per qnode),
    windowed per qnode (bounded partitions); joins are size-aware —
    dim_rows hints the entity-scale sides, so past BROADCAST_MAX_ROWS
    they degrade to shuffle joins with AQE promotion instead of forcing
    an index-sized driver broadcast.
    """
    w = Window.partitionBy("qnode").orderBy(F.desc("cnt"), F.asc("key"))
    top1 = (
        class_key_dim.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("qnode", F.col("key").alias("type_id"))
    )
    fallback_name = F.concat(
        F.upper(F.substring("type_id", 1, 1)), F.expr("substring(type_id, 2)")
    )
    if label_dim is not None:
        # label vocabulary ≤ class vocabulary ≤ entity count: same hint
        top1 = top1.join(
            size_aware_broadcast(
                label_dim.select("type_id", F.col("type_name").alias("_tn")),
                dim_rows,
            ),
            "type_id",
            "left",
        ).select(
            "qnode", "type_id", F.coalesce("_tn", fallback_name).alias("type_name")
        )
    else:
        top1 = top1.select("qnode", "type_id", fallback_name.alias("type_name"))
    return links.join(size_aware_broadcast(top1, dim_rows), "qnode", "left").select(
        "row",
        F.col("qnode").alias("id"),
        F.col("kg_label").alias("name"),
        "type_id",
        "type_name",
        F.round(F.col(score_col), 6).alias("score"),
        "match",
    )
