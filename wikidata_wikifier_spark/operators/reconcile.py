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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

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
