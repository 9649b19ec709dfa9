"""Deterministic linking fixture derived from the driver's testdata.

The reference links table cells against an Elasticsearch index of Wikidata
labels/aliases. The driver's testdata has no Wikidata, so the
driver-checked queries derive both sides deterministically from `part`:

- entity_index: one row per part — qnode 'Q'||p_partkey, label = cleaned
  p_name, aliases = [label, brand-qualified label, p_type-qualified label],
  pagerank ∝ p_retailprice, class = p_type, properties from p_brand/p_size.
- mentions: every 5th part, with a deterministic perturbation by partkey
  mod 3: exact copy / trailing-char dropped (typo → fuzzy path) /
  uppercased (case → clean path). context carries brand|type|size for
  context-match.

Every derivation here is mirrored verbatim in the DuckDB oracle CTEs
(oracles.py) so the driver's value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import clean_label
from ..sources.tpch import load_table

# SQL fragments kept in lock-step with the DataFrame builders below.
ENTITY_INDEX_SQL = """
entity_index AS (
    SELECT 'Q' || CAST(p_partkey AS VARCHAR)                AS qnode,
           lower(p_name)                                    AS label,
           [lower(p_name),
            lower(p_brand) || ' ' || lower(p_name),
            lower(p_name) || ' ' || lower(p_type)]          AS aliases,
           round(p_retailprice / 1000.0, 6)                 AS pagerank,
           lower(p_type)                                    AS class,
           p_brand                                          AS brand,
           p_size                                           AS size
    FROM part
)
"""

MENTIONS_SQL = """
mentions AS (
    SELECT p_partkey                                        AS row,
           CASE CAST(p_partkey % 3 AS INTEGER)
             WHEN 0 THEN lower(p_name)
             WHEN 1 THEN substr(lower(p_name), 1, length(p_name) - 1)
             ELSE upper(p_name)
           END                                              AS label,
           p_brand || '|' || lower(p_type) || '|' || CAST(p_size AS VARCHAR)
                                                            AS context
    FROM part
    WHERE p_partkey % 5 = 0
)
"""


def entity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    label = F.lower(F.col("p_name"))
    return part.select(
        F.concat(F.lit("Q"), F.col("p_partkey").cast("string")).alias("qnode"),
        label.alias("label"),
        F.array(
            label,
            F.concat_ws(" ", F.lower("p_brand"), label),
            F.concat_ws(" ", label, F.lower("p_type")),
        ).alias("aliases"),
        F.round(F.col("p_retailprice") / 1000.0, 6).alias("pagerank"),
        F.lower("p_type").alias("class"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
    )


def mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lab = F.lower(F.col("p_name"))
    label = (
        F.when(F.col("p_partkey") % 3 == 0, lab)
        .when(
            F.col("p_partkey") % 3 == 1,
            F.substring(lab, 1, F.length("p_name").cast("int") - 1),
        )
        .otherwise(F.upper("p_name"))
    )
    return part.where(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("row"),
        label.alias("label"),
        F.concat_ws(
            "|", F.col("p_brand"), F.lower("p_type"), F.col("p_size").cast("string")
        ).alias("context"),
    )


def cleaned_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = mentions(spark, sf_dir)
    return m.withColumn("label_clean", clean_label(F.col("label")))
