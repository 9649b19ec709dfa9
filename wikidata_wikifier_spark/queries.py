"""Driver-checked query registry: name → (spark, sf_dir) → DataFrame.

Each entry is one operator from SURVEY.md §2 (or a training-data op from
the build brief) exercised over the driver's testdata tables, with a
matching ANSI-SQL oracle in oracles.py. Column names and rounding are kept
in lock-step with the oracle so the driver's order-insensitive value hash
matches exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import analytics, candidates
from .operators.canonicalize import canonicalize, clean
from .operators.linking_fixture import cleaned_mentions, entity_index
from .sources.tpch import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


# ------------------------------------------------------------ reshaping

def q_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return canonicalize(
        cust,
        target_columns=["c_name", "c_mktsegment"],
        row_key="c_custkey",
        context_columns=["c_nationkey", "c_acctbal"],
    )


def q_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    labels = part.select(
        F.col("p_partkey").alias("row"),
        F.concat_ws(" ", F.col("p_brand"), F.col("p_name"), F.col("p_type")).alias(
            "label"
        ),
    )
    return clean(labels, "label", "label_clean")


# ---------------------------------------------------- candidate retrieval

def q_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candidates.exact_matches(
        cleaned_mentions(spark, sf_dir), entity_index(spark, sf_dir)
    )


def q_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candidates.ngram_matches(
        cleaned_mentions(spark, sf_dir), entity_index(spark, sf_dir)
    )


def q_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candidates.trigram_matches(
        cleaned_mentions(spark, sf_dir), entity_index(spark, sf_dir)
    )


def q_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candidates.fuzzy_matches(
        cleaned_mentions(spark, sf_dir), entity_index(spark, sf_dir)
    )


def q_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = candidates.generate_candidates(
        cleaned_mentions(spark, sf_dir), entity_index(spark, sf_dir)
    )
    return df.select(
        "row",
        "label_clean",
        "qnode",
        "kg_label",
        F.round("pagerank", 6).alias("pagerank"),
        F.round("retrieval_score", 6).alias("retrieval_score"),
        "num_occurences",
        F.array_join("methods", ",").alias("methods"),
    )


QUERIES: dict[str, QueryFn] = {
    "tpch_q1_pricing_summary": analytics.q1_pricing_summary,
    "tpch_q3_top_orders": analytics.q3_top_orders,
    "tpch_q5_region_volume": analytics.q5_region_volume,
    "canonicalize_add_context": q_canonicalize,
    "clean_labels": q_clean,
    "retrieval_exact": q_exact,
    "retrieval_ngram": q_ngram,
    "retrieval_trigram": q_trigram,
    "retrieval_fuzzy": q_fuzzy,
    "candidates_dedup": q_candidates,
}
