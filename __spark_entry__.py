"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on sf0.001 (TPC-H-Q1-shaped pricing summary).
queries()     — one entry per implemented operator from SURVEY.md §2 plus
                the training-data pipeline ops; each (spark, sf_dir) → DF.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalent for each query (omitted
                only for genuinely non-SQL-expressible ops; the driver then
                records a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wikidata_wikifier_spark.oracles import ORACLES
from wikidata_wikifier_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
