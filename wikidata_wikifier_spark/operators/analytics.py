"""Relational analytics queries over the test star schema.

These exercise the engine's general query surface (scan → filter →
broadcast/shuffle join → partial+final agg → sort), the part of the
capability checklist SURVEY.md §2.6 notes the reference lacks. Aggregates
are rounded to 4 decimals on both the Spark and DuckDB-oracle side so the
driver's value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.skew import size_aware_broadcast
from ..sources.tpch import load_table, table_rows


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan-side filter + 2-key agg. Catalyst pushes
    the shipdate predicate into the parquet scan; partial aggregation is
    map-side so the shuffle carries only 6 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_top_orders(
    spark: SparkSession, sf_dir: str, cust_rows: int | None = None
) -> DataFrame:
    """Q3 shape: dim filter → size-aware join fact → agg → top-N.

    customer is NOT an unconditional broadcast: it grows with SF (150k×SF
    rows — at SF≥35 the filtered segment alone tops the 5M-row broadcast
    bound and an F.broadcast would OOM the driver). The cached footer
    count feeds size_aware_broadcast, which degrades to a shuffle join +
    AQE runtime promotion past the bound. cust_rows overrides the count
    for tests forcing the large-side plan."""
    n_cust = cust_rows if cust_rows is not None else table_rows(
        spark, sf_dir, "customer"
    )
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(size_aware_broadcast(cust, n_cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
    )


def q5_region_volume(
    spark: SparkSession, sf_dir: str, cust_rows: int | None = None
) -> DataFrame:
    """Q5 shape: snowflake of dims around the fact table. nation/region
    are constant-size (25/5 rows at every SF) and supplier is 10k×SF —
    unconditional broadcasts that hold to SF in the thousands. customer
    (150k×SF) rides size_aware_broadcast with the cached footer count:
    shuffle join + AQE past the 5M-row bound (SF≥~35)."""
    n_cust = cust_rows if cust_rows is not None else table_rows(
        spark, sf_dir, "customer"
    )
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(size_aware_broadcast(cust, n_cust), orders["o_custkey"] == cust["c_custkey"])
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
