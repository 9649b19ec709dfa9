"""Plan-shape guard for the TPC-H queries' customer dimension: the join
must follow the size-aware-broadcast discipline (VERDICT r04 #4) — an
explicit small row hint compiles to BroadcastHashJoin, a large hint (the
SF≥35 regime where 150k×SF customer rows top the 5M-row broadcast bound)
leaves a shuffle join for AQE to manage, never a forced driver broadcast.

autoBroadcastJoinThreshold is pinned to 1 byte for the duration so the
static planner's own size estimate (everything is tiny at sf0.001) cannot
mask which path the HINT chose.
"""

from __future__ import annotations

import pytest

from wikidata_wikifier_spark.operators import analytics

SF_DIR = "/root/testdata/sf0.001"
LARGE = 300_000_000  # 150k×SF at SF=2000 — far past BROADCAST_MAX_ROWS


@pytest.fixture()
def tiny_threshold(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    # "simple" mode prints each physical node exactly once — countable
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


@pytest.mark.parametrize("q", [analytics.q3_top_orders, analytics.q5_region_volume])
def test_customer_hint_controls_join_strategy(tiny_threshold, q):
    spark = tiny_threshold
    small = _plan(q(spark, SF_DIR, cust_rows=1500))
    large = _plan(q(spark, SF_DIR, cust_rows=LARGE))
    # small hint → the customer join is a broadcast
    assert "BroadcastHashJoin" in small
    # large hint → no path may force-broadcast an SF-scale customer table:
    # the plan keeps shuffle joins (SMJ/shuffled-hash) that AQE can
    # re-plan at runtime. q5's constant-size dims (nation/region/supplier)
    # legitimately stay broadcast, so count the broadcast joins instead of
    # asserting zero: the large-hint plan must have exactly one fewer.
    assert large.count("BroadcastHashJoin") == small.count("BroadcastHashJoin") - 1
    assert "SortMergeJoin" in large or "ShuffledHashJoin" in large


def test_q3_q5_results_unchanged_by_hint(spark):
    """The hint changes the physical strategy only — row-identical output."""
    for q in (analytics.q3_top_orders, analytics.q5_region_volume):
        a = sorted(map(tuple, q(spark, SF_DIR, cust_rows=1500).collect()))
        b = sorted(map(tuple, q(spark, SF_DIR, cust_rows=LARGE).collect()))
        assert a == b
