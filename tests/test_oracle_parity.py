"""Run every registered query against its DuckDB oracle at sf0.001 —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from wikidata_wikifier_spark.oracles import ORACLES
from wikidata_wikifier_spark.queries import QUERIES

from oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, sf_small, name):
    assert name in QUERIES, f"oracle {name} has no query"
    got = QUERIES[name](spark, sf_small)
    want = run_oracle(ORACLES[name], sf_small)
    compare(got, want, name)


def test_all_queries_run(spark, sf_small):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name
