"""String-similarity parity: the Python JW/Monge-Elkan used in the Arrow
UDFs must be bit-exact with DuckDB's implementations, or every oracle
built on them drifts."""

from __future__ import annotations

import duckdb
import pytest

from wikidata_wikifier_spark.functions.strings import (
    clean_label,
    jaro_winkler,
    symmetric_monge_elkan,
)

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("cold widget", "cold widge"),
    ("new plate", "new ring"),   # jaro < 0.7 + common prefix → boost gate
    ("abc", ""),
    ("", ""),
    ("a", "a"),
    ("iron bearing", "iron bearin"),
    ("crate", "trace"),
]


@pytest.mark.parametrize("a,b", PAIRS)
def test_jaro_winkler_matches_duckdb(a, b):
    want = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert jaro_winkler(a, b) == pytest.approx(want, abs=0), (a, b)


@pytest.mark.parametrize(
    "a,b",
    [("cold widget", "the cold widget"), ("large bolt", "blue anvil"), ("old rod", "cold ring")],
)
def test_monge_elkan_matches_duckdb(a, b):
    sql = """select
     0.5*(list_avg([list_max([jaro_winkler_similarity(t1,t2) for t2 in string_split(?, ' ')])
                    for t1 in string_split(?, ' ')])
        + list_avg([list_max([jaro_winkler_similarity(t2,t1) for t1 in string_split(?, ' ')])
                    for t2 in string_split(?, ' ')]))"""
    want = duckdb.sql(sql, params=[b, a, a, b]).fetchone()[0]
    got = symmetric_monge_elkan(a.split(), b.split())
    assert got == pytest.approx(want, abs=0)


def test_clean_label(spark):
    df = spark.createDataFrame(
        [("  Héllo—World_42  ",), ("ALL CAPS!",), ("", )], ["s"]
    ).select(clean_label("s").alias("c"))
    got = [r["c"] for r in df.collect()]
    assert got[0] == "h llo world 42"
    assert got[1] == "all caps"
    assert got[2] == ""
