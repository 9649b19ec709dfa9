"""Context wiring in the source-code pipeline: file co-mention context
scored against the index's typed property arrays (context_match_array at
label level) must BREAK LABEL AMBIGUITY — two entities share the label
"cold widget"; the one whose context_arr names a co-mentioned label wins
rank 1 even though the plain tie-break (qnode ascending) favors the other.
Also pins the per-label co-mention aggregation itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wikidata_wikifier_spark.operators.mentions import detect_mentions, label_context
from wikidata_wikifier_spark.pipeline import wikify
from wikidata_wikifier_spark.schemas import ENTITY_INDEX, SOURCE_REPOS

PY_FILE = '''"""Utilities for cold widget."""

def make_widgets(n):
    return 'cold widget'

def make_anvils(n):
    return 'iron anvil'
'''


def _index_rows():
    base = {
        "aliases": None,
        "description": "an entity",
        "pagerank": 1.0,
        "class": "tool",
        "embedding": [1.0, 0.0, 0.0, 0.0],
        "class_count": {"tool": 1},
        "property_count": {"P_rel": 1},
    }
    return [
        # Q900 sorts FIRST: without context the qnode-asc tie-break picks
        # it — only a genuine context signal can flip the ranking to Q901
        {
            **base,
            "qnode": "Q900",
            "label": "cold widget",
            "aliases": ["cold widget"],
            "context_arr": [
                {"property": "P_rel", "value": "stone crank", "vtype": "string"}
            ],
        },
        {
            **base,
            "qnode": "Q901",
            "label": "cold widget",
            "aliases": ["cold widget"],
            "context_arr": [
                {"property": "P_rel", "value": "iron anvil", "vtype": "string"}
            ],
        },
        {
            **base,
            "qnode": "Q902",
            "label": "iron anvil",
            "aliases": ["iron anvil"],
            "context_arr": [
                {"property": "P_rel", "value": "cold widget", "vtype": "string"}
            ],
        },
    ]


@pytest.fixture(scope="module")
def ambiguous(spark):
    source = spark.createDataFrame(
        [
            {
                "repo": "org0/ctx",
                "path": "src/a.py",
                "commit": "c0",
                "lang": "python",
                "content": PY_FILE,
            }
        ],
        SOURCE_REPOS,
    )
    index = spark.createDataFrame(_index_rows(), ENTITY_INDEX)
    return source, index


def test_label_context_top_tokens(spark, ambiguous):
    source, _ = ambiguous
    m = detect_mentions(source, with_context=False)
    ctx = {
        r["label_clean"]: r["context"]
        for r in label_context(m).collect()
    }
    # "iron anvil" co-occurs with "cold widget" in the same file
    assert "iron anvil" in ctx["cold widget"].split("|")
    assert "cold widget" in ctx["iron anvil"].split("|")
    # a label is never its own context token
    assert "cold widget" not in ctx["cold widget"].split("|")


def test_context_breaks_label_tie(spark, ambiguous):
    source, index = ambiguous
    links = wikify(source, index, k=1)
    top = (
        links.where(F.col("label_clean") == "cold widget")
        .select("qnode")
        .distinct()
        .collect()
    )
    assert [r["qnode"] for r in top] == ["Q901"], (
        "co-mention 'iron anvil' matches Q901's context_arr — context must "
        "out-rank the qnode-asc tie-break"
    )


def test_without_context_tiebreak_wins(spark, ambiguous):
    source, index = ambiguous
    # same index minus the context column → use_context off → plain
    # deterministic tie-break (qnode asc) picks Q900, proving the flip in
    # test_context_breaks_label_tie came from the context feature
    links = wikify(source, index.drop("context_arr"), k=1)
    top = (
        links.where(F.col("label_clean") == "cold widget")
        .select("qnode")
        .distinct()
        .collect()
    )
    assert [r["qnode"] for r in top] == ["Q900"]
