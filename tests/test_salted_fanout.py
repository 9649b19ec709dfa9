"""The salted fan-out join (head-label skew path) is output-identical to
the broadcast fan-out — same links, every column."""

from __future__ import annotations

from wikidata_wikifier_spark import datagen
from wikidata_wikifier_spark.pipeline import wikify


def test_salted_fanout_identical(spark):
    source, _ = datagen.source_repos_df(spark, n_repos=15, n_entities=100)
    index = datagen.entity_index_df(spark, n_entities=100).localCheckpoint()
    plain = wikify(source, index, k=1).localCheckpoint()
    salted = wikify(source, index, k=1, salt=4).localCheckpoint()
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
