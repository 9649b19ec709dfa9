"""Continuous KG construction (foreachBatch) produces EXACTLY the batch
pipeline's triples for the same input — one code path, two execution
modes. Single micro-batch input: corpus-level statistics (tf-idf, means,
percentiles) are batch-scoped by design, so per-batch output equals the
batch run only when the batch holds the same rows."""

from __future__ import annotations

from wikidata_wikifier_spark import datagen
from wikidata_wikifier_spark.pipeline import wikify
from wikidata_wikifier_spark.plans.checkpoint import read_triples
from wikidata_wikifier_spark.schemas import SOURCE_REPOS
from wikidata_wikifier_spark.streaming.wikify_stream import wikify_stream
from wikidata_wikifier_spark.triples import links_to_triples


def test_stream_wikify_matches_batch(spark, tmp_path):
    source, _golden = datagen.source_repos_df(spark, n_repos=12, n_entities=80)
    index = datagen.entity_index_df(spark, n_entities=80).localCheckpoint()
    src_dir = str(tmp_path / "src")
    source.coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema(SOURCE_REPOS).parquet(src_dir)
    q = wikify_stream(
        stream, index, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = read_triples(spark, str(tmp_path / "out" / "batch_0")).select(
        "subj", "pred", "obj"
    )
    want = links_to_triples(
        wikify(spark.read.parquet(src_dir), index, k=1), index
    ).select("subj", "pred", "obj")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
