"""Continuous KG construction (foreachBatch) produces EXACTLY the batch
pipeline's triples for the same input — one code path, two execution
modes. Single micro-batch input: corpus-level statistics (tf-idf, means,
percentiles) are batch-scoped by design, so per-batch output equals the
batch run only when the batch holds the same rows."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wikidata_wikifier_spark import datagen
from wikidata_wikifier_spark.pipeline import wikify
from wikidata_wikifier_spark.plans.checkpoint import read_triples
from wikidata_wikifier_spark.schemas import SOURCE_REPOS
from wikidata_wikifier_spark.streaming.wikify_stream import wikify_stream
from wikidata_wikifier_spark.triples import links_to_triples


def test_stream_resume_after_mid_stream_crash(spark, tmp_path):
    """Kill the stream BETWEEN micro-batches (after batch 0's triples
    landed, before its checkpoint commit), restart from the streaming
    checkpoint, and assert:
    - batch 0 REPLAYS but its triple write is a manifest no-op
      (written_parts == 0, skipped_parts == the first run's parts);
    - the resumed run's total triples equal an uninterrupted streaming
      run over the same input (same singleton-batch rate limit, so the
      per-batch corpus statistics partition identically)."""
    source, _golden = datagen.source_repos_df(spark, n_repos=12, n_entities=80)
    index = datagen.entity_index_df(spark, n_entities=80).localCheckpoint()
    src_dir = str(tmp_path / "src")
    # two input files → two micro-batches at maxFilesPerTrigger=1
    half_a = source.where(F.crc32("path") % 2 == 0)
    half_b = source.where(F.crc32("path") % 2 == 1)
    half_a.coalesce(1).write.mode("append").parquet(src_dir)
    half_b.coalesce(1).write.mode("append").parquet(src_dir)

    def stream():
        return (
            spark.readStream.schema(SOURCE_REPOS)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    # run 1: crash injected right after batch 0's write returns
    first_stats: dict[int, dict] = {}

    def poison(batch_id, stats):
        first_stats[batch_id] = stats
        raise RuntimeError("injected mid-stream crash")

    q = wikify_stream(
        stream(), index, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        on_batch=poison,
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert first_stats[0]["written_parts"] > 0

    # run 2: same checkpoint, no poison → batch 0 replays as a no-op,
    # batch 1 processes
    resumed_stats: dict[int, dict] = {}
    q2 = wikify_stream(
        stream(), index, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        on_batch=lambda b, s: resumed_stats.__setitem__(b, s),
    )
    q2.awaitTermination()
    assert resumed_stats[0]["written_parts"] == 0
    assert resumed_stats[0]["skipped_parts"] == first_stats[0]["written_parts"]
    assert 1 in resumed_stats

    # uninterrupted reference run (separate sink + checkpoint)
    q3 = wikify_stream(
        stream(), index, str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    )
    q3.awaitTermination()

    def all_triples(base):
        dirs = sorted((tmp_path / base).glob("batch_*"))
        df = read_triples(spark, str(dirs[0]))
        for d in dirs[1:]:
            df = df.unionByName(read_triples(spark, str(d)))
        return df.select("subj", "pred", "obj")

    got, want = all_triples("out"), all_triples("ref_out")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


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
