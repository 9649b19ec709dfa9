"""Hot-block safety for embedding-cosine dedup: a block larger than
COSINE_BLOCK_CAP must NOT produce the full O(B²) pair fan-out — the
secondary LSH sub-bucket is part of the join key."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_wikifier_spark.operators.dedup import embedding_cosine_pairs


def _hot_block(spark, n=600, dim=8):
    # deterministic spread-out vectors, all in ONE block label
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.lit("hot").alias("label"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: ((F.col("id") * (d + 7) + d * d) % 101).cast("double") / 101.0,
        ).alias("embedding"),
    )


def test_hot_block_pair_fanout_bounded(spark):
    embs = _hot_block(spark)
    n = embs.count()
    all_pairs = n * (n - 1) // 2
    # threshold -1 keeps every joined pair → counts the raw join fan-out
    capped = embedding_cosine_pairs(embs, threshold=-1.0).count()
    uncapped = embedding_cosine_pairs(embs, threshold=-1.0, block_cap=10**9).count()
    assert uncapped == all_pairs
    # 2^3 sub-buckets: fan-out must drop well below the quadratic count
    assert capped < all_pairs / 2, (capped, all_pairs)


def test_very_hot_block_depth_adapts(spark):
    # 10k vectors in one block: fixed-depth bucketing (8 sub-buckets)
    # would still leave ~(B/8)²/2 ≈ 780k pairs per bucket; the adaptive
    # depth (here 2^8 = 256 buckets) keeps expected bucket size ≤ cap
    embs = _hot_block(spark, n=10_000)
    all_pairs = 10_000 * 9_999 // 2
    capped = embedding_cosine_pairs(embs, threshold=-1.0).count()
    # 2^8 = 256 sub-buckets; the lattice fixture's vectors correlate with
    # the hyperplanes (skewed buckets), so assert a ≥ 20× fan-out cut
    # rather than the uniform 256× (measured: ~28×)
    assert capped < all_pairs / 20, (capped, all_pairs)


def test_small_blocks_unaffected(spark):
    embs = _hot_block(spark, n=50)
    capped = embedding_cosine_pairs(embs, threshold=-1.0).count()
    assert capped == 50 * 49 // 2
