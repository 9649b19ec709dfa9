"""Similarity search over embedding columns (build brief): brute-force
cosine top-k as the exactness baseline, and a bucketed LSH variant as the
scale path.

Both are pure native column expressions (F.aggregate dot products), fully
oracle-checkable. The LSH hyperplanes are exact-integer grids so the
bucket assignment is bit-reproducible in ANSI SQL (no RNG, no libm).

Scale notes: brute-force is queries × corpus — fine when the query set is
small (it broadcasts); the LSH variant buckets the corpus once (one
narrow projection) and joins query buckets only, turning top-k into a
per-bucket window. For 100 TB corpora the same plan holds with the bucket
table written out as a bucketed Iceberg table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine

N_PLANES = 8


def brute_force_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine (excluding
    self), deterministic tie-break on neighbor id."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    c = embs.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def _plane_weight(p: int, d: Column) -> Column:
    """Deterministic integer hyperplane component: ((p*31 + d*17) % 13) - 6
    ∈ [-6, 6] — exact arithmetic, reproducible in any SQL engine."""
    return ((F.lit(p * 31) + d * 17) % 13 - 6).cast("double")


def lsh_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane signature: bit p = sign(plane_p · v)."""
    bucket: Column = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_weight(p, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(F.round(dot, 6) >= 0, F.lit(2 ** p).cast("long")).otherwise(0)
    return bucket


def lsh_bucket_gated(vec: Column, depth: Column, max_planes: int) -> Column:
    """Hyperplane signature whose WIDTH is data-dependent: only the first
    `depth` plane bits contribute (plane p gated on p < depth). Lets a
    per-group bucketing depth adapt to the group's size — depth 0 puts
    everything in bucket 0 — while staying one static codegen'd
    expression (no per-group expression rebuild, no extra jobs)."""
    def _mk(pp: int):
        # zip_with requires an exactly-2-arg lambda; bind the plane index
        # via closure, not a default arg
        return lambda x, i: x.cast("double") * _plane_weight(pp, i)

    bucket: Column = F.lit(0).cast("long")
    for p in range(max_planes):
        dot = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), _mk(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(
            (F.lit(p) < depth) & (F.round(dot, 6) >= 0), F.lit(2 ** p).cast("long")
        ).otherwise(0)
    return bucket


def probe_buckets(
    bucket: Column, n_planes: int = N_PLANES, radius: int = 1
) -> Column:
    """Multi-probe bucket set: the signature itself plus every bucket
    within Hamming distance `radius` of it (radius 1 = the n_planes
    one-bit flips — the buckets a near-boundary vector most likely hashed
    into). XOR is spelled arithmetically (b + 2^p − 2·(b & 2^p)) so the
    identical expression runs bit-equal in any SQL engine. All entries
    are distinct by construction, and each corpus vector lives in exactly
    ONE bucket, so probing never produces duplicate candidate pairs.
    Radius ≥ 2 is deliberately unsupported: the probe set grows
    C(n_planes, 2)-fold while recall gains taper — at that point add
    planes or a second independent hash table instead."""
    if radius > 1:
        raise ValueError("probe radius > 1 unsupported; use more planes")
    probes = [bucket]
    if radius >= 1:
        for p in range(n_planes):
            bit = F.lit(2 ** p).cast("long")
            probes.append(bucket + bit - 2 * bucket.bitwiseAND(bit))
    return F.array(*probes)


def lsh_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k: corpus bucketed by hyperplane signature; each
    query scans its own bucket plus (multi-probe, default radius 1) the
    one-bit-flip neighbor buckets — the standard recall fix for a vector
    that lands near a hyperplane and whose true neighbors straddle it.
    The corpus side is untouched (still bucketed ONCE, one narrow
    projection); only the small broadcast query side fans out ×(planes+1).
    Recall < 1 remains possible by construction (that's the
    approximation); the oracle reproduces the same probe set exactly.
    probe_radius=0 restores single-probe behavior."""
    c = embs.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("nv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            probe_buckets(lsh_bucket(F.col(vec_col)), radius=probe_radius)
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )
