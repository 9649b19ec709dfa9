"""Native array<float> vector math — no UDFs, pure Catalyst expressions.

Used by the embedding-centroid feature (reference score-using-embedding,
wikifier/wikifier.py:191-195), ANN cosine top-k, and embedding-cosine
near-dup. Doubles throughout so results are order-deterministic and match
the DuckDB oracle (list_cosine_similarity) bit-for-bit at the rounding
precision the driver hashes at.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
