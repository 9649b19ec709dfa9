"""Explicit StructType contracts per pipeline stage (SURVEY.md §1.3).

The reference's schema is accretive (each `tl` command appends columns to
a CSV); here every stage boundary has a declared schema so Catalyst can
prune columns into the scan and stage outputs are stable for
checkpoint/resume.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# input_hint (BASELINE.json): Iceberg table of source-code repositories
SOURCE_REPOS = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
)

# One typed (property, value, type) context entry per entity property —
# the reference's context.jl aux harvest (wikifier/wikifier.py:72,122-130)
CONTEXT_ENTRY = StructType(
    [
        StructField("property", StringType()),
        StructField("value", StringType()),
        StructField("vtype", StringType()),  # string | quantity | date
    ]
)

# Wikidata label/alias index (replaces ES index wikidatadwd-augmented;
# fields per reference wikifier/wikifier.py:24 aux list:
# graph_embedding_complex, class_count, property_count, context).
# class_count/property_count are COUNT MAPS (class/property qnode → edge
# count), the multi-valued form the reference's aux TSVs carry — a single
# scalar class cannot express multi-class entities or the property
# distribution the semantic-consistency features score against.
ENTITY_INDEX = StructType(
    [
        StructField("qnode", StringType()),
        StructField("label", StringType()),
        StructField("aliases", ArrayType(StringType())),
        StructField("description", StringType()),
        StructField("pagerank", DoubleType()),
        StructField("class", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("class_count", MapType(StringType(), IntegerType())),
        StructField("property_count", MapType(StringType(), IntegerType())),
        StructField("context_arr", ArrayType(CONTEXT_ENTRY)),
    ]
)

# long-form cell/mention table (tl canonicalize analogue)
MENTIONS = StructType(
    [
        StructField("mention_id", LongType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("kind", StringType()),  # identifier | docstring | string_literal
        StructField("label", StringType()),
        StructField("label_clean", StringType()),
        StructField("context", StringType()),
        StructField("content_sha256", StringType()),
    ]
)

LINKS = StructType(
    [
        StructField("mention_id", LongType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("label_clean", StringType()),
        StructField("qnode", StringType()),
        StructField("kg_label", StringType()),
        StructField("siamese_prediction", DoubleType()),
        StructField("rank", IntegerType()),
        StructField("match", IntegerType()),
        StructField("content_sha256", StringType()),
    ]
)

TRIPLES = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("part", IntegerType()),
    ]
)
