"""Candidate generation — the reference's four retrieval strategies as
broadcast inverted-index joins (SURVEY.md §2.3).

Reference (wikifier/wikifier.py:81-113) queries Elasticsearch per cell with
four strategies: get-exact-matches, get-ngram-matches, get-trigram-matches,
get-fuzzy-augmented-matches, then concatenates and deduplicates per
(cell, kg_id) recording how many strategies retrieved each candidate
(num_occurences ∈ 1..4, deduplicate-candidates at wikifier.py:148).

Spark-first re-expression: the per-row HTTP retrieval becomes a set of
equi-joins against a *broadcast* exploded label/alias index — the
inverted-index structure ES builds (edge-ngram analyzer, trigram analyzer,
keyword field) is generated as native column expressions on the index side
and joined on the generated key. At 100 TB the mention side streams through
map-side broadcast joins with zero shuffle; only the final per-(mention,
qnode) aggregation shuffles, keyed by the mention — AQE-coalesced and
skew-split (head labels like "Ronaldo" are spread because the aggregation
key includes the row id, not the label).

All scoring rules here are deterministic and mirrored in the DuckDB oracle
(oracles.py) for driver verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import char_ngrams, edge_ngrams
from ..functions.strings import clean_label, levenshtein_similarity

EDGE_MIN, EDGE_MAX = 3, 10
TRIGRAM_JACCARD_MIN = 0.5
FUZZY_SIM_MIN = 0.7


def _alias_index(index: DataFrame) -> DataFrame:
    """Explode (qnode, aliases[]) → (qnode, alias_norm, pagerank, label)."""
    return (
        index.select(
            "qnode",
            F.col("label").alias("kg_label_src"),
            "pagerank",
            F.explode("aliases").alias("alias"),
        )
        .withColumn("alias_norm", clean_label(F.col("alias")))
        # distinct normalized terms per qnode: aliases that normalize to
        # the same string ("iron-ring" → "iron ring" = label) must index
        # once, or gram-overlap counts double (ES analyzers dedupe terms
        # per doc the same way)
        .dropDuplicates(["qnode", "alias_norm"])
    )


def exact_matches(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """get-exact-matches (wikifier.py:91-93): label_clean == normalized
    label/alias. Broadcast hash equi-join, score 1.0."""
    idx = _alias_index(index).select("qnode", "kg_label_src", "pagerank", "alias_norm")
    joined = mentions.join(
        F.broadcast(idx), mentions["label_clean"] == idx["alias_norm"], "inner"
    )
    return (
        joined.groupBy("row", "label_clean", "qnode")
        .agg(
            F.first("kg_label_src").alias("kg_label"),
            F.first("pagerank").alias("pagerank"),
        )
        .select(
            "row",
            "label_clean",
            "qnode",
            "kg_label",
            "pagerank",
            F.lit("exact").alias("method"),
            F.lit(1.0).alias("retrieval_score"),
        )
    )


def ngram_matches(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """get-ngram-matches (wikifier.py:85-87): ES edge-ngram analyzer →
    index aliases exploded into prefixes (len 3..10); the mention matches
    on its leading min(10, len) characters. Score = matched-prefix length /
    alias length (longer aliases score lower, BM25-flavored), max over
    aliases."""
    idx = (
        _alias_index(index)
        .select(
            "qnode",
            "kg_label_src",
            "pagerank",
            "alias_norm",
            F.explode(edge_ngrams(F.col("alias_norm"), EDGE_MIN, EDGE_MAX)).alias(
                "prefix"
            ),
        )
    )
    key = F.substring(
        F.col("label_clean"), 1, F.least(F.length("label_clean"), F.lit(EDGE_MAX)).cast("int")
    )
    m = mentions.withColumn("mkey", key).where(F.length("mkey") >= EDGE_MIN)
    joined = m.join(F.broadcast(idx), m["mkey"] == idx["prefix"], "inner")
    score = F.length("prefix") / F.length("alias_norm")
    return (
        joined.withColumn("score", score)
        .groupBy("row", "label_clean", "qnode")
        .agg(
            F.first("kg_label_src").alias("kg_label"),
            F.first("pagerank").alias("pagerank"),
            F.round(F.max("score"), 6).alias("retrieval_score"),
        )
        .select(
            "row",
            "label_clean",
            "qnode",
            "kg_label",
            "pagerank",
            F.lit("ngram").alias("method"),
            "retrieval_score",
        )
    )


def _gram_side(df: DataFrame, col: str, out: str) -> Column:
    return F.explode(F.array_distinct(char_ngrams(F.col(col), 3))).alias(out)


def trigram_matches(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """get-trigram-matches (wikifier.py:88-90): char-3gram overlap with
    Jaccard ≥ 0.5 against any alias; score = best Jaccard."""
    m = mentions.select(
        "row",
        "label_clean",
        F.size(F.array_distinct(char_ngrams(F.col("label_clean"), 3))).alias("n_m"),
        _gram_side(mentions, "label_clean", "gram"),
    )
    idx = _alias_index(index).select(
        "qnode",
        "kg_label_src",
        "pagerank",
        "alias_norm",
        F.size(F.array_distinct(char_ngrams(F.col("alias_norm"), 3))).alias("n_a"),
        _gram_side(index, "alias_norm", "gram"),
    )
    joined = m.join(F.broadcast(idx), "gram", "inner")
    per_alias = (
        joined.groupBy("row", "label_clean", "qnode", "alias_norm")
        .agg(
            F.first("kg_label_src").alias("kg_label"),
            F.first("pagerank").alias("pagerank"),
            F.first("n_m").alias("n_m"),
            F.first("n_a").alias("n_a"),
            F.count("*").alias("overlap"),
        )
        .withColumn("jaccard", F.col("overlap") / (F.col("n_m") + F.col("n_a") - F.col("overlap")))
        .where(F.col("jaccard") >= TRIGRAM_JACCARD_MIN)
    )
    return (
        per_alias.groupBy("row", "label_clean", "qnode")
        .agg(
            F.first("kg_label").alias("kg_label"),
            F.first("pagerank").alias("pagerank"),
            F.round(F.max("jaccard"), 6).alias("retrieval_score"),
        )
        .select(
            "row",
            "label_clean",
            "qnode",
            "kg_label",
            "pagerank",
            F.lit("trigram").alias("method"),
            "retrieval_score",
        )
    )


def fuzzy_matches(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """get-fuzzy-augmented-matches (wikifier.py:82-84): edit-distance
    tolerant retrieval. Plan: trigram-overlap pre-filter (any shared gram —
    the candidate generator) then NATIVE levenshtein verification ≥ 0.7;
    score = normalized levenshtein similarity, max over aliases. The
    verify step stays in whole-stage codegen (F.levenshtein)."""
    m = mentions.select("row", "label_clean", _gram_side(mentions, "label_clean", "gram"))
    idx = _alias_index(index).select(
        "qnode", "kg_label_src", "pagerank", "alias_norm", _gram_side(index, "alias_norm", "gram")
    )
    pairs = (
        m.join(F.broadcast(idx), "gram", "inner")
        .dropDuplicates(["row", "label_clean", "qnode", "alias_norm"])
        .withColumn("sim", levenshtein_similarity(F.col("label_clean"), F.col("alias_norm")))
        .where(F.col("sim") >= FUZZY_SIM_MIN)
    )
    return (
        pairs.groupBy("row", "label_clean", "qnode")
        .agg(
            F.first("kg_label_src").alias("kg_label"),
            F.first("pagerank").alias("pagerank"),
            F.round(F.max("sim"), 6).alias("retrieval_score"),
        )
        .select(
            "row",
            "label_clean",
            "qnode",
            "kg_label",
            "pagerank",
            F.lit("fuzzy").alias("method"),
            "retrieval_score",
        )
    )


def generate_candidates(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """Union of the four strategies + deduplicate-candidates
    (wikifier.py:148): per (row, qnode) keep max retrieval_score and count
    distinct retrieving strategies as num_occurences (1..4)."""
    unioned = (
        exact_matches(mentions, index)
        .unionByName(ngram_matches(mentions, index))
        .unionByName(trigram_matches(mentions, index))
        .unionByName(fuzzy_matches(mentions, index))
    )
    return (
        unioned.groupBy("row", "label_clean", "qnode")
        .agg(
            F.first("kg_label").alias("kg_label"),
            F.max("pagerank").alias("pagerank"),
            F.max("retrieval_score").alias("retrieval_score"),
            F.countDistinct("method").alias("num_occurences"),
            F.array_sort(F.collect_set("method")).alias("methods"),
        )
    )
