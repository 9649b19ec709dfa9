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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import char_ngrams, edge_ngrams
from ..functions.strings import clean_label, levenshtein_similarity

EDGE_MIN, EDGE_MAX = 3, 10
TRIGRAM_JACCARD_MIN = 0.5
FUZZY_SIM_MIN = 0.7
# ES returns a bounded result page per query; we mirror that: each
# strategy keeps its top N candidates per mention (score desc, qnode asc).
# Without this cap a head label ("cold widget" shared by hundreds of
# entities at scale) drags its full entity list through every downstream
# feature stage.
TOP_N_PER_STRATEGY = 50


def _cap_per_mention(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("row").orderBy(
        F.desc("retrieval_score"), F.asc("qnode")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= TOP_N_PER_STRATEGY)
        .drop("_rn")
    )
# Candidate-pair generation uses PREFIX FILTERING (Chaudhuri et al. /
# ppjoin family): order each string's grams by global document frequency
# (rarest first) and join only on the first floor(n/2)+1 of them. For
# Jaccard ≥ 0.5 this is RECALL-EXACT (J ≥ 0.5 ⇒ overlap ≥ 0.5·n_a ⇒ the
# rarest-half prefixes must intersect) while head grams ("wid" in every
# "widget" alias, O(df²) join fan-out) almost never appear in a prefix.
# The fuzzy strategy reuses the same candidate pairs — heuristic recall
# there, like Elasticsearch's own fuzzy retrieval.


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
        .transform(_cap_per_mention)
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
        .transform(_cap_per_mention)
    )


def _gram_side(df: DataFrame, col: str, out: str) -> Column:
    return F.explode(F.array_distinct(char_ngrams(F.col(col), 3))).alias(out)


def _prefix(df: DataFrame, part_cols: list[str], n_col: str) -> DataFrame:
    """Keep each string's floor(n/2)+1 rarest grams (order: gdf, gram)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy("gdf", "gram")
    limit = F.floor(F.col(n_col) / 2) + 1
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= limit)
        .drop("rk", "gdf")
    )


def _scored_string_pairs(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """STRING-level candidate scoring: (label_clean, alias_norm, jaccard,
    lev_sim) over DISTINCT strings only.

    Key scale insight: trigram-Jaccard and levenshtein depend only on the
    string pair, and distinct strings grow with the vocabulary, not the
    corpus — at 100× rows the distinct-label set barely moves. Verifying
    per (mention, alias) row instead explodes with entity duplication
    (measured: 33.7M pairs at sf0.1 vs ~100k distinct string pairs).
    The per-qnode fan-out happens only AFTER the similarity threshold,
    and is immediately capped per mention."""
    a_str = (
        _alias_index(index)
        .select("alias_norm")
        .distinct()
        .withColumn("ag", F.array_distinct(char_ngrams(F.col("alias_norm"), 3)))
        .withColumn("n_a", F.size("ag"))
        .where(F.col("n_a") > 0)
    )
    m_str = (
        mentions.select("label_clean")
        .distinct()
        .withColumn("mg", F.array_distinct(char_ngrams(F.col("label_clean"), 3)))
        .withColumn("n_m", F.size("mg"))
        .where(F.col("n_m") > 0)
    )
    gram_df = a_str.select(F.explode("ag").alias("gram")).groupBy("gram").agg(
        F.count("*").alias("gdf")
    )
    a_grams = a_str.select("alias_norm", "n_a", F.explode("ag").alias("gram")).join(
        F.broadcast(gram_df), "gram"
    )
    a_pre = _prefix(a_grams, ["alias_norm"], "n_a")
    m_grams = (
        m_str.select("label_clean", "n_m", F.explode("mg").alias("gram"))
        .join(F.broadcast(gram_df), "gram", "left")
        .na.fill({"gdf": 0})
    )
    m_pre = _prefix(m_grams, ["label_clean"], "n_m")

    pairs = (
        m_pre.join(F.broadcast(a_pre), "gram", "inner")
        .select("label_clean", "alias_norm")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(m_str.select("label_clean", "mg", "n_m")), "label_clean")
        .join(F.broadcast(a_str.select("alias_norm", "ag", "n_a")), "alias_norm")
        .withColumn("overlap", F.size(F.array_intersect("mg", "ag")))
        .withColumn(
            "jaccard",
            F.col("overlap") / (F.col("n_m") + F.col("n_a") - F.col("overlap")),
        )
        .withColumn("lev_sim", levenshtein_similarity(F.col("label_clean"), F.col("alias_norm")))
        .select("label_clean", "alias_norm", "jaccard", "lev_sim")
    )


def trigram_matches(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """get-trigram-matches (wikifier.py:88-90): char-3gram overlap with
    Jaccard ≥ 0.5 against any alias; score = best Jaccard.

    Plan: string-level prefix-filtered scoring, threshold, then fan out
    to (mention, qnode) and cap — see _scored_string_pairs."""
    return _expand_string_matches(
        mentions,
        index,
        _scored_string_pairs(mentions, index)
        .where(F.col("jaccard") >= TRIGRAM_JACCARD_MIN)
        .select("label_clean", "alias_norm", F.col("jaccard").alias("score")),
        "trigram",
    )


def _expand_string_matches(
    mentions: DataFrame, index: DataFrame, str_matches: DataFrame, method: str
) -> DataFrame:
    """(label_clean, alias_norm, score) string matches → per-(mention,
    qnode) candidates with max-over-aliases score, capped per mention."""
    aliases = _alias_index(index).select(
        "qnode", "kg_label_src", "pagerank", "alias_norm"
    )
    n_parts = max(mentions.sparkSession.sparkContext.defaultParallelism * 2, 16)
    expanded = (
        mentions.select("row", "label_clean")
        .repartition(n_parts, F.col("row"))
        .join(F.broadcast(str_matches), "label_clean")
        .join(F.broadcast(aliases), "alias_norm")
    )
    return (
        expanded.groupBy("row", "label_clean", "qnode")
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
            F.lit(method).alias("method"),
            "retrieval_score",
        )
        .transform(_cap_per_mention)
    )


def fuzzy_matches(mentions: DataFrame, index: DataFrame) -> DataFrame:
    """get-fuzzy-augmented-matches (wikifier.py:82-84): edit-distance
    tolerant retrieval. Plan: string-level prefix-filtered candidate
    pairs, NATIVE levenshtein verification >= 0.7 (whole-stage codegen),
    then fan-out + per-mention cap — see _scored_string_pairs."""
    return _expand_string_matches(
        mentions,
        index,
        _scored_string_pairs(mentions, index)
        .where(F.col("lev_sim") >= FUZZY_SIM_MIN)
        .select("label_clean", "alias_norm", F.col("lev_sim").alias("score")),
        "fuzzy",
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
