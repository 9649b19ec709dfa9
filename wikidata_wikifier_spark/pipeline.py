"""End-to-end wikification pipeline over a source-repo table
(north_star): mention detection → candidate generation → feature scoring →
MLP re-ranking → top-k links → canonicalization → triples.

This is the Spark re-expression of the reference's three `tl` chains
(wikifier/wikifier.py:79-224) as ONE lazy DataFrame DAG with explicit
barriers only where fan-out would re-execute expensive stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import candidates as cand_ops
from .operators import features, ranker, topk
from .operators.connected_components import connected_components
from .operators.mentions import detect_mentions

PIPELINE_FEATURES = [
    "monge_elkan",
    "monge_elkan_aliases",
    "jaro_winkler",
    "levenshtein",
    "singleton",
    "context_score_3",
    "pgt_centroid_score",
    "pgt_class_count_tf_idf_score",
    "pgt_property_count_tf_idf_score",
    "num_occurences",
]


def wikify(
    source: DataFrame,
    index: DataFrame,
    k: int = 1,
) -> DataFrame:
    """source(repo,path,commit,lang,content) × index(ENTITY_INDEX) →
    LINKS table (top-k per mention + match flag), sha256 carried through.
    """
    mentions = detect_mentions(source)
    # mentions feed 4 retrieval strategies + the final join-back; without a
    # barrier the content scan + regex extraction would re-run ~6x
    mentions = mentions.localCheckpoint()
    m = mentions.select(
        F.col("mention_id").alias("row"),
        "label_clean",
        "repo",
        "path",
        "content_sha256",
        "label",
    )

    cands = cand_ops.generate_candidates(
        m.select("row", "label_clean"), index.select("qnode", "label", "aliases", "pagerank")
    ).select(
        "row",
        "label_clean",
        "qnode",
        "kg_label",
        F.round("pagerank", 6).alias("pagerank"),
        F.round("retrieval_score", 6).alias("retrieval_score"),
        "num_occurences",
    )
    # only per-qnode SCALARS ride on the candidate table; aliases/embedding
    # arrays stay in dimension tables joined where actually needed
    full = cands.join(F.broadcast(index.select("qnode", "class")), "qnode")

    # spread before the feature stages: upstream AQE coalesces the capped
    # candidate table to 1-2 partitions, which would serialize them.
    # localCheckpoint: string_similarity_features reads its input twice
    # (distinct-pair side + join-back side) — without the barrier the whole
    # candidate generation runs 2×.
    n_parts = max(source.sparkSession.sparkContext.defaultParallelism * 2, 16)
    full = full.repartition(n_parts, F.col("row")).localCheckpoint()
    f = features.string_similarity_features(
        full, alias_dim=index.select("qnode", "aliases")
    )
    f = features.singleton_feature(f)
    f = features.pick_hc_candidates(f)
    # code mentions have no tabular row context → context scores are 0;
    # kth-percentile anchoring falls back to string-sim quality
    f = f.withColumn("context_score", F.lit(0.0)).withColumn(
        "context_score_3", F.lit(0.0)
    )
    f = features.pgr_rts(f)
    # barrier BEFORE kth_percentile: it references its input twice
    # (distribution table + join-back) and would re-run candidate
    # generation + string sims 2× without the cut
    f = f.localCheckpoint()
    f = features.kth_percentile(f, score_col="best_str_sim")
    f = f.localCheckpoint()
    f = features.semantic_tfidf(f, "class", "kth_percenter", "smc_class_score")
    f = f.withColumn("smc_property_score", F.col("smc_class_score"))
    f = ranker.predict_using_model(
        f,
        ranker.PSEUDO_GT_FEATURES,
        ranker.pseudo_gt_weights(),
        ranker.PSEUDO_GT_DATA_MIN,
        ranker.PSEUDO_GT_DATA_MAX,
        "pseudo_gt_prediction",
    )
    f = features.create_pseudo_gt(f, "pseudo_gt_prediction", "smc_class_score")
    f = f.localCheckpoint()
    f = features.embedding_centroid_score(
        f, emb_dim=index.select("qnode", "embedding")
    )
    f = features.semantic_tfidf(f, "class", "pseudo_gt", "pgt_class_count_tf_idf_score")
    f = f.withColumn(
        "pgt_property_count_tf_idf_score", F.col("pgt_class_count_tf_idf_score")
    )
    f = ranker.predict_using_model(
        f,
        PIPELINE_FEATURES,
        ranker.pipeline_ranker_weights(),
        ranker.FINAL_DATA_MIN,
        ranker.FINAL_DATA_MAX,
        "siamese_prediction",
    )

    links = topk.get_kg_links(f, k=k, score_col="siamese_prediction")
    links = topk.apply_match_rule(links)
    return (
        links.join(m.select("row", "repo", "path", "content_sha256"), "row")
        .select(
            F.col("row").alias("mention_id"),
            "repo",
            "path",
            "label_clean",
            "qnode",
            "kg_label",
            "siamese_prediction",
            F.col("rank").cast("int").alias("rank"),
            "match",
            "content_sha256",
        )
    )


def canonicalize_links(links: DataFrame, alias_edges: DataFrame) -> DataFrame:
    """Connected components over sameAs edges → rewrite each linked qnode
    to its component representative (north_rule canonicalization)."""
    comp = connected_components(alias_edges)
    return (
        links.join(
            F.broadcast(comp.withColumnRenamed("node", "qnode")), "qnode", "left"
        )
        .withColumn("canonical_qnode", F.coalesce(F.col("component"), F.col("qnode")))
        .drop("component")
    )
