"""Output stage: top-k link selection, join-back, match rule
(SURVEY.md §2.5; reference wikifier/wikifier.py:216-224,
wikifier_service.py:116-142).

All windowed-top-k: row_number over the cell partition ordered by score
descending with a deterministic tie-break (qnode ascending) — the classic
Spark top-k that never global-sorts, shuffles once on the cell key, and is
skew-immune because a cell has at most a few hundred candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MATCH_SCORE_MIN = 0.95  # wikifier_service.py:132-133: match = score>0.95 ∧ rank==1


def get_kg_links(
    cands: DataFrame,
    k: int = 1,
    score_col: str = "siamese_prediction",
    cell_cols: list[str] | None = None,
) -> DataFrame:
    """get-kg-links -c {score} -k {k} --k-rows (wikifier.py:217-222):
    emit k rows per cell with a rank column."""
    cell_cols = cell_cols or ["row"]
    w = Window.partitionBy(*cell_cols).orderBy(
        F.desc(score_col), F.desc("retrieval_score"), F.asc("qnode")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def join_back(
    links: DataFrame,
    original: DataFrame,
    on: str = "row",
    extra_info: DataFrame | None = None,
) -> DataFrame:
    """`tl join -f input.csv` (wikifier.py:223-224): attach top-k links
    back onto the original table (left join keeps unlinked rows).

    extra_info: optional (qnode, aliases, description) dimension — mirrors
    `--extra-info` (wikifier.py:223-224), which appends the linked
    entity's aliases and description columns to the output. The aliases
    array is pipe-joined like the reference's CSV rendering. Broadcast
    dimension join; unlinked rows keep NULLs."""
    out = original.join(links, on, "left")
    if extra_info is not None:
        dim = extra_info.select(
            "qnode",
            F.array_join("aliases", "|").alias("kg_aliases"),
            F.col("description").alias("kg_descriptions"),
        )
        out = out.join(F.broadcast(dim), "qnode", "left")
    return out


def apply_match_rule(links: DataFrame, score_col: str = "siamese_prediction") -> DataFrame:
    """W3C-reconcile auto-match rule (wikifier_service.py:132-141)."""
    return links.withColumn(
        "match",
        ((F.col(score_col) > MATCH_SCORE_MIN) & (F.col("rank") == 1)).cast("int"),
    )
