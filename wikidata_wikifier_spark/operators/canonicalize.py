"""`tl canonicalize --add-context` + `tl clean` as native Spark ops.

Reference (wikifier/wikifier.py:79-80): melt a wide table into the long
cell table (column, row, label) — one row per cell of each target column —
with `context` = pipe-joined other cells of the same input row; then
normalize the cell into label_clean.

Spark mapping: stack() unpivot (single narrow shuffle-free projection —
each input row emits len(columns) rows in place), not a join. `row` comes
from an explicit key column when available (deterministic under
parallelism changes); falling back to zipWithIndex-style ids is avoided by
contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.strings import clean_label


def canonicalize(
    df: DataFrame,
    target_columns: list[str],
    row_key: str,
    context_columns: list[str] | None = None,
) -> DataFrame:
    """Melt wide → long (column, row, label, context).

    column is the ordinal index of the target column (reference emits
    column indices); context is the pipe-join of the row's other columns
    (`--add-context`).
    """
    if context_columns is None:
        context_columns = [
            c for c in df.columns if c not in target_columns and c != row_key
        ]
    ctx: Column = F.concat_ws("|", *[F.col(c).cast("string") for c in context_columns])

    stack_args: list[Column] = []
    for idx, c in enumerate(target_columns):
        stack_args.append(F.lit(idx))
        stack_args.append(F.col(c).cast("string"))
    n = len(target_columns)

    return (
        df.select(
            F.col(row_key).cast("long").alias("row"),
            F.stack(F.lit(n), *stack_args).alias("column", "label"),
            ctx.alias("context"),
        )
        .select("column", "row", "label", "context")
    )


def clean(df: DataFrame, col: str = "label", out: str = "label_clean") -> DataFrame:
    """`tl clean -c label -o label_clean` (wikifier.py:80)."""
    return df.withColumn(out, clean_label(F.col(col)))
