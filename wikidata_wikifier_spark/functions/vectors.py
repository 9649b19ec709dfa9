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


# --------------------------------------------------------------------------
# Codegen-friendly fixed-dimension variants.
#
# F.aggregate / F.zip_with are CodegenFallback expressions: every array
# element pays an interpreted lambda dispatch, so a pairwise cosine over an
# N×Q cross join costs N·Q·dim·3 interpreted evals — the measured #1 cost of
# ann_cosine_topk (112s of the 152s sf1.0 headline, guide §1.2 step 1 /
# §4.1 "prefer built-ins"). When every vector has one known dimension, the
# same fold unrolls into a left-deep Add chain of getItem terms that
# whole-stage codegen compiles to straight-line JVM arithmetic.
#
# Bit-exactness: aggregate(zip_with(a,b,x*y), 0.0, acc+v) evaluates
# ((0.0 + a0·b0) + a1·b1) + … left-to-right in doubles; the unrolled chain
# below reproduces the identical association and operand order, so results
# are IEEE-754 identical, not merely close. Null arrays yield null through
# both forms (null getItem terms null the whole accumulation, exactly as
# the fold over a null array is null).
#
# CALLER CONTRACT: pass `dim` only when every non-null vector in the data
# has exactly that size (queries.embeddings_dim sniffs min==max once per
# session and returns None otherwise — None keeps the original interpreted
# expressions). The fast forms are emitted WITHOUT a per-row size guard: a
# first version guarded each row with when(size==dim, fast).otherwise(slow),
# which doubled every expression tree with an interpreted fallback branch
# and made per-run planning+codegen slower than the actual compute (bench
# rebuilds the DataFrame each run). Under ANSI a contract violation fails
# loudly (array index OOB) rather than returning wrong results.
# --------------------------------------------------------------------------

# Beyond this the single generated method risks Janino's hard 64KB JVM
# method-size limit (a 64-term chain is ~10KB of bytecode; ~256 terms
# stays safely under with headroom for the surrounding operator code) —
# past it, keep the interpreted fold rather than risk a codegen fallback
# of the whole stage.
UNROLL_MAX_DIM = 256

# Build-time note: chaining `acc + term` Column ops costs one py4j round
# trip PER TERM (~4ms each — measured 6-7s of pure DataFrame build for
# the LSH query's ~1400 terms, dwarfing its execution). When the operand
# is a plain column NAME the whole chain is therefore rendered as ONE SQL
# string and parsed server-side with F.expr — one py4j call. SQL `+` is
# left-associative and `a[i]` resolves to the same 0-based GetArrayItem
# as Column.getItem, so the parsed tree is the identical expression.


def _sql_dot(a: str, b: str, dim: int) -> str:
    terms = " + ".join(
        f"CAST(`{a}`[{i}] AS DOUBLE) * CAST(`{b}`[{i}] AS DOUBLE)" for i in range(dim)
    )
    return f"0.0D + {terms}"


def dot_unrolled(a: Column | str, b: Column | str, dim: int) -> Column:
    """Bit-exact unrolled `dot` for size-`dim` arrays (see module note).
    String operands = column names, rendered as one server-parsed SQL
    expression (same tree, ~dim fewer py4j calls)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_sql_dot(a, b, dim))
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc


def norm_unrolled(a: Column | str, dim: int) -> Column:
    """Bit-exact unrolled `norm` for size-`dim` arrays."""
    if isinstance(a, str):
        return F.expr(f"SQRT({_sql_dot(a, a, dim)})")
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i).cast("double") * a.getItem(i).cast("double")
    return F.sqrt(acc)


def norm_fixed(a: Column | str, dim: int | None) -> Column:
    """`norm` specialised to a uniform dimension (see CALLER CONTRACT);
    dim=None returns the original interpreted fold unchanged."""
    if not dim or dim > UNROLL_MAX_DIM:
        return norm(F.col(a) if isinstance(a, str) else a)
    return norm_unrolled(a, dim)


def cosine_fixed(
    a: Column | str,
    b: Column | str,
    dim: int | None,
    na: Column | str | None = None,
    nb: Column | str | None = None,
) -> Column:
    """`cosine` specialised to a uniform dimension, bit-equal to cosine()
    on conforming data (see CALLER CONTRACT above).

    na/nb: optionally precomputed norm_fixed(a|b, dim) columns — lets a
    join precompute each side's norm once per ROW instead of once per
    PAIR (guide §2.3: don't recompute what a narrower input carries).
    Pass dim=None (e.g. when the corpus has mixed dims) to get the
    original expression unchanged. All-string operands render as one
    server-parsed SQL expression (see build-time note)."""
    if not dim or dim > UNROLL_MAX_DIM:
        return cosine(
            F.col(a) if isinstance(a, str) else a,
            F.col(b) if isinstance(b, str) else b,
        )
    if (
        isinstance(a, str) and isinstance(b, str)
        and isinstance(na, str) and isinstance(nb, str)
    ):
        return F.expr(
            f"CASE WHEN (`{na}` * `{nb}`) = 0 THEN 0.0D "
            f"ELSE ({_sql_dot(a, b, dim)}) / (`{na}` * `{nb}`) END"
        )
    na = na if na is not None else norm_fixed(a, dim)
    nb = nb if nb is not None else norm_fixed(b, dim)
    denom = na * nb
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_unrolled(a, b, dim) / denom)
