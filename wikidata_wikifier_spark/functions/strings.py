"""String normalization + similarity functions.

Reference semantics (SURVEY.md §2.4, /root/reference/wikifier/wikifier.py):
- `tl clean -c label -o label_clean` (wikifier.py:80): lower/trim/strip
  punctuation → whitespace-collapsed label_clean.
- `string-similarity --method levenshtein` (wikifier.py:154): normalized
  similarity 1 - dist/max(len) — NATIVE Spark expression (JVM codegen,
  no Python in the hot path).
- `--method jaro_winkler` (wikifier.py:153) and
  `--method symmetric_monge_elkan:tokenizer=word` (wikifier.py:149-152):
  no Spark built-in → vectorized Arrow pandas UDFs (batch-at-a-time numpy
  loops, never row-at-a-time Python UDFs).

Jaro-Winkler here is the standard definition (scaling p=0.1, max prefix 4,
no boost threshold) — verified bit-compatible with DuckDB's
jaro_winkler_similarity by tests/test_strings.py so the driver's DuckDB
oracle hashes match.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# ---------------------------------------------------------------- cleaning

def clean_label(col: Column) -> Column:
    """`tl clean` analogue: lowercase, strip non-alnum to space, collapse."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace word tokens of an already-cleaned label."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


# ------------------------------------------------- native levenshtein sim

def levenshtein_similarity(a: Column, b: Column) -> Column:
    """1 - levenshtein/max(len). Whole-stage-codegen'd JVM expression."""
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / denom
    )


# ---------------------------------------------------------- jaro-winkler

def _jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0  # DuckDB convention: any empty side scores 0
    if s1 == s2:
        return 1.0
    match_dist = max(len1, len2) // 2 - 1
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(i + match_dist + 1, len2)
        for j in range(lo, hi):
            if not s2_matches[j] and s2[j] == c1:
                s1_matches[i] = True
                s2_matches[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if s1_matches[i]:
            while not s2_matches[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler with the standard 0.7 boost threshold (prefix bonus
    only when the Jaro score exceeds 0.7) — matches DuckDB's
    jaro_winkler_similarity bit-for-bit (tests/test_strings.py)."""
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            jaro_winkler(x if x is not None else "", y if y is not None else "")
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


# ----------------------------------------------------------- monge-elkan

def monge_elkan(tokens_a: list[str], tokens_b: list[str]) -> float:
    """Directed Monge-Elkan: mean over a-tokens of best JW vs b-tokens."""
    if not tokens_a or not tokens_b:
        return 0.0
    total = 0.0
    for ta in tokens_a:
        best = 0.0
        for tb in tokens_b:
            s = jaro_winkler(ta, tb)
            if s > best:
                best = s
        total += best
    return total / len(tokens_a)


def symmetric_monge_elkan(tokens_a: list[str], tokens_b: list[str]) -> float:
    """`symmetric_monge_elkan:tokenizer=word` (wikifier.py:149): mean of
    both directed scores."""
    return 0.5 * (monge_elkan(tokens_a, tokens_b) + monge_elkan(tokens_b, tokens_a))


@pandas_udf(DoubleType())
def symmetric_monge_elkan_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        ta = [t for t in (x or "").split() if t]
        tb = [t for t in (y or "").split() if t]
        out.append(symmetric_monge_elkan(ta, tb))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def monge_elkan_max_over_aliases_udf(a: pd.Series, aliases: pd.Series) -> pd.Series:
    """monge_elkan_aliases (wikifier.py:151-152): max sym-ME over the
    candidate's alias array."""
    out = []
    for x, al in zip(a, aliases):
        ta = [t for t in (x or "").split() if t]
        best = 0.0
        if al is not None:
            for alias in al:
                tb = [t for t in (alias or "").split() if t]
                s = symmetric_monge_elkan(ta, tb)
                if s > best:
                    best = s
        out.append(best)
    return pd.Series(out, dtype="float64")
