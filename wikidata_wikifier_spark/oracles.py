"""DuckDB oracle SQL for every driver-checked query in queries.py.

Shared CTE fragments mirror operators/linking_fixture.py and the
normalization in functions/strings.py verbatim; any change there must be
reflected here (tests/test_oracle_parity.py runs both sides at sf0.001 and
asserts frame equality before the driver ever sees them).
"""

from __future__ import annotations

# clean_label (functions/strings.py): lower → non-alnum runs → space → trim
CLEAN = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"

LINKING_CTES = """
WITH entity_index AS (
    SELECT 'Q' || CAST(p_partkey AS VARCHAR)                AS qnode,
           lower(p_name)                                    AS label,
           [lower(p_name),
            lower(p_brand) || ' ' || lower(p_name),
            lower(p_name) || ' ' || lower(p_type)]          AS aliases,
           round(p_retailprice / 1000.0, 6)                 AS pagerank
    FROM part
),
mentions AS (
    SELECT p_partkey                                        AS row,
           CASE CAST(p_partkey % 3 AS INTEGER)
             WHEN 0 THEN lower(p_name)
             WHEN 1 THEN substr(lower(p_name), 1, length(p_name) - 1)
             ELSE upper(p_name)
           END                                              AS label,
           p_brand || '|' || lower(p_type) || '|' || CAST(p_size AS VARCHAR)
                                                            AS context
    FROM part
    WHERE p_partkey % 5 = 0
),
cm AS (
    SELECT row, label,
           trim(regexp_replace(lower(label), '[^a-z0-9]+', ' ', 'g')) AS label_clean,
           context
    FROM mentions
),
alias_idx AS (
    SELECT qnode, label, pagerank,
           trim(regexp_replace(lower(a), '[^a-z0-9]+', ' ', 'g')) AS alias_norm
    FROM (SELECT qnode, label, pagerank, unnest(aliases) AS a FROM entity_index)
),
mk AS (
    SELECT row, label_clean,
           substr(label_clean, 1, least(length(label_clean), 10)) AS mkey
    FROM cm WHERE length(label_clean) >= 3
),
alias_prefix AS (
    SELECT qnode, label, pagerank, alias_norm,
           substr(alias_norm, 1, n) AS prefix
    FROM (SELECT *, unnest(generate_series(3, least(length(alias_norm), 10))) AS n
          FROM alias_idx WHERE length(alias_norm) >= 3)
),
mg AS (
    SELECT row, label_clean,
           list_distinct([substr(label_clean, i, 3)
                          for i in generate_series(1, length(label_clean) - 2)]) AS grams
    FROM cm WHERE length(label_clean) >= 3
),
mgrams AS (
    SELECT row, label_clean, len(grams) AS n_m, unnest(grams) AS gram FROM mg
),
ag AS (
    SELECT qnode, label, pagerank, alias_norm,
           list_distinct([substr(alias_norm, i, 3)
                          for i in generate_series(1, length(alias_norm) - 2)]) AS grams
    FROM alias_idx WHERE length(alias_norm) >= 3
),
agrams AS (
    SELECT qnode, label, pagerank, alias_norm, len(grams) AS n_a,
           unnest(grams) AS gram FROM ag
),
exact_m AS (
    SELECT row, label_clean, qnode,
           min(alias_idx.label) AS kg_label,
           min(pagerank) AS pagerank,
           'exact'       AS method,
           1.0           AS retrieval_score
    FROM cm JOIN alias_idx ON cm.label_clean = alias_idx.alias_norm
    GROUP BY 1, 2, 3
),
ngram_m AS (
    SELECT row, label_clean, qnode,
           min(label)    AS kg_label,
           min(pagerank) AS pagerank,
           'ngram'       AS method,
           round(max(length(prefix) * 1.0 / length(alias_norm)), 6) AS retrieval_score
    FROM mk JOIN alias_prefix ON mk.mkey = alias_prefix.prefix
    GROUP BY 1, 2, 3
),
tri_alias AS (
    SELECT row, label_clean, qnode, alias_norm,
           min(label)    AS kg_label,
           min(pagerank) AS pagerank,
           min(n_m)      AS n_m,
           min(n_a)      AS n_a,
           count(*)      AS overlap
    FROM mgrams JOIN agrams USING (gram)
    GROUP BY 1, 2, 3, 4
),
trigram_m AS (
    SELECT row, label_clean, qnode,
           min(kg_label) AS kg_label,
           min(pagerank) AS pagerank,
           'trigram'     AS method,
           round(max(overlap * 1.0 / (n_m + n_a - overlap)), 6) AS retrieval_score
    FROM tri_alias
    WHERE overlap * 1.0 / (n_m + n_a - overlap) >= 0.5
    GROUP BY 1, 2, 3
),
fuzzy_pairs AS (
    SELECT DISTINCT row, label_clean, qnode, label, pagerank, alias_norm
    FROM mgrams JOIN agrams USING (gram)
),
fuzzy_sims AS (
    SELECT *,
           CASE WHEN greatest(length(label_clean), length(alias_norm)) = 0 THEN 1.0
                ELSE 1.0 - levenshtein(label_clean, alias_norm) * 1.0
                     / greatest(length(label_clean), length(alias_norm))
           END AS sim
    FROM fuzzy_pairs
),
fuzzy_m AS (
    SELECT row, label_clean, qnode,
           min(label)    AS kg_label,
           min(pagerank) AS pagerank,
           'fuzzy'       AS method,
           round(max(sim), 6) AS retrieval_score
    FROM fuzzy_sims
    WHERE sim >= 0.7
    GROUP BY 1, 2, 3
),
all_candidates AS (
    SELECT * FROM exact_m
    UNION ALL SELECT * FROM ngram_m
    UNION ALL SELECT * FROM trigram_m
    UNION ALL SELECT * FROM fuzzy_m
)
"""


ORACLES: dict[str, str] = {
    "tpch_q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4)           AS sum_qty,
               round(sum(l_extendedprice), 4)      AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
                                                   AS sum_charge,
               round(avg(l_quantity), 4)           AS avg_qty,
               round(avg(l_discount), 4)           AS avg_disc,
               count(*)                            AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3_top_orders": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_region_volume": """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "canonicalize_add_context": """
        SELECT 0 AS "column", c_custkey AS row, CAST(c_name AS VARCHAR) AS label,
               CAST(c_nationkey AS VARCHAR) || '|' || CAST(c_acctbal AS VARCHAR) AS context
        FROM customer
        UNION ALL
        SELECT 1, c_custkey, CAST(c_mktsegment AS VARCHAR),
               CAST(c_nationkey AS VARCHAR) || '|' || CAST(c_acctbal AS VARCHAR)
        FROM customer
    """,
    "clean_labels": f"""
        SELECT p_partkey AS row,
               p_brand || ' ' || p_name || ' ' || p_type AS label,
               {CLEAN.format(col="p_brand || ' ' || p_name || ' ' || p_type")} AS label_clean
        FROM part
    """,
    "retrieval_exact": LINKING_CTES
    + "SELECT row, label_clean, qnode, kg_label, pagerank, method, retrieval_score FROM exact_m",
    "retrieval_ngram": LINKING_CTES
    + "SELECT row, label_clean, qnode, kg_label, pagerank, method, retrieval_score FROM ngram_m",
    "retrieval_trigram": LINKING_CTES
    + "SELECT row, label_clean, qnode, kg_label, pagerank, method, retrieval_score FROM trigram_m",
    "retrieval_fuzzy": LINKING_CTES
    + "SELECT row, label_clean, qnode, kg_label, pagerank, method, retrieval_score FROM fuzzy_m",
    "candidates_dedup": LINKING_CTES
    + """
        SELECT row, label_clean, qnode,
               min(kg_label)                   AS kg_label,
               round(max(pagerank), 6)         AS pagerank,
               round(max(retrieval_score), 6)  AS retrieval_score,
               count(DISTINCT method)          AS num_occurences,
               array_to_string(list_sort(list_distinct(list(method))), ',') AS methods
        FROM all_candidates
        GROUP BY 1, 2, 3
    """,
}
