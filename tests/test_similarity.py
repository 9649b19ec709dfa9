"""Multi-probe LSH recall: radius-1 probing (own bucket + every one-bit
flip) must find a superset of the single-probe candidate pairs and
strictly improve recall vs the brute-force ground truth on the sf0.001
embeddings — the fixture that motivated the round-4 'single-probe recall
caveat'. Also pins that multi-probe introduces no duplicate (q, n) pairs
(each corpus vector lives in exactly one bucket)."""

from __future__ import annotations

from wikidata_wikifier_spark.operators.similarity import brute_force_topk, lsh_topk
from wikidata_wikifier_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _queries(embs):
    from pyspark.sql import functions as F

    return embs.where(F.col("vec_id") % 100 == 0)


def _pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.select("q_id", "n_id").collect()}


def test_multiprobe_recall_superset_and_no_dups(spark):
    embs = load_table(spark, SF_DIR, "embeddings")
    q = _queries(embs)
    truth = _pairs(brute_force_topk(embs, q, k=5))
    single = lsh_topk(embs, q, k=5, probe_radius=0)
    multi = lsh_topk(embs, q, k=5, probe_radius=1)

    multi_rows = multi.collect()
    multi_pairs = {(r["q_id"], r["n_id"]) for r in multi_rows}
    # no duplicate pairs: probing disjoint buckets can't rescore a pair
    assert len(multi_rows) == len(multi_pairs)

    single_recall = len(_pairs(single) & truth) / len(truth)
    multi_recall = len(multi_pairs & truth) / len(truth)
    assert multi_recall >= single_recall
    # the caveat fixture: radius-1 probing must actually move recall here
    assert multi_recall > single_recall
