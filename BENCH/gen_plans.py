import os, sys, io, contextlib
sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_CPUS"] = "8"
from wikidata_wikifier_spark.session import get_spark
from wikidata_wikifier_spark.queries import QUERIES
spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"

def plan(name):
    df = QUERIES[name](spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

out = open("/root/repo/BENCH/PLANS.md", "w")
out.write("""# Physical-plan audit (sf0.01, local[8])

`df.explain("formatted")` excerpts for representative queries — the
checklist a 100-TB reviewer reads: predicate pushdown + column pruning
into the parquet scan, whole-stage codegen spans over the hot
expressions, broadcast joins for dimensions / shuffle joins where the
side could be large, no Python stages outside the two declared
pandas-UDF sites (string sims, MLP). Regenerate with
`python BENCH/gen_plans.py` (this file's generator is inlined below the
fold of the script used; plans were captured from the registered
queries verbatim).

""")
def section(title, name, note, keep=None):
    p = plan(name)
    if keep:
        lines = [l for l in p.splitlines() if any(k in l for k in keep)]
        body = "\n".join(lines)
        out.write(f"## {title}\n\n{note}\n\nFiltered plan lines (`{'|'.join(keep)}`):\n\n```\n{body}\n```\n\n")
    else:
        out.write(f"## {title}\n\n{note}\n\n```\n{p}\n```\n\n")

section(
    "tpch_q3_top_orders — pushdown + pruning + broadcast",
    "tpch_q3_top_orders",
    "The BUILDING filter and the date range reach the scan as PushedFilters; "
    "ReadSchema carries only the referenced columns; the customer dimension "
    "broadcasts.",
    keep=["PushedFilters", "ReadSchema", "BroadcastHashJoin", "SortMergeJoin", "WholeStageCodegen"],
)
section(
    "text_analysis — one scan, one codegen span",
    "text_analysis",
    "All four text-analysis families fuse into a single parquet scan and "
    "one whole-stage-codegen projection — no shuffle, no Python.",
)
section(
    "dedup_minhash_lsh — banded join, no all-pairs",
    "dedup_minhash_lsh",
    "The self-join keys on (band, band_hash): candidate pairs only, never "
    "O(n^2); exact-Jaccard verification joins the shingle sets per candidate.",
    keep=["Join", "Exchange", "WholeStageCodegen", "PushedFilters", "ReadSchema"],
)
section(
    "retrieval_exact — size-aware broadcast of the alias index",
    "retrieval_exact",
    "The exploded alias index broadcasts at fixture scale; with "
    "spark.sql.autoBroadcastJoinThreshold=-1 the same code degrades to a "
    "shuffle join (BENCH/broadcast_runs.jsonl evidences both paths).",
    keep=["Join", "Exchange", "PushedFilters", "ReadSchema"],
)
# The registered features_centroid_lof query splits at the oracle
# handoff (survivor set → parquet → SQL tail), so its own plan only shows
# the cosine tail. Audit the PRODUCER — lof_surviving_anchors — directly:
# the 1024-anchor cap must stay a TakeOrderedAndProject (per-partition
# top-N + driver merge, never a single-task global sort), and the only
# single-task stage is the LOF numpy kernel itself over ≤1024 rows.
from wikidata_wikifier_spark.operators import features as _feats
from wikidata_wikifier_spark.queries import featured_candidates, entity_index, index_rows
_f = featured_candidates(spark, sf)
_surv = _feats.lof_surviving_anchors(
    _f, emb_dim=entity_index(spark, sf).select("qnode", "embedding"),
    dim_rows=index_rows(spark, sf),
)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    _surv.explain("formatted")
keep = ["TakeOrdered", "Window", "ArrowEvalPython", "FlatMapGroupsInPandas",
        "Exchange", "Join"]
lines = [l for l in buf.getvalue().splitlines() if any(k in l for k in keep)]
out.write(
    "## lof_surviving_anchors — distributed anchor cap "
    "(no single-task sort)\n\n"
    "Producer side of features_centroid_lof (the registered query reads\n"
    "the survivor set back from the oracle-handoff parquet, so its own\n"
    "plan is just the cosine tail). The 1024-anchor cap for the O(n²)\n"
    "LOF matrix is a TakeOrderedAndProject (per-partition top-N + driver\n"
    "merge) — no Window.partitionBy(lit(1)) global sort; the only\n"
    "single-task stage is the LOF numpy kernel (FlatMapGroupsInPandas)\n"
    "over ≤1024 rows.\n\n"
    "Filtered plan lines (`" + "|".join(keep) + "`):\n\n"
    "```\n" + "\n".join(lines) + "\n```\n\n"
)

# pipeline.wikify over the datagen fixture (not a registered query):
# join/exchange/Python lines only — the corpus-scale fan-out audit
from wikidata_wikifier_spark import datagen
from wikidata_wikifier_spark.pipeline import wikify
src, _g = datagen.source_repos_df(spark, n_repos=25, n_entities=150)
idx = datagen.entity_index_df(spark, n_entities=150)
links = wikify(src, idx, k=1)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    links.explain("formatted")
keep = ["Join", "Exchange", "ArrowEvalPython", "Scan ExistingRDD",
        "FlatMapGroupsInPandas", "Window"]
lines = [l for l in buf.getvalue().splitlines() if any(k in l for k in keep)]
out.write(
    "## pipeline.wikify — the corpus-scale fan-out "
    "(join/exchange/Python lines only)\n\n"
    "The whole candidate/feature/rank chain upstream runs at vocabulary\n"
    "scale behind localCheckpoint barriers (`Scan ExistingRDD` leaves);\n"
    "the only corpus-scale operators in the final plan are the mention\n"
    "scan, the co-mention context aggregation (one file-keyed self-join +\n"
    "one map-side-combined count, both mention-scale), and ONE\n"
    "label-keyed fan-out join — broadcast here, AQE-skew-split shuffle or\n"
    "an explicit salted join (`wikify(salt=N)`) when the link table\n"
    "outgrows the threshold. Every join below is a BroadcastHashJoin of a\n"
    "vocabulary- or aggregate-scale side; ArrowEvalPython spans are the\n"
    "two declared MLP pandas-UDF sites.\n\n"
    "```\n" + "\n".join(lines) + "\n```\n\n"
)
out.close()
print("written")
spark.stop()
