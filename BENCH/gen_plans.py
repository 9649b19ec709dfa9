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
out.close()
print("written")
spark.stop()
