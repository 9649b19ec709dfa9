"""spark-submit job entry: end-to-end through job.main() — writes
partitioned triples + manifest, resumable."""

from __future__ import annotations

import json
import sys

from wikidata_wikifier_spark import datagen
from wikidata_wikifier_spark.job import main


def test_job_main(spark, tmp_path, capsys, monkeypatch):
    src, _ = datagen.source_repos_df(spark, n_repos=8, n_entities=60)
    idx = datagen.entity_index_df(spark, n_entities=60)
    edges = datagen.alias_edges_df(spark, n_entities=60)
    src_p, idx_p, edg_p = (str(tmp_path / n) for n in ("src", "idx", "edg"))
    src.write.parquet(src_p)
    idx.write.parquet(idx_p)
    edges.write.parquet(edg_p)
    out = str(tmp_path / "out")

    monkeypatch.setattr(
        sys, "argv",
        ["job", "--source", src_p, "--index", idx_p, "--edges", edg_p,
         "--out", out, "--resume"],
    )
    main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_triples"] > 0
    got = spark.read.parquet(out + "/triples")
    assert got.count() == stats["n_triples"]
    assert spark.read.parquet(out + "/_manifest").count() == stats["written_parts"]

    # re-run: everything already complete → all partitions skipped
    main()
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["n_triples"] == 0
    assert stats2["skipped_parts"] == stats["written_parts"]


def test_iceberg_branch_fails_actionably_without_catalog(spark, tmp_path):
    """TRIPLE_TABLE_FORMAT=iceberg without a configured Iceberg catalog
    must fail with an actionable error BEFORE any write — never silently
    degrade to a different layout (ADVICE r04 / VERDICT r04 #7; the
    sandbox has no Iceberg runtime jar, TESTDATA.md)."""
    import pytest

    from wikidata_wikifier_spark.plans.checkpoint import write_partitioned

    triples = spark.createDataFrame(
        [("s", "p", "o", 0)], "subj string, pred string, obj string, part int"
    )
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_partitioned(triples, str(tmp_path / "ice"), fmt="iceberg")
    with pytest.raises(ValueError, match="unknown triple table format"):
        write_partitioned(triples, str(tmp_path / "x"), fmt="orc2")
