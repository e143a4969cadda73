"""Lineage counters ride on snapshot commits and in the lineage table
(≈ the reference's prov/ crawl provenance, docs/hdt.md:13)."""

from __future__ import annotations

from scheduler_spark.catalog import Catalog
from scheduler_spark.pipeline import LINEAGE_TABLE, TRIPLES_TABLE, run_pipeline
from scheduler_spark.synth import alias_df, synth_files


def test_snapshot_properties_carry_counters(spark, tmp_path):
    catalog = Catalog(root=str(tmp_path), spark=spark)
    res = run_pipeline(spark, synth_files(spark, 150), alias_df(spark), catalog, run_id="lin1")

    snaps = catalog.snapshots(TRIPLES_TABLE)
    assert len(snaps) == 1
    props = snaps[-1]["properties"]
    assert props["run_id"] == "lin1"
    assert props["total_rows"] == res.n_triples
    assert props["total_rows"] > 0
    assert props["top_partitions"], "per-partition detail missing"
    top = props["top_partitions"][0]
    assert top["partition"] == "mega/monorepo"  # skewed fixture dominates

    lineage = catalog.read(LINEAGE_TABLE)
    row = lineage.filter("src_partition = 'mega/monorepo'").first()
    assert row.run_id == "lin1" and row.stage == "materialize"
    assert row.rows == top["rows"]
    # counters sum to the committed total
    assert lineage.groupBy().sum("rows").first()[0] == res.n_triples


def test_lineage_appends_per_run(spark, tmp_path):
    catalog = Catalog(root=str(tmp_path), spark=spark)
    files = synth_files(spark, 100)
    run_pipeline(spark, files, alias_df(spark), catalog, run_id="a")
    # change everything → second run appends its own lineage rows
    changed = files.withColumn("content", files.content.substr(1, 10))
    run_pipeline(spark, changed, alias_df(spark), catalog, run_id="b")
    lineage = catalog.read(LINEAGE_TABLE)
    assert set(r.run_id for r in lineage.select("run_id").distinct().collect()) == {"a", "b"}
