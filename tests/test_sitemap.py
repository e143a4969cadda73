"""Sitemap-index catalog semantics (≈ config_test.py:136-167 and
lib/dagster partition lifecycle, defs_test.py:133-185)."""

from __future__ import annotations

import pytest

from scheduler_spark.sources.sitemap import (
    SitemapParseError,
    parse_sitemap_index,
    refresh_partitions,
    sources_df,
)

XML = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
              xmlns:geoconnex="https://geoconnex.us">
  <sitemap>
    <geoconnex:sitemap_id> ref:dams </geoconnex:sitemap_id>
    <loc>https://example.org/ref/dams.xml</loc>
    <lastmod>2026-05-04T21:16:10</lastmod>
    <geoconnex:max_request_concurrency>2</geoconnex:max_request_concurrency>
    <geoconnex:add_associated_mainstems>true</geoconnex:add_associated_mainstems>
  </sitemap>
  <sitemap>
    <geoconnex:sitemap_id>ref:mainstems</geoconnex:sitemap_id>
    <loc>https://example.org/ref/mainstems.xml</loc>
  </sitemap>
  <sitemap>
    <geoconnex:sitemap_id>ref:dams</geoconnex:sitemap_id>
    <loc>https://example.org/dup.xml</loc>
  </sitemap>
</sitemapindex>
"""


def test_parse_trims_and_dedupes_keep_first():
    rows = parse_sitemap_index(XML)
    assert [r["sitemap_id"] for r in rows] == ["ref:dams", "ref:mainstems"]
    assert rows[0]["loc"] == "https://example.org/ref/dams.xml"  # first wins
    assert rows[0]["max_request_concurrency"] == 2
    assert rows[0]["add_associated_mainstems"] is True
    assert rows[1]["max_request_concurrency"] is None


def test_empty_id_raises():
    bad = XML.replace(" ref:dams ", "  ")
    with pytest.raises(SitemapParseError):
        parse_sitemap_index(bad)


def test_sources_df_schema(spark):
    df = sources_df(spark, XML)
    assert df.count() == 2
    assert df.schema["lastmod"].dataType.simpleString() == "timestamp"


def test_refresh_partitions_add_and_prune(spark):
    current = spark.createDataFrame(
        [("ref:dams",), ("ref:mainstems",)], "sitemap_id string"
    )
    existing = spark.createDataFrame(
        [("ref:dams",), ("ref:stale",)], "sitemap_id string"
    )
    to_add, to_delete = refresh_partitions(current, existing)
    assert [r.sitemap_id for r in to_add.collect()] == ["ref:mainstems"]
    assert [r.sitemap_id for r in to_delete.collect()] == ["ref:stale"]


def test_alias_enrichment_optout_suppresses_links_to(spark, tmp_path):
    """A source with add_associated_mainstems=false emits NO links_to
    triples (the mainstem-enrichment analog is skipped for it), while
    its defines/in_lang triples and every other source's links remain —
    reference gating: lib/containers.py:152-157 consumed per-partition
    at release_graph_generator.py:41-77."""
    from pyspark.sql import functions as F

    from scheduler_spark.catalog import Catalog
    from scheduler_spark.pipeline import TRIPLES_TABLE, run_pipeline
    from scheduler_spark.sources.sitemap import alias_enrichment_optouts
    from scheduler_spark.synth import alias_df, synth_files

    files = synth_files(spark, n_files=120)
    victim = files.select("repo").first().repo
    sources = spark.createDataFrame(
        [(victim, False), ("org/other", True), ("org/nullflag", None)],
        "sitemap_id string, add_associated_mainstems boolean",
    )
    optouts = alias_enrichment_optouts(sources)
    assert [r.repo for r in optouts.collect()] == [victim]  # NULL ≠ opt-out

    catalog = Catalog(root=str(tmp_path), spark=spark)
    run_pipeline(
        spark, files, alias_df(spark), catalog, run_id="m1", alias_optouts=optouts
    )
    t = catalog.read(TRIPLES_TABLE)
    victim_links = t.filter(
        (F.col("src_partition") == victim) & (F.col("pred") == "links_to")
    ).count()
    other_links = t.filter(
        (F.col("src_partition") != victim) & (F.col("pred") == "links_to")
    ).count()
    victim_rest = t.filter(
        (F.col("src_partition") == victim) & (F.col("pred") != "links_to")
    ).count()
    assert victim_links == 0 and other_links > 0 and victim_rest > 0
