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
