"""Source catalog — the sitemap-index analog.

The reference's catalog refresh parses a sitemap-index XML (namespaced
`geoconnex:sitemap_id` etc.), validates/trims ids, drops duplicates
with a warning, registers new partitions and prunes stale ones
(/root/reference/userCode/assetGroups/config.py:97-159,
/root/reference/userCode/lib/dagster.py:19-30).

Spark recast: the catalog is data, not orchestrator state — a SOURCES
DataFrame.  XML parsing happens driver-side (catalogs are small by
construction: ~200 sources); everything downstream is DataFrame ops so
the dedupe/prune semantics are testable and the partition list is just
`files.select(repo).distinct()` in the KG pipeline.
"""

from __future__ import annotations

import logging
import xml.etree.ElementTree as ET
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import SOURCES, enforce

log = logging.getLogger(__name__)

# namespace map mirrors config.py:97-103
NS = {
    "sm": "http://www.sitemaps.org/schemas/sitemap/0.9",
    "geoconnex": "https://geoconnex.us",
}


class SitemapParseError(ValueError):
    pass


def _text(elem: ET.Element | None) -> str | None:
    if elem is None or elem.text is None:
        return None
    return elem.text.strip()


def parse_sitemap_index(xml_text: str) -> list[dict]:
    """XML → list of source dicts.

    Contract pinned by the reference's tests (config_test.py:136-167):
    - empty/missing sitemap_id raises (config.py:126-131)
    - duplicate ids keep-first with a warning (config.py:133-141)
    """
    root = ET.fromstring(xml_text)
    seen: set[str] = set()
    out: list[dict] = []
    for sm in root.findall("sm:sitemap", NS):
        sid = _text(sm.find("geoconnex:sitemap_id", NS))
        if not sid:
            raise SitemapParseError("sitemap entry with empty/missing sitemap_id")
        if sid in seen:
            log.warning("duplicate sitemap_id %r — keeping first", sid)
            continue
        seen.add(sid)
        lastmod = _text(sm.find("sm:lastmod", NS))
        conc = _text(sm.find("geoconnex:max_request_concurrency", NS))
        mains = _text(sm.find("geoconnex:add_associated_mainstems", NS))
        out.append(
            {
                "sitemap_id": sid,
                "loc": _text(sm.find("sm:loc", NS)),
                "lastmod": datetime.fromisoformat(lastmod) if lastmod else None,
                "max_request_concurrency": int(conc) if conc else None,
                "add_associated_mainstems": (
                    mains.lower() == "true" if mains is not None else None
                ),
                "contact_email": _text(sm.find("geoconnex:contact_email", NS)),
                "dataset_description": _text(sm.find("geoconnex:dataset_description", NS)),
                "dataset_documentation_link": _text(
                    sm.find("geoconnex:dataset_documentation_link", NS)
                ),
            }
        )
    return out


def sources_df(spark: SparkSession, xml_text: str) -> DataFrame:
    rows = parse_sitemap_index(xml_text)
    return enforce(spark.createDataFrame(rows, schema=SOURCES), SOURCES)


def source_widths(sources: DataFrame) -> DataFrame:
    """Per-source admission-control dimension: (repo, max_concurrency).

    The reference throttles hostile sources per-source via
    `geoconnex:max_request_concurrency` (testdata/sitemap.xml:12) and
    pool limits (dagster.yaml:8-16).  In the Spark recast the knob is
    the per-source salt fan-out of the extraction repartition
    (pipeline.salted_by_source): a source declaring concurrency c never
    spreads over more than c task-group keys.  NULL = engine default.
    """
    return sources.select(
        F.col("sitemap_id").alias("repo"),
        F.col("max_request_concurrency").cast("int").alias("max_concurrency"),
    ).filter(F.col("max_concurrency").isNotNull())


def alias_enrichment_optouts(sources: DataFrame) -> DataFrame:
    """Sources that declared add_associated_mainstems=false: (repo,).

    The reference attaches mainstem metadata to a source's release
    graph only when enrichment applies
    (/root/reference/userCode/lib/containers.py:152-157, consumed at
    release_graph_generator.py:41-77; flag declared per source,
    testdata/sitemap.xml:13).  In the Spark recast the alias-link join
    (mainstem-enrichment analog) is skipped for opted-out sources:
    their mentions never enter the join, so they emit no `links_to`
    triples.  Absent/NULL means enriched — only an explicit false
    opts out.
    """
    return sources.filter(F.col("add_associated_mainstems") == False).select(  # noqa: E712
        F.col("sitemap_id").alias("repo")
    )


def refresh_partitions(
    current: DataFrame, existing_keys: DataFrame, key: str = "sitemap_id"
) -> tuple[DataFrame, DataFrame]:
    """(to_add, to_delete) — the dynamic-partition refresh.

    to_add    = current ∖ existing   (new sources to register)
    to_delete = existing ∖ current   (stale partitions to prune,
                ≈ filter_partitions, lib/dagster.py:19-30)
    """
    cur = current.select(F.col(key).alias("k")).distinct()
    old = existing_keys.select(F.col(existing_keys.columns[0]).alias("k")).distinct()
    to_add = cur.join(old, "k", "left_anti").select(F.col("k").alias(key))
    to_delete = old.join(cur, "k", "left_anti").select(F.col("k").alias(key))
    return to_add, to_delete
