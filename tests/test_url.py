"""URL canonicalization expressions (functions/url.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.functions.url import (
    normalize_url,
    registered_domain,
    url_host,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.n for r in df.select(normalize_url(F.col("url")).alias("n")).collect()
    ]


def test_normalize_core_rules(spark):
    got = _norm(
        spark,
        [
            "HTTP://WWW.Site.ORG:80/A/B/?utm_source=x&b=2&a=1#frag",
            "https://site.org/a/b",
            "https://site.org:8443/x",  # non-default port NOT stripped... (kept in host)
            "https://site.org",  # empty path -> /
            "https://site.org/?fbclid=abc&gclid=def&ref=tw",
        ],
    )
    assert got[0] == "http://site.org/A/B?a=1&b=2"
    assert got[1] == "https://site.org/a/b"
    assert got[2] == "https://site.org:8443/x"
    assert got[3] == "https://site.org/"
    assert got[4] == "https://site.org/"


def test_param_sort_is_identity_not_order(spark):
    a, b = _norm(
        spark,
        ["https://s.org/p?b=2&a=1", "https://s.org/p/?a=1&b=2&utm_medium=m"],
    )
    assert a == b == "https://s.org/p?a=1&b=2"


def test_registered_domain_rules(spark):
    df = spark.createDataFrame(
        [("a.b.site.org",), ("site.org",), ("localhost",)], "h string"
    )
    got = [r.d for r in df.select(registered_domain(F.col("h")).alias("d")).collect()]
    assert got == ["site.org", "site.org", "localhost"]


def test_host_strips_www_and_default_ports_only(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.org:443/x",),
            ("http://example.org:80/x",),
            ("http://wwwx.example.org/x",),  # not a www. prefix
        ],
        "url string",
    )
    got = [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert got == ["example.org", "example.org", "wwwx.example.org"]
