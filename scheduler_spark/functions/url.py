"""URL canonicalization — pure column expressions (no UDFs).

Web-corpus prep keys dedup and per-site policy on a CANONICAL url: the
reference's crawler treats sitemap URLs as identity
(/root/reference/userCode/lib/classes.py source urls), and at corpus
scale the same page arrives as `HTTP://WWW.Site.org:80/a/?utm_source=x`
and `http://site.org/a` — distinct strings, one document.  Every rule
here is a JVM-side regexp/array expression so canonicalization rides
inside WholeStageCodegen on the scan, and each rule is mirrorable in
ANSI SQL for the DuckDB oracle:

1. fragment dropped (`#...` never reaches the server);
2. scheme + host lowercased; leading `www.` and default ports
   (`:80`, `:443`) stripped;
3. path: trailing slashes collapsed, empty path → `/`;
4. query: tracking params (`utm_*`, `fbclid`, `gclid`, `ref`)
   removed, the rest SORTED (param order is not page identity);
5. reassembled as scheme://host path [?query].

`registered_domain` is the naive last-two-labels rule, NOT the Public
Suffix List (no data files in-sandbox); good enough for blocklist
joins on synthetic corpora and clearly documented as such.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host with `www.` prefix and default ports stripped."""
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    noport = F.regexp_replace(hostport, r":(80|443)$", "")
    return F.regexp_replace(noport, r"^www\.", "")


def url_path(url: Column) -> Column:
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    p = F.regexp_replace(p, r"/+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_canonical(url: Column) -> Column:
    """Tracking params dropped, survivors sorted and re-joined."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(parts), "&")


def normalize_url(url: Column) -> Column:
    q = url_query_canonical(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def registered_domain(host: Column) -> Column:
    """Last two dot-labels (`a.b.site.org` → `site.org`); single-label
    hosts pass through unchanged."""
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)
