"""URL canonicalization — the normalization step of web-scale crawl dedup.

Duplicate web documents usually arrive under *variant* URLs: mixed-case
hosts, a ``www.`` prefix, an explicit default port, tracking query
parameters (``utm_*``, ``ref``, click ids), unsorted parameter order,
trailing slashes, and fragments. Canonicalizing before the URL-level
dedup groupBy collapses those variants so the crawl frontier and the
dedup key agree.

Everything here is a pure Column expression (regex extract/replace +
higher-order array functions) — JVM-side, whole-stage-codegen friendly,
no UDFs — and each rule has an exact DuckDB twin in
``queries_curation.py`` so the whole canonicalizer is value-hash
oracle-checked.

Rules (conservative, lossless for distinct resources):
* lowercase scheme and host; strip a leading ``www.``;
* strip the scheme's default port (``:443`` for https, ``:80`` for http);
* strip the fragment;
* drop tracking parameters (``utm_*``, ``ref``, ``fbclid``, ``gclid``),
  sort the remaining query parameters bytewise, re-join with ``&``;
* strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parameters that identify a click/campaign, not a resource.
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[^:/?#]+://([^/?#]*)"
_PATH_RE = r"^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, ``www.``-stripped, default port removed."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_RE, 1)), r"^www\.", ""
    )
    scheme = url_scheme(url)
    return (
        F.when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .otherwise(host)
    )


def url_path(url: Column) -> Column:
    """Path with trailing slashes stripped (root collapses to '')."""
    return F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking params dropped and the rest sorted.

    The fragment is stripped BEFORE extracting the query (mirroring the
    ``uf`` step in the DuckDB twin): a '?' whose first occurrence is
    inside the fragment (``https://e.com/p#sec?x=1``) is fragment text,
    not a query string (ADVICE r11 #1).
    """
    defragged = F.regexp_replace(url, r"#.*$", "")
    params = F.filter(
        F.split(F.regexp_extract(defragged, _QUERY_RE, 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column) -> Column:
    """Full canonical form: scheme://host/path[?sorted-params]."""
    qs = url_query_canonical(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of an (already canonical, port-free) host —
    the eTLD+1 approximation for single-label public suffixes. A
    production crawler swaps in the public-suffix list; the rollup shape
    (groupBy domain) is unchanged."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
