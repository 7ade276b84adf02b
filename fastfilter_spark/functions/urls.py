"""URL functions for Common-Crawl-style web-page tables.

The reference library consumes pre-hashed uint64 keys and has no URL
layer (/root/reference/README.md:25-29); these are the column
expressions a crawl pipeline needs BEFORE keys exist — canonicalize the
url, split out host/path, and derive grouping keys (host, registered
domain, TLD) whose zipf-skewed distributions are exactly what the
skew-aware aggregation (operators/skew.salted_agg) and hot-prefix
salting in the north star target.

Everything here is a pure JVM Column expression (whole-stage codegen,
no Python, DuckDB-oracle-able): at 10^12 rows url parsing is on the
scan's critical path and must not cross the Arrow boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# host = authority minus userinfo/port; stops at '/', '?', '#'
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"


def url_host(url: Column) -> Column:
    """Lower-cased host of an absolute url ('' when unparseable).

    Handles userinfo (``user@host``) and port suffixes; the host is the
    only case-insensitive part of a url, so it is folded here while the
    path keeps its case (RFC 3986 §6.2.2.1).  IPv6 bracket literals are
    not parsed specially (the inner colons truncate the capture) — at
    crawl scale they are vanishingly rare and carry no TLD/registered
    domain anyway; filter them out with ``url.contains('[')`` if needed.
    """
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_path(url: Column) -> Column:
    """Path component ('' when absent); query and fragment excluded."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments (long)."""
    p = url_path(url)
    return F.size(F.filter(F.split(p, "/"), lambda s: s != "")).cast("long")


def url_tld(url: Column) -> Column:
    """Last dot-label of the host.  Dotless hosts (``localhost``)
    return the host itself and IPv4 literals their last octet — filter
    on ``url_host(url).contains('.')`` / rlike to exclude them when
    grouping by real TLDs."""
    return F.element_at(F.split(url_host(url), r"\."), -1)


def registered_domain(url: Column) -> Column:
    """Naive registered domain: last two host labels (``a.b.c.example.org``
    -> ``example.org``).  A public-suffix-list lookup (``co.uk``) would
    be a broadcast join against the PSL table — out of scope here, and
    the naive form is the standard grouping key for per-site quotas
    when the corpus is known to use two-label registrables."""
    parts = F.split(url_host(url), r"\.")
    n = F.size(parts)
    return F.when(n >= 2, F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1))) \
        .otherwise(url_host(url))


# authority split: scheme, optional userinfo (kept verbatim — it is
# case-SENSITIVE per RFC 3986, unlike the host), host[:port]
_AUTH_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://((?:[^/?#@]*@)?)([^/?#]*)"


def url_normalize(url: Column) -> Column:
    """Canonical url for dedup/grouping keys:

    - scheme and host lower-cased; userinfo (``user:pw@``) and path
      keep their case (both case-sensitive per RFC 3986 §6.2.2.1)
    - fragment stripped (``#...`` never reaches the server)
    - default ports stripped (``:80`` for http, ``:443`` for https) —
      matched on the host:port part AFTER the userinfo split, so a
      colon inside credentials cannot confuse it, and IPv6 literals
      (``[::1]:443``) strip correctly
    - trailing ``/`` of a bare-root url stripped (``http://a.com/`` ==
      ``http://a.com``) — deeper paths are left alone, ``/a/`` and
      ``/a`` can be different resources
    - a string with no ``scheme://authority`` shape passes through
      unchanged

    Pure codegen (regexp chain), so normalization runs at scan
    throughput and Catalyst can still prune/push around it.
    """
    u = F.regexp_replace(url, r"#.*$", "")                    # fragment
    scheme = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    userinfo = F.regexp_extract(u, _AUTH_RE, 2)
    hostport = F.lower(F.regexp_extract(u, _AUTH_RE, 3))
    rest = F.regexp_replace(u, _AUTH_RE, "")
    hostport = F.when(scheme == "https",
                      F.regexp_replace(hostport, r":443$", "")) \
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", "")) \
        .otherwise(hostport)
    out = F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), userinfo, hostport, rest)) \
        .otherwise(u)
    # bare root: nothing after the authority but '/'
    return F.regexp_replace(
        out, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)/$", r"$1")
