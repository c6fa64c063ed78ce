"""Vectorized URL parsing (scheme / host / path / registrable domain).

Web-corpus pipelines group, filter, and rate-limit by URL components —
per-domain document caps, host-level dedup scopes, TLD mixes.  This module
parses an Arrow string column in one RE2 pass (``pc.extract_regex`` — no
per-row Python), plus a cheap registrable-domain heuristic (last two
dot-labels of the host; public-suffix lists are a lookup-table refinement
on the same column and deliberately out of scope here).

Rows that do not match the ``scheme://host[path]`` shape parse to null
components (never an error) — malformed URLs are data, not exceptions, at
web scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_urls", "registrable_domain", "canonicalize_urls"]

# scheme://host[:port]/path?query#fragment — query/fragment folded into path
# remainder are dropped (group, filter and join keys never include them here)
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]*)"
    r"(?::(?P<port>[0-9]*))?(?P<path>[^?#]*)"
)


def parse_urls(urls) -> dict[str, pa.Array]:
    """Parse a string column of URLs into ``scheme, host, port, path,
    domain`` arrays (null row / no match → null components)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    st = pc.extract_regex(urls, _URL_RE)
    out = {
        name: pc.struct_field(st, name) for name in ("scheme", "host", "port", "path")
    }
    # extract_regex returns "" for an unmatched optional group; normalize the
    # empty port to null so the column is semantically "no port"
    out["port"] = pc.if_else(
        pc.equal(pc.fill_null(out["port"], ""), ""),
        pa.scalar(None, type=pa.string()),
        out["port"],
    )
    out["domain"] = registrable_domain(out["host"])
    return out


# like _URL_RE but keeps the query (canonical URLs preserve it) and
# captures everything up to the fragment, which canonicalization strips
_CANON_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]*)"
    r"(?::(?P<port>[0-9]*))?(?P<rest>[^#]*)"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_urls(urls) -> pa.Array:
    """Canonical form of a URL column, vectorized (one RE2 pass + Arrow
    string kernels, no per-row Python):

    - scheme and host lowercased (path/query case is significant and kept),
    - fragment stripped,
    - scheme-default port stripped (``http:80``, ``https:443``; other
      ports kept),
    - empty path+query normalized to ``/`` (no slash is inserted before a
      bare query — ``http://h?q`` keeps that shape),
    - rows that don't parse as ``scheme://host…`` pass through unchanged
      (malformed URLs are data, not exceptions).

    Query parameters are preserved as-is (parameter reordering is a
    semantic judgment call left to callers).  The canonical string is the
    standard dedup/group key for crawl frontiers and URL-level dedup.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    st = pc.extract_regex(urls, _CANON_RE)
    scheme = pc.utf8_lower(pc.struct_field(st, "scheme"))
    host = pc.utf8_lower(pc.struct_field(st, "host"))
    port = pc.fill_null(pc.struct_field(st, "port"), "")
    rest = pc.struct_field(st, "rest")

    is_default = pc.or_(
        pc.equal(port, ""),
        pc.or_(
            pc.and_(
                pc.equal(scheme, "http"),
                pc.equal(port, _DEFAULT_PORTS["http"]),
            ),
            pc.and_(
                pc.equal(scheme, "https"),
                pc.equal(port, _DEFAULT_PORTS["https"]),
            ),
        ),
    )
    port_part = pc.if_else(
        is_default,
        pa.scalar("", type=pa.string()),
        pc.binary_join_element_wise(":", port, ""),
    )
    rest_norm = pc.if_else(
        pc.equal(rest, ""), pa.scalar("/", type=pa.string()), rest
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", host, port_part, rest_norm, ""
    )
    return pc.if_else(scheme.is_valid(), canon, urls)


def registrable_domain(hosts) -> pa.Array:
    """Last two dot-labels of the host (``a.b.site.example.com`` →
    ``example.com``); hosts with fewer than two labels pass through."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    m = pc.extract_regex(hosts, r"(?P<d>[^.]+\.[^.]+)$")
    d = pc.struct_field(m, "d")
    # single-label host (no dot): extract fails → null; fall back to host
    return pc.if_else(d.is_valid(), d, hosts)
