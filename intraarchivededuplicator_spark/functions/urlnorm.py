"""URL canonicalization — the zeroth dedup key of a web-crawl pipeline.

Crawls see the same page under many spellings (scheme, host case, default
port, trailing slash, fragments, tracking params); grouping by a canonical
form removes the cheapest duplicate class before any content hashing. The
reference dedups only by content/phash, so this is beyond-reference surface,
but it is the first thing a Common-Crawl-style ingest does with the `url`
column the input hint mandates.

Scope (documented, deterministic, cross-engine-reproducible — every step is
a simple RE2-safe regex so the DuckDB oracle can re-implement it
independently):
  1. strip the fragment (#...)
  2. scheme lowercased (RFC 3986 §3.1), https -> http
  3. drop utm_* tracking params and repair the separators they leave behind
     ('?&' -> '?', trailing '?'/'&' dropped). A utm param followed by a
     non-utm param in first position ('?utm_a=1&b=2') leaves '&b=2' --
     repaired by promoting the first '&' to '?' when no '?' remains.
  4. lowercase the authority (scheme+host only — path case is significant)
     and drop an explicit default port (:80)
  5. strip a single trailing slash off a non-empty path

All pure JVM column algebra (regexp_replace / regexp_extract / lower):
map-only, codegen-eligible, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def canonical_url(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                      # 1. fragment
    # 2. scheme: case-insensitive (RFC 3986 §3.1), https -> http
    u = F.regexp_replace(u, r"(?i)^https?://", "http://")
    u = F.regexp_replace(u, r"[?&]utm_[A-Za-z0-9_]+=[^&#]*", "")  # 3. utm
    u = F.regexp_replace(u, r"\?&", "?")
    # first '&' with no '?' before it (leading param was utm): promote to '?'
    # (anchored pattern -> exactly one replacement)
    u = F.regexp_replace(u, r"^([^?&]*)&", "$1?")
    u = F.regexp_replace(u, r"[?&]$", "")
    host = F.lower(F.regexp_extract(u, r"^http://([^/?#]*)", 1))  # 4. authority
    host = F.regexp_replace(host, r":80$", "")
    rest = F.regexp_replace(u, r"^http://[^/?#]*", "")
    u = F.concat(F.lit("http://"), host, rest)
    u = F.regexp_replace(u, r"/$", "")                        # 5. trailing /
    return u
