"""Junk-page filtering (P6) and mime normalization (H7) — webtext analogs.

The reference skips archive members that are known noise before they can
pollute matching: Thumbs.db + CDFV2 mimes, ad-removal notes, __MACOSX
resource forks (/root/reference/deduplicator/ProcessArchive.py:228-262), and
unifies flaky libmagic mime spellings so the skip rules fire consistently
(/root/reference/pArch.py:6-16).

The web-corpus equivalents: infrastructure paths that are never content
(robots.txt, favicon.ico, sitemaps), server error pages ("404 Not Found"
boilerplate that would otherwise form a giant byte-exact cluster), and blank
extractions. All rules are JVM-side Column predicates — they fold into the
scan and cost nothing extra at 100TB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# never-content URL paths: the Thumbs.db / __MACOSX analog
_JUNK_PATH_RE = r"(?i)/(robots\.txt|favicon\.ico|sitemap[^/]*\.xml)$|\.(css|js|ico)$"

# short error-page boilerplate: the deleted.txt ad-note analog. Only fires on
# SHORT pages (token gate below) so an article *quoting* "404" is untouched.
_ERROR_TEXT_RE = (
    r"(?i)\b(404|403|410|500|503)\b.{0,40}\b(not found|forbidden|gone|"
    r"internal server error|service unavailable)\b"
    r"|page (could )?not( be)? found|access denied|this page isn.t available"
)

ERROR_PAGE_MAX_TOKENS = 50


def fix_mime(mime: Column | str) -> Column:
    """H7 mime fixup (/root/reference/pArch.py:6-16): lowercase, strip
    parameters (`; charset=...`), and unify aliases that mean the same
    dispatch decision — exactly the CDFV2-corrupt -> CDFV2 move."""
    m = F.col(mime) if isinstance(mime, str) else mime
    m = F.lower(F.trim(F.regexp_replace(m, ";.*$", "")))
    return (
        F.when(m == "application/xhtml+xml", F.lit("text/html"))
        .when(m == "text/xhtml", F.lit("text/html"))
        .when(m == "application/cdfv2-corrupt", F.lit("application/cdfv2"))
        .otherwise(m)
    )


def is_junk_page(
    url: Column | str, text: Column | str, n_tokens: Column | str
) -> Column:
    """P6 junk gate: True for pages that must not enter the pair legs.

    blank extraction OR infrastructure path OR short error-page boilerplate
    (/root/reference/deduplicator/ProcessArchive.py:228-262 analog)."""
    u = F.col(url) if isinstance(url, str) else url
    t = F.col(text) if isinstance(text, str) else text
    n = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    blank = n <= 0
    junk_path = u.rlike(_JUNK_PATH_RE)
    error_page = (n <= ERROR_PAGE_MAX_TOKENS) & t.rlike(_ERROR_TEXT_RE)
    return blank | junk_path | error_page
