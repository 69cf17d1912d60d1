"""HTML -> text extraction as a vectorized pandas UDF (the S2/H4 analog).

The reference iterates archive members and hashes their bytes in worker
processes (/root/reference/scanner/fileHasher.py:189-239,
/root/reference/scanner/hashFile.py:135-164); the web graft's equivalent
per-row step is boilerplate removal from raw HTML. Extraction must be
*byte-identical per url* across runs and partitions (BASELINE input_hint) —
pure function of the html bytes, no locale/hash-seed dependence.

Strategy (main-content heuristic, trafilatura-style):
 1. if a <main>...</main> element exists, take its inner HTML;
 2. otherwise strip <script>/<style> blocks and all tags from <body>;
then unescape HTML entities and return. Step 1 inverts fixtures.render_html
exactly (the round-trip invariant tested in test_textprep.py).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

_MAIN_RE = re.compile(rb"<main(?:\s[^>]*)?>(.*?)</main>", re.DOTALL)
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html_bytes: bytes | None) -> str:
    """Pure extraction function; the UDF maps this over Arrow batches."""
    if html_bytes is None:
        return ""
    m = _MAIN_RE.search(html_bytes)
    if m is not None:
        return _html.unescape(m.group(1).decode("utf-8", errors="replace"))
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _SCRIPT_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    return _WS_RE.sub(" ", _html.unescape(raw)).strip()


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def with_extracted_text(
    pages: DataFrame,
    html_col: str = "html",
    out: str = "text",
    mime_col: str | None = None,
) -> DataFrame:
    """Adds/overwrites the extracted-text column from raw payload bytes.

    mime_col enables the S3 content-type dispatch
    (/root/reference/pArch.py:31-53 iterHashes dispatches per member type):
    html-family payloads go through boilerplate extraction, text/* payloads
    decode as UTF-8 verbatim, anything else (binary media — the multimodal
    module's business) yields empty text. Mime strings are normalized first
    (functions/junk.fix_mime, the H7 analog), so flaky spellings dispatch
    consistently. Without mime_col every payload is treated as HTML (the
    common-crawl default)."""
    if mime_col is None:
        return pages.withColumn(out, extract_text_udf(F.col(html_col)))
    from .junk import fix_mime

    m = fix_mime(F.col(mime_col))
    return pages.withColumn(
        out,
        F.when(
            m.isin("text/html", "application/html"),
            extract_text_udf(F.col(html_col)),
        )
        .when(
            m.startswith("text/"),
            # cast, NOT F.decode: decode('UTF-8') under Spark 4 ANSI throws
            # MALFORMED_CHARACTER_CODING on the first invalid byte sequence
            # (one bad text/plain payload would abort the whole job); cast
            # uses replacement-char semantics, matching the HTML branch's
            # errors='replace' (extract_text_py)
            F.col(html_col).cast("string"),
        )
        .otherwise(F.lit("")),
    )
