"""Incremental ingest: signature only what changed, prune what disappeared.

Re-realizes the reference's incremental re-scan path set-oriented:
  - S4 skip-unchanged: a container is re-hashed only if its whole-file MD5
    changed (/root/reference/scanner/fileHasher.py:309-356). Here: anti-join
    the incoming batch against the current docs snapshot on (url, text_hash);
    only genuinely new/changed urls pay the signature UDFs.
  - S5 orphan cleanup: rows whose source file vanished are deleted
    (/root/reference/scanner/fileHasher.py:78-112). Here: optional prune of
    docs whose url is absent from the incoming *full* listing.

At 10^12 docs this is the difference between re-hashing the world daily and
touching only the crawl delta; the anti-join shuffles only (url, text_hash),
never text/html.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, DedupConfig
from ..engine.pipeline import compute_docs
from .catalog import ParquetCatalog

DOCS_TABLE = "docs"


def changed_pages(
    pages: DataFrame, existing_docs: DataFrame | None, extract: bool = True
) -> DataFrame:
    """Rows in `pages` whose (url, content-hash) is not already in docs."""
    if existing_docs is None:
        return pages
    from ..operators.exact import with_text_hash
    from ..functions.textprep import with_extracted_text

    keyed = with_text_hash(with_extracted_text(pages) if extract else pages)
    delta_keys = keyed.select("url", "text_hash").join(
        existing_docs.select("url", "text_hash"), ["url", "text_hash"], "left_anti"
    )
    return pages.join(delta_keys.select("url").distinct(), "url", "left_semi")


def incremental_ingest(
    spark: SparkSession,
    catalog: ParquetCatalog,
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    extract: bool = True,
    full_listing: bool = False,
) -> DataFrame:
    """Merge the batch's new/changed docs into the docs table; return it.

    full_listing=True marks `pages` as a complete source listing, enabling
    orphan cleanup (urls in docs but not in pages are dropped).
    """
    existing = catalog.read(DOCS_TABLE) if catalog.exists(DOCS_TABLE) else None
    delta = changed_pages(pages, existing, extract=extract)
    new_docs = compute_docs(delta, cfg, extract=extract)
    catalog.merge(new_docs, DOCS_TABLE, key_cols=["url"])
    if full_listing and existing is not None:
        live = pages.select("url").distinct()
        current = catalog.read(DOCS_TABLE)
        catalog.overwrite(
            current.join(live, "url", "left_semi"), DOCS_TABLE
        )
    return catalog.read(DOCS_TABLE)
