"""PySpark-native near-duplicate detection + clustering engine.

From-scratch re-realization of fake-name/IntraArchiveDeduplicator's
capabilities (exact + fuzzy duplicate detection, Hamming-radius search,
similarity clustering) as idiomatic Spark DataFrame dataflows over
Common-Crawl-style web-page tables. See SURVEY.md for the capability map.
"""

__version__ = "0.1.0"
