"""Line-level web-page structure: plant, dedup keys, and PII scrubbing.

The testdata `documents.text` is a flat single-spaced token stream, so —
like the url_* family's `_planted_urls` (plans/queries.py) — the line_*
queries synthesize page structure BY CONSTRUCTION, arithmetically, so the
DuckDB oracle can build the identical lines and the differential pins the
whole line pipeline, not a fixture file:

  pos 0  per-domain nav header     df ~ N/LINE_DOMAINS  -> boilerplate
  pos 1  first half of the text    df <= exact-dup group size (1-2)
  pos 2  second half of the text   df <= exact-dup group size (1-2)
  pos 3  promo line, only when doc_id % 10 in {3, 7}: docs x3 and x7 of
         each decade share ONE line -> df exactly 2 (duplicate, but below
         the boilerplate threshold)
  pos 4  per-domain copyright footer                    -> boilerplate

This is the CCNet / RefinedWeb line-dedup shape (per-line hash, corpus
doc-frequency, strip high-df boilerplate, keep order on reconstruction);
the reference engine has no line stage — this is beyond-reference web-
pipeline surface like text_quality and contamination_overlap.

Scale notes (10^12 docs): everything here is map-only column algebra until
the df aggregation, which is ONE partial-aggregated exchange on a 32-hex
md5 line key — the same shuffle shape exact dedup already pays
(operators/exact.py). The join back to occurrences is a shuffle join on
that key (the boilerplate set is the high-df tail but its distinct-key
count is unbounded at corpus scale, so no broadcast is assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# header/footer are shared per synthetic domain: df ~ N/LINE_DOMAINS
LINE_DOMAINS = 40
# distinct-doc frequency at/above which a line is boilerplate. With 40
# domains this separates at every SF >= 0.01 (df 12.5 at sf0.01, 125 at
# sf0.1) while the planted promo pair (df=2) and exact-dup body halves
# (df<=2) stay below it.
BOILERPLATE_DF = 8

# PII patterns — RE2-safe subset (no backreferences, no lookaround) so the
# DuckDB oracle runs the SAME pattern strings; Spark (Java regex) and
# DuckDB (RE2) agree on character classes, {m,} repetition and \b.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def planted_lines(d: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, pos, line, line_hash), empties dropped.

    Arithmetic-only (see module docstring); the DuckDB twin is
    plans/oracle._line_plant. Map-only: split + slice + posexplode, no
    shuffle. md5(line) is the dedup key — 16 bytes on the wire instead of
    the line, and the same hash DuckDB computes.
    """
    dom = (F.col("doc_id") % LINE_DOMAINS).cast("string")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    h = F.floor((n + F.lit(1)) / F.lit(2)).cast("int")
    header = F.concat(F.lit("nav home about contact domain-"), dom)
    footer = F.concat(
        F.lit("copyright site-"), dom, F.lit(" all rights reserved")
    )
    body1 = F.array_join(F.slice(toks, F.lit(1), h), " ")
    body2 = F.when(
        n > h, F.array_join(F.slice(toks, h + F.lit(1), n - h), " ")
    ).otherwise(F.lit(""))
    promo = F.when(
        (F.col("doc_id") % 10).isin(3, 7),
        F.concat(
            F.lit("promo code save "),
            (F.col("doc_id") - F.col("doc_id") % 10 + 3).cast("string"),
        ),
    ).otherwise(F.lit(""))
    arr = F.array(header, body1, body2, promo, footer)
    out = d.select("doc_id", F.posexplode(arr).alias("pos", "line"))
    return out.filter(F.col("line") != "").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "line",
        F.md5(F.col("line")).alias("line_hash"),
    )


def line_doc_frequency(occ: DataFrame) -> DataFrame:
    """(line_hash, df_docs): distinct-doc count per line.

    Two partial-aggregated exchanges ((hash, doc) dedup then hash count) —
    Spark plans countDistinct exactly this way; no row ever carries the
    line text through the shuffle.
    """
    return occ.groupBy("line_hash").agg(
        F.countDistinct("doc_id").alias("df_docs")
    )


def planted_pii(d: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, raw) with PII appended by construction.

    doc_id % 4: 0 -> email + phone + IP stacked; 1 -> email only;
    2 -> phone only; 3 -> clean (all three counts must be 0). The DuckDB
    twin builds byte-identical strings (plans/oracle.sql_pii_scrub).
    """
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@mail.example.com")
    )
    phone = F.concat(
        F.lit(" call +1-555-"),
        F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" host 10."),
        (did % 250).cast("string"),
        F.lit(".0."),
        (did % 200).cast("string"),
    )
    m = did % 4
    tail = (
        F.when(m == 0, F.concat(email, phone, ip))
        .when(m == 1, email)
        .when(m == 2, phone)
        .otherwise(F.lit(""))
    )
    return d.select("doc_id", F.concat(F.col("text"), tail).alias("raw"))


def pii_scrub_col(col):
    """Redact email -> phone -> IP, in that order (the replacements carry
    no digits or '@', so later passes cannot re-match inside a token an
    earlier pass emitted). Spark regexp_replace is replace-ALL by default;
    the oracle passes RE2's explicit 'g' flag."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IP_RE, "<IP>")


# ASCII punctuation by code ranges (33-47, 58-64, 91-96, 123-126): quote-free
# in source so it embeds in SQL literals, identical in Java regex and RE2,
# and — unlike [^a-z0-9 ] — it PRESERVES non-ASCII letters, so CJK docs keep
# distinct dedup keys instead of all normalizing to the empty string.
DEDUP_PUNCT_RE = r"[!-/:-@\[-`{-~]+"


def norm_dedup_key(col):
    """CCNet-style exact-dedup key normalization: lowercase, strip
    punctuation to spaces, mask digit runs to '0', collapse whitespace,
    trim. Two spellings of the same content ('Foo, bar 42!' / 'foo bar 77')
    hash identically AFTER this and differently before — the normalization
    IS the dedup recall knob. RE2-safe ASCII classes so the DuckDB oracle
    runs the same pattern strings (plans/oracle.sql_dedup_key_normalize)."""
    out = F.lower(col)
    out = F.regexp_replace(out, DEDUP_PUNCT_RE, " ")
    out = F.regexp_replace(out, r"[0-9]+", "0")
    out = F.regexp_replace(out, r" +", " ")
    return F.trim(out)


def pii_count(col, pattern: str):
    """Occurrence count of `pattern` in `col` (whole-match, BIGINT)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
        "long"
    )
