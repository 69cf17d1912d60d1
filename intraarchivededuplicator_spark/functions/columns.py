"""JVM-side Column helpers: Hamming distance, band extraction, n-grams, tokens.

Everything here stays inside whole-stage codegen (no Python in the hot path).
``hamming`` is the distributed analog of the reference's popcount kernel
(/root/reference/deduplicator/bktree.hpp:43-60): ``bit_count`` compiles to
``java.lang.Long.bitCount`` on the two's-complement pattern, so signed int64
semantics match the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hamming(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two signed-int64 bit patterns (0..64)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def band_key(sig: Column | str, bit_offset: int, band_width: int) -> Column:
    """Extract the band starting at ``bit_offset`` (LSB-first) of width
    ``band_width`` bits.

    Logical shift so the sign bit never leaks into other bands. This is the
    LSH layout that replaces the BK-tree's metric pruning
    (/root/reference/deduplicator/bktree.hpp:224-258): by pigeonhole, two
    signatures within Hamming distance r share at least one of B bands
    whenever r < B.
    """
    sig = F.col(sig) if isinstance(sig, str) else sig
    if band_width == 64:
        return sig  # single full-width band: the signature is the key
    mask = F.lit((1 << band_width) - 1).cast("long")
    return F.shiftrightunsigned(sig, bit_offset).bitwiseAND(mask)


def band_widths(n_bands: int) -> list[int]:
    """Partition 64 bits into ``n_bands`` contiguous bands, widest first.

    For n_bands dividing 64 all bands are equal (the historical layout);
    otherwise the first ``64 % n_bands`` bands carry one extra bit
    (e.g. 5 -> [13, 13, 13, 13, 12]). Fewer, wider bands are the scale lever:
    full recall at Hamming radius r needs only r+1 bands (pigeonhole), and a
    13-bit band key is 32x more selective than an 8-bit one, so the
    band-equi-join's candidate volume drops by the same factor.
    """
    if not 1 <= n_bands <= 64:
        raise ValueError(f"n_bands must be in 1..64, got {n_bands}")
    base, extra = divmod(64, n_bands)
    return [base + 1] * extra + [base] * (n_bands - extra)


def band_keys_array(sig: Column | str, n_bands: int) -> Column:
    """Array of all band keys for a signature (LSB-first, contiguous)."""
    sig = F.col(sig) if isinstance(sig, str) else sig
    keys, offset = [], 0
    for w in band_widths(n_bands):
        keys.append(band_key(sig, offset, w))
        offset += w
    return F.array(*keys)


def md5_prefix32(col: Column) -> Column:
    """Unsigned 32-bit value from the first 8 md5 hex chars — the shared
    deterministic-hash primitive (hashing.shingle_hash32's column twin;
    DuckDB twin oracle.sql_shingle_hash32). Non-negative < 2^32, so both
    ordering and modulo agree across engines without sign fixup."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_prefix_mod(col: Column, mod: int) -> Column:
    """Non-negative bucket in [0, mod) from md5_prefix32 — the J11
    deterministic-hash discipline shared by shard assignment
    (q_shard_balance), train/valid/test splitting (_split_col) and DSIR
    feature bucketing (dsir_bucket). One definition so the prefix width
    can never drift between surfaces; the DuckDB twin is
    oracle.sql_md5_prefix_mod."""
    return md5_prefix32(col) % mod


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization matching hashing.tokenize: split \\s+, drop ''."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def char_ngrams(text: Column | str, n: int) -> Column:
    """All character n-grams of a string (JVM-side, no UDF); [] if too short."""
    text = F.col(text) if isinstance(text, str) else text
    m = F.length(text) - F.lit(n - 1)
    return F.when(
        m >= 1,
        F.transform(F.sequence(F.lit(1), m), lambda i: F.substring(text, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def token_shingles(toks: Column | str, k: int) -> Column:
    """k-token shingles joined by ' ' from a token array; [] if < k tokens."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    m = F.size(toks) - F.lit(k - 1)
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def canonical_pair(id_a: Column | str, id_b: Column | str) -> list[Column]:
    """(least, greatest) pair canonicalization.

    Mirrors the reference's CHECK (item_1_link < item_2_link) edge
    convention (/root/reference/dbApi.py:94-96, :417-425).
    """
    id_a = F.col(id_a) if isinstance(id_a, str) else id_a
    id_b = F.col(id_b) if isinstance(id_b, str) else id_b
    return [
        F.least(id_a, id_b).alias("id_lo"),
        F.greatest(id_a, id_b).alias("id_hi"),
    ]
