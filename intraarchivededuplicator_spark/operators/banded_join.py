"""Banded Hamming radius join — the distributed replacement for the BK-tree.

The reference answers "all signatures within Hamming distance r of X" with an
in-memory metric tree (search: /root/reference/deduplicator/bktree.hpp:224-258)
or a Postgres SP-GiST index (/root/reference/dbPhashApi.py:175-192). Neither
survives 10^12 rows. Here the index *is* the shuffle layout:

    sig -> B bands of 64/B bits -> explode -> hash-partition on (band_id,
    band_key) -> equi-join within band -> exact bit_count(xor) <= r verify.

Pigeonhole: if hamming(a, b) <= r and B > r, at least one band is untouched
by the r differing bits, so a and b collide in that band — recall is exactly
1.0 (verified against a brute-force oracle in tests, the same differential
pattern as /root/reference/Tests/Test_db_BKTree_Compare.py:30-70).

Skew: web corpora have mega-clusters (the reference's high_incidence_hashes
table, /root/reference/dbPhashApi.py:185-191). Band keys whose group exceeds
``hot_threshold`` are split out and self-joined with two-sided bucket salting
so no single reducer sees an O(n^2) task. Degenerate signatures (blank pages,
/root/reference/deduplicator/ProcessArchive.py:21-27) are filtered up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import bands_for_radius
from ..functions.columns import band_keys_array, hamming


def explode_bands(
    df: DataFrame, id_col: str, sig_col: str, n_bands: int, keep: list[str] | None = None
) -> DataFrame:
    """(id, sig, ...) -> (band_id, band_key, id, sig, ...): one row per band."""
    keep = keep or []
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        *[F.col(c) for c in keep],
        F.posexplode(band_keys_array(sig_col, n_bands)).alias("band_id", "band_key"),
    )


def hot_band_keys(bands: DataFrame, threshold: int) -> DataFrame:
    """Skew registry: band keys with more than ``threshold`` members.

    Analog of the reference's high_incidence_hashes side table
    (/root/reference/dbPhashApi.py:185-191), but used for salting rather than
    just logging.
    """
    return (
        bands.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > threshold)
    )


def _verify_pairs(joined: DataFrame, radius: int) -> DataFrame:
    return (
        joined.withColumn("distance", hamming(F.col("l_sig"), F.col("r_sig")))
        .filter(F.col("distance") <= radius)
        .select(
            F.col("l_id").alias("id_lo"),
            F.col("r_id").alias("id_hi"),
            F.col("distance"),
        )
    )


def banded_self_join(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    radius: int,
    n_bands: int | None = None,
    blacklist: tuple[int, ...] = (),
    hot_threshold: int | None = None,
    salt: int = 16,
    require_full_recall: bool = True,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """All-pairs (id_lo < id_hi, distance <= radius) — the J7 edge extraction
    (/root/reference/loader.py:91-128) as one set-oriented job.

    Exact (recall 1.0) for radius < n_bands. Returns (id_lo, id_hi, distance).
    require_full_recall=False permits radius >= n_bands for *probabilistic*
    candidate generation (hyperplane-LSH ANN, operators/ann.py), where misses
    are by design and measured, not a bug.

    hot_keys: optional precomputed skew registry (band_id, band_key) — e.g.
    the S13 registry the pipeline already materializes — so the full
    explode+groupBy isn't run a second time here. Safe to pass a SUPERSET of
    this join's own hot keys (the salted path is exact all-pairs regardless);
    counts from a superset of rows only ever salt more keys, never fewer.
    """
    n_bands = n_bands or bands_for_radius(radius)
    if require_full_recall and n_bands <= radius:
        raise ValueError(f"need n_bands > radius for full recall ({n_bands} <= {radius})")
    src = df.filter(F.col(sig_col).isNotNull())
    if blacklist:
        src = src.filter(~F.col(sig_col).isin(list(blacklist)))
    bands = explode_bands(src, id_col, sig_col, n_bands)

    if hot_threshold is None and hot_keys is None:
        cold, hot = bands, None
    else:
        if hot_keys is None:
            # computed over the RAW exploded rows: partial aggregation
            # collapses map-side, so this exchange carries slim partials
            hot_keys = hot_band_keys(bands, hot_threshold)
        cold = bands.join(
            F.broadcast(hot_keys.select("band_id", "band_key")),
            ["band_id", "band_key"],
            "left_anti",
        )
        # map-side broadcast filter — the hot slice never pays a full-table
        # exchange; the salted join below exchanges only the (rare) hot rows
        hot = bands.join(
            F.broadcast(hot_keys.select("band_id", "band_key")), ["band_id", "band_key"]
        )

    # ONE exchange for the whole cold self-join: repartition on the join key,
    # alias to l_/r_ ABOVE it, and both join children canonicalize to the
    # identical subtree — the right side becomes a ReusedExchange (the
    # corpus-x-bands table is exploded + shuffled once, read twice; the
    # band-leg scaling fix, VERDICT r3 profile).
    cold = cold.repartition("band_id", "band_key")
    l = cold.select(
        "band_id", "band_key", F.col("_id").alias("l_id"), F.col("_sig").alias("l_sig")
    )
    r = cold.select(
        "band_id", "band_key", F.col("_id").alias("r_id"), F.col("_sig").alias("r_sig")
    )
    # shuffle_hash: both children are already hash-partitioned on the band key
    # (zero additional exchange); sort-merge would only add two sorts
    joined = l.join(r.hint("shuffle_hash"), ["band_id", "band_key"]).filter(
        F.col("l_id") < F.col("r_id")
    )
    pairs = _verify_pairs(joined, radius)

    if hot is not None:
        pairs = pairs.unionByName(_salted_self_join(hot, radius, salt))

    # a pair can collide in several bands -> canonical-pair dedup, mirroring
    # the UNIQUE (item_1_link, item_2_link) edge constraint
    # (/root/reference/dbApi.py:94-96)
    return pairs.dropDuplicates(["id_lo", "id_hi"])


def _salted_self_join(hot_bands: DataFrame, radius: int, salt: int) -> DataFrame:
    """Exact all-pairs within hot band groups, spread over salt^2 reducer cells.

    Each member gets bucket = xxhash64(id) mod salt. The left side is
    replicated once per target bucket; a pair is emitted by exactly one
    (bucket_l, bucket_r) cell: bucket_l < bucket_r, or same bucket and
    id_l < id_r.
    """
    withb = hot_bands.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("_id")), F.lit(salt)).cast("int")
    )
    l = withb.withColumn(
        "tgt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).select(
        "band_id",
        "band_key",
        F.col("tgt"),
        F.col("bucket").alias("l_bucket"),
        F.col("_id").alias("l_id"),
        F.col("_sig").alias("l_sig"),
    )
    r = withb.select(
        "band_id",
        "band_key",
        F.col("bucket").alias("tgt"),
        F.col("bucket").alias("r_bucket"),
        F.col("_id").alias("r_id"),
        F.col("_sig").alias("r_sig"),
    )
    joined = l.join(r.hint("shuffle_hash"), ["band_id", "band_key", "tgt"]).filter(
        (F.col("l_bucket") < F.col("r_bucket"))
        | ((F.col("l_bucket") == F.col("r_bucket")) & (F.col("l_id") < F.col("r_id")))
    )
    # bucket order != id order: canonicalize explicitly (dbApi.py:417-425)
    return (
        joined.withColumn("distance", hamming(F.col("l_sig"), F.col("r_sig")))
        .filter(F.col("distance") <= radius)
        .select(
            F.least("l_id", "r_id").alias("id_lo"),
            F.greatest("l_id", "r_id").alias("id_hi"),
            F.col("distance"),
        )
    )


def banded_radius_search(
    corpus: DataFrame,
    queries: DataFrame,
    radius: int,
    corpus_id: str = "id",
    corpus_sig: str = "sig",
    query_id: str = "id",
    query_sig: str = "sig",
    n_bands: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Set-oriented radius search: (query_id, match_id, distance).

    Covers the reference's getWithinDistance / searchPhashSet family
    (/root/reference/dbPhashApi.py:160-212) — the query side is a DataFrame,
    so a batch of probes is the same job as a single probe. Self-matches are
    NOT excluded (the reference returns the probe itself when present; the
    caller applies SO4-style self-exclusion).
    """
    n_bands = n_bands or bands_for_radius(radius)
    if n_bands <= radius:
        raise ValueError(f"need n_bands > radius for full recall ({n_bands} <= {radius})")
    qb = explode_bands(
        queries.filter(F.col(query_sig).isNotNull()), query_id, query_sig, n_bands
    ).select(
        "band_id", "band_key", F.col("_id").alias("q_id"), F.col("_sig").alias("q_sig")
    )
    cb = explode_bands(
        corpus.filter(F.col(corpus_sig).isNotNull()), corpus_id, corpus_sig, n_bands
    ).select(
        "band_id", "band_key", F.col("_id").alias("m_id"), F.col("_sig").alias("m_sig")
    )
    if broadcast_queries:
        qb = F.broadcast(qb)
    return (
        cb.join(qb, ["band_id", "band_key"])
        .withColumn("distance", hamming(F.col("q_sig"), F.col("m_sig")))
        .filter(F.col("distance") <= radius)
        .select("q_id", F.col("m_id").alias("match_id"), "distance")
        .dropDuplicates(["q_id", "match_id"])
    )


def brute_force_pairs(
    df: DataFrame, id_col: str, sig_col: str, radius: int
) -> DataFrame:
    """O(n^2) oracle for differential tests (Test_db_BKTree_Compare pattern)."""
    src = df.filter(F.col(sig_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig")
    )
    l = src.select(F.col("_id").alias("id_lo"), F.col("_sig").alias("l_sig"))
    r = src.select(F.col("_id").alias("id_hi"), F.col("_sig").alias("r_sig"))
    return (
        l.join(r, F.col("id_lo") < F.col("id_hi"))
        .withColumn("distance", hamming(F.col("l_sig"), F.col("r_sig")))
        .filter(F.col("distance") <= radius)
        .select("id_lo", "id_hi", "distance")
    )
