"""Banded Hamming join vs the reference's BK-tree golden expectations.

Layers ported from the reference test strategy (SURVEY.md §5):
- radius-search goldens on the hand-built bitstring corpus
  (/root/reference/Tests/Test_BKTree.py:35-120)
- the H_1..H_9 corpus incl. NULL-signature exclusion
  (/root/reference/Tests/Test_PhashDbApi_PHashStuff.py:42-141)
- random differential: banded join == brute-force oracle
  (/root/reference/Tests/Test_db_BKTree_Compare.py:30-70)
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.config import bands_for_radius
from intraarchivededuplicator_spark.functions.hashing import bin_str_to_int64 as b2i
from intraarchivededuplicator_spark.operators.banded_join import (
    banded_radius_search,
    banded_self_join,
    brute_force_pairs,
)

# Node ids derive from list order — verbatim from Test_BKTree.py:35-52
TEST_DATA = [
    "0000000000000000000000000000000000000000000000000000000000000000",  # 0
    "1111111111111111111111111111111111111111111111111111111111111111",  # 1
    "1000000000000000000000000000000000000000000000000000000000000000",  # 2
    "0111111111111111111111111111111111111111111111111111111111111111",  # 3
    "1100000000000000000000000000000000000000000000000000000000000000",  # 4
    "0100000000000000000000000000000000000000000000000000000000000000",  # 5
    "0000000000000000000000000000000000000001111111111111111000000000",  # 6
    "0000000000000000000000000000000000000001111111111111111000000000",  # 7
    "0000000000000000000000000000000000000001111111111111111000000000",  # 8
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, b2i(h)) for i, h in enumerate(TEST_DATA)]
    return spark.createDataFrame(rows, "id long, sig long").cache()


def search(spark, corpus, tgt_bits, radius):
    q = spark.createDataFrame([(0, b2i(tgt_bits))], "id long, sig long")
    n_bands = bands_for_radius(radius) if radius < 32 else 64
    got = banded_radius_search(corpus, q, radius, n_bands=n_bands)
    return {r["match_id"] for r in got.collect()}


# expectations verbatim from Test_BKTree.py:74-120 (test_1..test_8)
GOLDENS = [
    ("0100000000000000000000000000000000000000000000000000000000000000", 0, {5}),
    ("0100000000000000000000000000000000000000000000000000000000000000", 1, {0, 4, 5}),
    ("0000000000000000000000000000000000000001111111111111111000000000", 0, {6, 7, 8}),
    ("0000000000000000000000000000000000000001111111111111111000000000", 15, {6, 7, 8}),
    ("0000000000000000000000000000000000000001111111111111111000000000", 16, {0, 6, 7, 8}),
    ("0000000000000000000000000000000000000001111111111111111000000000", 17, {0, 2, 5, 6, 7, 8}),
    ("0000000000000000000000000000000000000001111111111111111000000000", 18, {0, 2, 4, 5, 6, 7, 8}),
    ("1000000000000000000000000000000000000000000000000000000000000000", 0, {2}),
]


@pytest.mark.parametrize("bits,radius,expect", GOLDENS)
def test_bktree_goldens(spark, corpus, bits, radius, expect):
    assert search(spark, corpus, bits, radius) == expect


# --- H_1..H_9 corpus (Test_PhashDbApi_PHashStuff.py:42-141) ----------------
H = {
    1: "0000000000000000000000000000000000000000000000000000000000000000",
    2: "1111111111111111111111111111111111111111111111111111111111111111",
    3: "1000000000000000000000000000000000000000000000000000000000000000",
    4: "0111111111111111111111111111111111111111111111111111111111111111",
    5: "1100000000000000000000000000000000000000000000000000000000000000",
    6: "0100000000000000000000000000000000000000000000000000000000000000",
    7: "0000000000000000000000000000000000000001111111111111111000000000",
    8: "0000000000000000000000111100000000000001111111111111111000000000",
    9: "0000000000000000000000111100100000000001111111111111111000000000",
}
# db rows 1..13: (row_id, phash_key or None) per TEST_DATA at :53-67
PHASH_ROWS = [
    (1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 5),
    (7, None), (8, None), (9, None), (10, None), (11, 6), (12, None), (13, None),
]


@pytest.fixture(scope="module")
def phash_corpus(spark):
    rows = [(rid, b2i(H[k]) if k else None) for rid, k in PHASH_ROWS]
    return spark.createDataFrame(rows, "id long, sig long").cache()


@pytest.mark.parametrize(
    "probe,expect",
    [
        (5, {1, 3, 11, 5, 6}),  # test_searchByPhash1 (default distance 2)
        (6, {1, 3, 11, 5, 6}),
        (9, set()),             # test_searchByPhash2
        (4, {2, 4}),            # test_searchByPhash3
    ],
)
def test_phashdb_goldens(spark, phash_corpus, probe, expect):
    """Default search distance is 2 (/root/reference/dbPhashApi.py:175);
    NULL signatures must be excluded (rows 7-10, 12-13)."""
    q = spark.createDataFrame([(0, b2i(H[probe]))], "id long, sig long")
    got = banded_radius_search(phash_corpus, q, radius=2)
    assert {r["match_id"] for r in got.collect()} == expect


# --- differential: banded == brute force -----------------------------------
@pytest.mark.parametrize("radius", [1, 2, 4, 6, 8])
def test_differential_random_corpus(spark, radius):
    rng = np.random.RandomState(1234)
    n = 600
    # mix: uniform randoms + clustered perturbations to force near pairs
    base = rng.randint(-(2**63), 2**63, size=n // 2, dtype=np.int64)
    perturbed = base ^ (np.int64(1) << rng.randint(0, 64, size=n // 2))
    sigs = np.concatenate([base, perturbed])
    df = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(sigs)], "id long, sig long"
    )
    got = banded_self_join(df, "id", "sig", radius)
    expect = brute_force_pairs(df, "id", "sig", radius)
    g = {(r["id_lo"], r["id_hi"], r["distance"]) for r in got.collect()}
    e = {(r["id_lo"], r["id_hi"], r["distance"]) for r in expect.collect()}
    assert g == e
    assert len(e) > 0  # non-vacuous


def test_differential_with_hot_bands_and_salting(spark):
    """Hot-band salted path must stay exact (recall 1.0)."""
    rng = np.random.RandomState(7)
    hot = np.full(300, 42, dtype=np.int64)  # one giant identical-sig cluster
    hot = hot ^ (np.int64(1) << rng.randint(0, 8, size=300))  # tiny scatter
    rand = rng.randint(-(2**63), 2**63, size=300, dtype=np.int64)
    sigs = np.concatenate([hot, rand])
    df = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(sigs)], "id long, sig long"
    )
    got = banded_self_join(df, "id", "sig", 4, hot_threshold=50, salt=4)
    expect = brute_force_pairs(df, "id", "sig", 4)
    g = {(r["id_lo"], r["id_hi"], r["distance"]) for r in got.collect()}
    e = {(r["id_lo"], r["id_hi"], r["distance"]) for r in expect.collect()}
    assert g == e
    assert len(e) > 40000  # the hot cluster really is hot


def test_blacklist_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 5), (4, 5)], "id long, sig long"
    )
    got = banded_self_join(df, "id", "sig", 2, blacklist=(0,))
    rows = {(r["id_lo"], r["id_hi"]) for r in got.collect()}
    assert rows == {(3, 4)}


def test_self_join_excludes_self_and_canonicalizes(spark, corpus):
    got = banded_self_join(corpus, "id", "sig", 0)
    rows = sorted((r["id_lo"], r["id_hi"], r["distance"]) for r in got.collect())
    # ids 6,7,8 share a hash -> exactly the 3 canonical pairs at distance 0
    assert rows == [(6, 7, 0), (6, 8, 0), (7, 8, 0)]


def test_radius_search_shuffle_branch_differential(spark):
    """broadcast_queries=False is the documented fallback when the probe
    batch outgrows a broadcast (the 10^9+-corpus plan: both band tables
    shuffle-partition on (band_id, band_key)). It must return the IDENTICAL
    (q_id, match_id, distance) set as the default broadcast branch
    (VERDICT r4 "What's wrong" #2)."""
    rng = np.random.RandomState(99)
    base = rng.randint(-(2**63), 2**63, size=200, dtype=np.int64)
    near = base[:100] ^ (np.int64(1) << rng.randint(0, 64, size=100))
    corpus = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(np.concatenate([base, near]))],
        "id long, sig long",
    )
    queries = spark.createDataFrame(
        [(int(1000 + i), int(s)) for i, s in enumerate(base[:50])],
        "id long, sig long",
    )
    kw = dict(radius=4, query_id="id", query_sig="sig")
    got = {
        (r["q_id"], r["match_id"], r["distance"])
        for r in banded_radius_search(
            corpus, queries, broadcast_queries=False, **kw
        ).collect()
    }
    expect = {
        (r["q_id"], r["match_id"], r["distance"])
        for r in banded_radius_search(corpus, queries, **kw).collect()
    }
    assert len(expect) > 0
    assert got == expect


def test_incremental_near_pairs_differential(spark):
    """q_incremental_near_pairs (new-vs-index broadcast probe + within-batch
    self-join) must equal the FULL banded self-join restricted to pairs with
    at least one side in the new batch — i.e., skipping the old-vs-old
    quadratic term loses nothing that touches the increment. Random corpus
    with planted near-neighbors on both sides of the old/new split."""
    from intraarchivededuplicator_spark.plans.queries import INCR_NEW_MOD

    rng = np.random.RandomState(7)
    base = rng.randint(-(2**63), 2**63, size=300, dtype=np.int64)
    near = base[:150] ^ (np.int64(1) << rng.randint(0, 64, size=150))
    sigs = np.concatenate([base, near])
    df = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(sigs)], "id long, sig long"
    )
    radius = 4
    full = banded_self_join(df, "id", "sig", radius)
    expect = {
        (r["id_lo"], r["id_hi"], r["distance"])
        for r in full.collect()
        if r["id_lo"] % INCR_NEW_MOD == 0 or r["id_hi"] % INCR_NEW_MOD == 0
    }
    is_new = F.col("id") % INCR_NEW_MOD == 0
    old, new = df.filter(~is_new), df.filter(is_new)
    cross = banded_radius_search(
        old, new, radius, corpus_id="id", corpus_sig="sig",
        query_id="id", query_sig="sig",
    ).select(
        F.least("q_id", "match_id").alias("id_lo"),
        F.greatest("q_id", "match_id").alias("id_hi"),
        "distance",
    )
    within = banded_self_join(new, "id", "sig", radius).select(
        "id_lo", "id_hi", "distance"
    )
    got = {
        (r["id_lo"], r["id_hi"], r["distance"])
        for r in cross.unionByName(within).collect()
    }
    assert len(expect) > 20  # non-vacuous: planted pairs straddle the split
    assert got == expect
