"""ProbeSession: the resident single-probe service surface.

Golden expectations reuse the reference's BK-tree vectors
(/root/reference/Tests/Test_BKTree.py:35-120, same as test_banded_join) so
the resident index answers exactly what the reference's in-process tree
answers; the batched shape is differential vs banded_radius_search.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.engine.probe import ProbeSession
from intraarchivededuplicator_spark.functions.hashing import bin_str_to_int64 as b2i
from intraarchivededuplicator_spark.operators.banded_join import (
    banded_radius_search,
)

from tests.test_banded_join import GOLDENS, TEST_DATA


@pytest.fixture(scope="module")
def session(spark):
    corpus = spark.createDataFrame(
        [(i, b2i(bits)) for i, bits in enumerate(TEST_DATA)], "id long, sig long"
    )
    s = ProbeSession(corpus, radius=18, n_bands=32)
    yield s
    s.close()


def test_bktree_goldens_via_resident_probe(session):
    for bits, radius, expect in GOLDENS:
        got = {m for m, _ in session.search(b2i(bits), radius=radius)}
        assert got == expect, (bits, radius)


def test_probe_distances_are_exact(session):
    tgt = b2i(TEST_DATA[6])
    for mid, dist in session.search(tgt, radius=17):
        want = bin((tgt ^ b2i(TEST_DATA[mid])) & (2**64 - 1)).count("1")
        assert dist == want


def test_radius_above_session_guarantee_rejected(session):
    with pytest.raises(ValueError):
        session.search(0, radius=40)


def test_batch_differential_vs_join_search(spark):
    rng = np.random.RandomState(5)
    base = rng.randint(-(2**63), 2**63, size=150, dtype=np.int64)
    near = base[:75] ^ (np.int64(1) << rng.randint(0, 64, size=75))
    corpus = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(np.concatenate([base, near]))],
        "id long, sig long",
    )
    queries = spark.createDataFrame(
        [(int(1000 + i), int(s)) for i, s in enumerate(base[:40])],
        "id long, sig long",
    )
    s = ProbeSession(corpus, radius=4)
    try:
        got = {
            (r["q_id"], r["match_id"], r["distance"])
            for r in s.search_batch(queries).collect()
        }
        want = {
            (r["q_id"], r["match_id"], r["distance"])
            for r in banded_radius_search(
                corpus, queries, radius=4, query_id="id", query_sig="sig"
            ).collect()
        }
        assert len(want) > 0
        assert got == want
        # single-probe shape agrees with the batch shape, query by query
        for q in queries.collect():
            singles = {
                (q["id"], m, d) for m, d in s.search(q["sig"])
            }
            assert singles == {t for t in want if t[0] == q["id"]}
    finally:
        s.close()


def test_index_is_resident_and_mutation_swaps_snapshots(spark):
    corpus = spark.createDataFrame(
        [(i, b2i(bits)) for i, bits in enumerate(TEST_DATA)], "id long, sig long"
    )
    s = ProbeSession(corpus, radius=4, n_bands=16)
    try:
        assert s._bands.storageLevel.useMemory  # resident, not re-scanned
        assert s.size() == len(TEST_DATA)

        probe = b2i(TEST_DATA[6])
        assert {m for m, _ in s.search(probe, radius=0)} == {6, 7, 8}

        # J8 analog: insert a new exact twin of item 6 -> it must match
        s.insert(
            spark.createDataFrame([(99, b2i(TEST_DATA[6]))], "id long, sig long")
        )
        assert {m for m, _ in s.search(probe, radius=0)} == {6, 7, 8, 99}
        assert s.size() == len(TEST_DATA) + 1

        # J9 analog: remove two of them -> gone from results
        s.remove([7, 99])
        assert {m for m, _ in s.search(probe, radius=0)} == {6, 8}

        # server-style full reload
        s.refresh(corpus)
        assert {m for m, _ in s.search(probe, radius=0)} == {6, 7, 8}
    finally:
        s.close()


def test_search_returns_nearest_first(spark):
    # RPC contract: result[0] is the CLOSEST match — (distance, id) order,
    # not id order. Plant a far match with a LOW id and an exact match with
    # a HIGH id; id-first ordering would put (5, 3) first.
    base = 0b1010_1100
    corpus = spark.createDataFrame(
        [(5, base ^ 0b0111), (9, base), (7, base ^ 0b1)],
        "id long, sig long",
    )
    s = ProbeSession(corpus, radius=4, n_bands=8)
    try:
        assert s.search(base) == [(9, 0), (7, 1), (5, 3)]
    finally:
        s.close()


def test_mutation_plan_depth_is_bounded(spark):
    # Each insert/remove builds the new snapshot FROM the old one; without
    # the lineage cut in _swap the band-table plan nests every prior
    # snapshot and Catalyst analysis cost grows per mutation — the exact
    # failure mode of a long-lived service. Pin: plan depth after the 6th
    # mutation equals plan depth after the 1st.
    corpus = spark.createDataFrame(
        [(i, b2i(bits)) for i, bits in enumerate(TEST_DATA)], "id long, sig long"
    )
    s = ProbeSession(corpus, radius=4, n_bands=16)

    def depth():
        return len(
            s._bands._jdf.queryExecution().analyzed().treeString().splitlines()
        )

    try:
        s.insert(spark.createDataFrame([(100, 17)], "id long, sig long"))
        d1 = depth()
        for k in range(5):
            s.insert(
                spark.createDataFrame([(101 + k, 23 + k)], "id long, sig long")
            )
        assert depth() == d1
        assert s.size() == len(TEST_DATA) + 6
    finally:
        s.close()


def test_null_signatures_excluded(spark):
    corpus = spark.createDataFrame(
        [(0, 5), (1, None), (2, 5)], "id long, sig long"
    )
    s = ProbeSession(corpus, radius=2, n_bands=8)
    try:
        assert {m for m, _ in s.search(5)} == {0, 2}
    finally:
        s.close()
