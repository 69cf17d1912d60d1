"""MinHash-LSH candidate generation: the hot-capped single-exchange
bucket-collect plan must emit the exact pair set (ids AND n_shared_bands)
of the streaming self-join plan, and the hot cap must excise mega-bucket
pair explosions (the reference's >100-candidate skip,
/root/reference/deduplicator/ProcessArchive.py:504-513)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.operators.lsh import (
    minhash_band_keys,
    minhash_candidate_pairs,
)


@pytest.fixture(scope="module")
def sig_df(spark):
    random.seed(11)
    rows = []
    for c in range(20):  # clusters of similar signatures
        base = [random.randrange(1 << 40) for _ in range(128)]
        for j in range(8):
            sig = list(base)
            for _ in range(random.randrange(0, 40)):
                sig[random.randrange(128)] = random.randrange(1 << 40)
            rows.append((c * 100 + j, sig))
    # mega-cluster: 60 identical signatures -> every band bucket is hot
    mega = [random.randrange(1 << 40) for _ in range(128)]
    for j in range(60):
        rows.append((90000 + j, list(mega)))
    rows.append((999999, None))  # degenerate doc: excluded like NULL pHash
    return spark.createDataFrame(
        rows, "id: long, minhash: array<long>"
    ).persist()


def _pairs(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def test_bucket_plan_matches_join_plan(sig_df):
    join_path = minhash_candidate_pairs(
        sig_df, n_bands=32, rows_per_band=4, hot_threshold=None
    )
    bucket_path = minhash_candidate_pairs(
        sig_df, n_bands=32, rows_per_band=4, hot_threshold=10**9
    )
    a, b = _pairs(join_path), _pairs(bucket_path)
    assert a, "fixture produced no candidate pairs"
    assert a == b


def test_hot_cap_matches_reference_filter(sig_df):
    thr = 30
    got = _pairs(
        minhash_candidate_pairs(
            sig_df, n_bands=32, rows_per_band=4, hot_threshold=thr
        )
    )
    # reference semantics: drop (band) buckets wider than thr, all-pairs rest
    bands = sig_df.filter(F.col("minhash").isNotNull()).select(
        F.col("id").alias("_id"),
        F.explode(minhash_band_keys("minhash", 32, 4)).alias("band_key"),
    )
    hot = (
        bands.groupBy("band_key")
        .count()
        .filter(F.col("count") > thr)
        .select("band_key")
    )
    cold = bands.join(F.broadcast(hot), "band_key", "left_anti")
    l = cold.select("band_key", F.col("_id").alias("a"))
    r = cold.select("band_key", F.col("_id").alias("b"))
    want = _pairs(
        l.join(r, "band_key")
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("id_lo"), F.col("b").alias("id_hi"))
        .groupBy("id_lo", "id_hi")
        .agg(F.count("*").alias("n_shared_bands"))
    )
    assert got == want
    mega = {90000 + j for j in range(60)}
    assert all(
        not (lo in mega and hi in mega) for lo, hi, _ in got
    ), "hot cap must suppress mega-bucket pair explosion"
