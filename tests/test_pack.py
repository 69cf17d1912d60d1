"""operators/pack: the two-phase distributed prefix sum must equal the
naive global window at every bucket size, and must not plan the
SinglePartition exchange the naive form pays."""

import random

from pyspark.sql import functions as F

from intraarchivededuplicator_spark.operators.pack import (
    PACK_SEQ_LEN,
    packed_offsets,
    packed_offsets_global_window,
)
from intraarchivededuplicator_spark.plans import queries as q

SF = "/root/testdata/sf0.001"


def _rows(r: random.Random, n: int, sparse: bool):
    ids = list(range(n))
    if sparse:
        # gappy, bucket-straddling ids (empty buckets must not shift offsets)
        ids = sorted(r.sample(range(n * 37), n))
    return [(i, r.randint(0, 5000)) for i in ids]


def test_two_phase_equals_global_window(spark):
    r = random.Random(42)
    for sparse in (False, True):
        d = spark.createDataFrame(
            _rows(r, 400, sparse), "doc_id long, n_tokens long"
        ).repartition(8)
        want = {
            row["doc_id"]: (
                row["start_offset"], row["seq_id"], row["offset_in_seq"]
            )
            for row in packed_offsets_global_window(d).collect()
        }
        for bucket in (1, 7, 64, 10**9):
            got = {
                row["doc_id"]: (
                    row["start_offset"], row["seq_id"], row["offset_in_seq"]
                )
                for row in packed_offsets(d, bucket=bucket).collect()
            }
            assert got == want, (sparse, bucket)


def test_offsets_are_a_dense_stream(spark):
    """start offsets recompute from first principles on the real table:
    contiguous (prev start + prev tokens), seq/offset arithmetic exact."""
    out = sorted(
        q.q_sequence_pack_offsets(spark, SF).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in out:
        assert r["start_offset"] == acc
        assert r["seq_id"] == acc // PACK_SEQ_LEN
        assert r["offset_in_seq"] == acc % PACK_SEQ_LEN
        acc += r["n_tokens"]
    # the corpus must actually span multiple sequences for this to bite
    assert out[-1]["seq_id"] > 2


def test_plan_has_no_single_partition_exchange(spark):
    d = spark.createDataFrame(
        [(i, i % 97 + 1) for i in range(500)], "doc_id long, n_tokens long"
    )
    scalable = (
        packed_offsets(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in scalable
    assert "Window" in scalable  # the per-bucket window is still there
    naive = (
        packed_offsets_global_window(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" in naive  # the trap the operator exists to avoid
