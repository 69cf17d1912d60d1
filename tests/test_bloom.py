"""operators/bloom: probe-arithmetic pins, the no-false-negative property,
forced false positives at tiny m, and the UDF-vs-JVM differential."""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M,
    bloom_incremental_dedup,
    bloom_positions_col,
    build_bloom_bits,
    make_might_contain_udf,
)
from intraarchivededuplicator_spark.plans import queries as q

SF = "/root/testdata/sf0.001"


def _py_positions(text: str, m: int, k: int):
    """Third implementation of the probe arithmetic (pure Python over
    hashlib md5) — pins both the JVM column algebra and the numpy UDF."""
    h = hashlib.md5(text.encode("utf-8")).hexdigest()
    h1 = int(h[:8], 16)
    h2 = int(h[8:16], 16)
    h2p = h2 - h2 % 2 + 1
    return [(h1 + i * h2p) % m for i in range(k)]


def test_positions_col_matches_python(spark):
    rows = [(i, t) for i, t in enumerate(["alpha", "beta gamma", "", "x"])]
    d = spark.createDataFrame(rows, "i long, text string").select(
        "i",
        bloom_positions_col(F.md5(F.encode(F.col("text"), "UTF-8"))).alias("p"),
    )
    got = {r["i"]: list(r["p"]) for r in d.collect()}
    for i, t in rows:
        assert got[i] == _py_positions(t, BLOOM_M, BLOOM_K), t
    # h2' odd + power-of-two m => the k positions of one key are distinct
    assert all(len(set(p)) == BLOOM_K for p in got.values())


def test_udf_matches_jvm_positions(spark):
    """Membership via the numpy bit-array UDF == membership via the JVM
    position columns joined against the built position set — the same
    differential shape the DuckDB oracle runs, kept in-repo so it survives
    without the gate."""
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} content") for i in range(200)],
        "doc_id long, text string",
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
    batch = spark.createDataFrame(
        [(1000 + i, f"doc number {i * 3} content") for i in range(120)],
        "doc_id long, text string",
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))

    bits = build_bloom_bits(corpus)
    mc = make_might_contain_udf(bits)
    via_udf = {
        r["doc_id"]: r["p"]
        for r in batch.select("doc_id", mc("text_hash").alias("p")).collect()
    }

    cset = {
        r["pos"]
        for r in corpus.select(
            F.explode(bloom_positions_col(F.col("text_hash"))).alias("pos")
        ).collect()
    }
    via_jvm = {
        r["doc_id"]: all(p in cset for p in r["pp"])
        for r in batch.select(
            "doc_id", bloom_positions_col(F.col("text_hash")).alias("pp")
        ).collect()
    }
    assert via_udf == via_jvm
    # i*3 < 200 for i < 67: those batch docs replay corpus text => positive
    assert all(via_udf[1000 + i] for i in range(67))


def test_no_false_negatives_and_verify(spark):
    """Every batch row whose exact hash is in the corpus MUST be
    bloom_positive (the sketch's hard guarantee), and is_dup == exact
    membership, recomputed from first principles on the real table."""
    out = {
        r["doc_id"]: (r["bloom_positive"], r["is_dup"])
        for r in q.q_bloom_dedup_incremental(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    text = dict(zip(pdf.doc_id.astype(int), pdf.text))
    corpus_hashes = {
        hashlib.md5(t.encode()).hexdigest()
        for i, t in text.items()
        if i % q.BLOOM_BATCH_MOD != 0
    }
    batch = [i for i in text if i % q.BLOOM_BATCH_MOD == 0]
    assert set(out) == set(batch)
    n_dup = 0
    for i in batch:
        src = i + 1 if i % q.BLOOM_DUP_MOD == 0 and i + 1 in text else i
        h = hashlib.md5(text[src].encode()).hexdigest()
        exact = h in corpus_hashes
        bp, dup = out[i]
        assert dup == exact, i
        if exact:
            n_dup += 1
            assert bp, f"false negative at {i}"
    # the plant must actually produce both classes
    assert 0 < n_dup < len(batch)


def test_false_positive_cleared_by_verify(spark):
    """At m=64/k=2 the filter saturates: some non-member probes come back
    bloom_positive, and the exact verify must clear every one of them."""
    corpus = spark.createDataFrame(
        [(i, f"seen {i}") for i in range(40)], "doc_id long, text string"
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
    batch = spark.createDataFrame(
        [(100 + i, f"new {i}") for i in range(40)]
        + [(900, "seen 7")],  # one true dup
        "doc_id long, text string",
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
    out = bloom_incremental_dedup(corpus, batch, m=64, k=2).collect()
    by_id = {r["doc_id"]: (r["bloom_positive"], r["is_dup"]) for r in out}
    assert by_id[900] == (True, True)
    fps = [i for i, (bp, dup) in by_id.items() if bp and not dup]
    assert fps, "m=64 with 40 keys should force at least one false positive"
    assert all(not dup for i, (bp, dup) in by_id.items() if i != 900)
    # and negatives are never dups (no-false-negative contrapositive)
    assert all(bp or not dup for bp, dup in by_id.values())


def test_null_hash_is_negative(spark):
    corpus = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
    batch = spark.createDataFrame(
        [(2, None), (3, "x")], "doc_id long, text string"
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
    out = {
        r["doc_id"]: (r["bloom_positive"], r["is_dup"])
        for r in bloom_incremental_dedup(corpus, batch).collect()
    }
    assert out[2] == (False, False)
    assert out[3] == (True, True)
