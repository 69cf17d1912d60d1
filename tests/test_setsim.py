"""Prefix-filtered Jaccard self-join vs naive all-pairs oracle.

Same differential discipline as the banded-Hamming tests (reference pattern:
/root/reference/Tests/Test_db_BKTree_Compare.py:30-70) — the optimized
candidate generator must be lossless at every threshold.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.functions.columns import char_ngrams
from intraarchivededuplicator_spark.operators.setsim import jaccard_self_join

WORDS = "the quick brown fox jumps over lazy dog spark catalyst shuffles bands".split()


def _corpus(n=80, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.choice(WORDS) for _ in range(rng.randint(5, 30))]
        rows.append((i, " ".join(base)))
        if rng.random() < 0.4:  # near-duplicate: mutate a couple words
            mut = list(base)
            for _ in range(rng.randint(0, 2)):
                mut[rng.randrange(len(mut))] = rng.choice(WORDS)
            rows.append((1000 + i, " ".join(mut)))
    rows.append((9000, ""))  # empty doc must be dropped, not crash
    return rows


def _naive(d, threshold):
    a = d.select(F.col("_id").alias("id_lo"), F.col("_g").alias("ga"))
    b = d.select(F.col("_id").alias("id_hi"), F.col("_g").alias("gb"))
    return (
        a.join(b, F.col("id_lo") < F.col("id_hi"))
        .withColumn("n_shared", F.size(F.array_intersect("ga", "gb")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.size("ga") + F.size("gb") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_lo", "id_hi", "n_shared", "jaccard")
    )


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
@pytest.mark.parametrize("strategy", ["prefix", "dense", "auto"])
def test_jaccard_join_is_lossless(spark, threshold, strategy):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string").select(
        "doc_id", F.array_distinct(char_ngrams("text", 3)).alias("grams")
    )
    got = {
        (r["id_lo"], r["id_hi"], r["n_shared"], r["jaccard"])
        for r in jaccard_self_join(
            docs, "doc_id", "grams", threshold, strategy=strategy
        ).collect()
    }
    d = docs.select(F.col("doc_id").alias("_id"), F.col("grams").alias("_g")).filter(
        F.size("_g") > 0
    )
    want = {
        (r["id_lo"], r["id_hi"], r["n_shared"], r["jaccard"])
        for r in _naive(d, threshold).collect()
    }
    assert got == want
    assert len(want) > 0  # fixture actually produces similar pairs


def test_prefix_filter_prunes_candidates(spark):
    """The point of the operator: candidate volume must be far below n^2."""
    docs = spark.createDataFrame(_corpus(200), "doc_id long, text string").select(
        "doc_id", F.array_distinct(char_ngrams("text", 3)).alias("grams")
    )
    n = docs.filter(F.size("grams") > 0).count()
    out = jaccard_self_join(docs, "doc_id", "grams", 0.5, strategy="prefix")
    # correctness of *result* is covered above; here assert the plan avoids
    # a raw gram join by checking the explain contains the windowed prefix
    # ranking (row_number over the (df, gram) canonical order)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan
    assert out.count() < n * (n - 1) / 4


def test_auto_picks_dense_on_tiny_universe(spark):
    """The fixture corpus has a few hundred distinct trigrams, so auto must
    take the bitmap branch: no window rank, a broadcast nested-loop pair
    join, and pair arithmetic as scalar AND+popcount (never array ops)."""
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string").select(
        "doc_id", F.array_distinct(char_ngrams("text", 3)).alias("grams")
    )
    out = jaccard_self_join(docs, "doc_id", "grams", 0.8, strategy="auto")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "row_number" not in plan


def test_auto_picks_prefix_on_large_universe(spark):
    """Distinct hashed grams (universe >> DENSE_UNIVERSE_MAX) must route to
    the prefix plan even though the doc count is tiny."""
    import random as _random

    rng = _random.Random(7)
    rows = []
    for i in range(80):
        base = rng.sample(range(1, 500_000), 60)  # ~4.8k distinct grams total
        rows.append((i, base))
        rows.append((1000 + i, base[:57] + rng.sample(range(500_000, 600_000), 3)))
    docs = spark.createDataFrame(rows, "doc_id long, grams array<long>")
    out = jaccard_self_join(docs, "doc_id", "grams", 0.5, strategy="auto")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan or "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and it still finds the planted near-dup pairs
    assert out.count() >= 40
