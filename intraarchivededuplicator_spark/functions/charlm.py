"""Char-bigram language-model quality scoring (the CCNet/Wikipedia-LM
perplexity filter, self-trained): train bigram statistics on a deterministic
corpus slice, score every document by its average negative log-probability,
flag the tail.

Exactness discipline (what makes a statistical LM hash-gateable): both
engines would disagree on ln() in the last ulp, so neither engine computes a
log. Probabilities are quantized to Q=1024 fixed-point buckets with pure
integer arithmetic — p_q = max(1, (c_bigram * Q) // c_context) — and the
log-probability of each bucket comes from ONE precomputed table
(LP_MICRO[p_q] = round(ln(p_q / Q) * 1e6), Python math.log at import): the
engine broadcast-joins it as a 1024-row DataFrame, the DuckDB oracle embeds
the identical values as a VALUES list. Every per-doc total is then an exact
int64 sum — order-free, partitioning-free, engine-free. An unseen bigram
(scored doc outside the training slice) backs off to the floor bucket
LP_MICRO[1], the standard epsilon-smoothing.

Plan shape at 10^12 docs: the model is alphabet^2 rows — KBs, broadcast.
Scoring is explode (JVM-side transform/sequence, no Python) -> per-(doc,
bigram) partial-aggregated count -> broadcast join -> one per-doc sum.
Training reads only the sampled slice; at web scale you train on the same
~0.1% slice a CCNet run would, scoring cost is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

CHARLM_Q = 1024  # probability quantization buckets
CHARLM_SCALE = 1_000_000  # micro-nats per nat

# LP_MICRO[i] for p_q = i+1: round-half-away-from-zero like SQL round()
# (values are negative; Python round() is half-to-even — avoid it)
LP_MICRO: list[int] = [
    int(math.floor(math.log((i + 1) / CHARLM_Q) * CHARLM_SCALE + 0.5))
    if math.log((i + 1) / CHARLM_Q) >= 0
    else -int(math.floor(-math.log((i + 1) / CHARLM_Q) * CHARLM_SCALE + 0.5))
    for i in range(CHARLM_Q)
]
LP_FLOOR = LP_MICRO[0]  # unseen-bigram backoff: ln(1/Q) in micro-nats


def bigram_array(text_col):
    """array<string> of overlapping char bigrams — JVM-side transform over
    sequence, zero Python. CALLERS MUST pre-filter char_length >= 2: Spark's
    sequence(1, 0) counts DOWN (yields [1, 0]) instead of returning empty
    like DuckDB's generate_series, so an unguarded short doc would fabricate
    bigrams."""
    return F.transform(
        F.sequence(F.lit(1), F.char_length(text_col) - 1),
        lambda i: text_col.substr(i, F.lit(2)),
    )


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, bg) — one row per bigram OCCURRENCE. Docs with null text or
    fewer than 2 chars emit no rows (both engines: empty series)."""
    t = F.col(text_col)
    return (
        docs.filter(t.isNotNull() & (F.char_length(t) >= 2))
        .select("doc_id", F.explode(bigram_array(t)).alias("bg"))
    )


def lp_table(spark: SparkSession) -> DataFrame:
    """(p_q, lp_micro) — the shared quantized log table, 1024 rows."""
    return spark.createDataFrame(
        [(i + 1, lp) for i, lp in enumerate(LP_MICRO)],
        "p_q bigint, lp_micro bigint",
    )


def lp_values_sql() -> str:
    """The identical table as a DuckDB VALUES list (engine/oracle share the
    Python-computed constants by construction — no engine takes a log)."""
    return ", ".join(f"({i + 1},{lp})" for i, lp in enumerate(LP_MICRO))


def charlm_model(train: DataFrame, text_col: str = "text") -> DataFrame:
    """(bg, lp_micro): quantized conditional bigram log-probs from the
    training slice. c_context(a) = total bigrams starting with a, derived
    from the bigram counts themselves (one aggregation, one scan)."""
    c2 = doc_bigrams(train, text_col).groupBy("bg").agg(
        F.count("*").alias("c2")
    )
    c1 = c2.groupBy(F.substring("bg", 1, 1).alias("a")).agg(
        F.sum("c2").alias("c1")
    )
    quant = (
        c2.withColumn("a", F.substring("bg", 1, 1))
        .join(c1, "a")
        .select(
            "bg",
            F.expr(f"greatest(1L, (c2 * {CHARLM_Q}) div c1)").alias("p_q"),
        )
    )
    return quant.join(
        F.broadcast(lp_table(train.sparkSession)), "p_q"
    ).select("bg", "lp_micro")
