"""Exact-containment pass: which documents appear verbatim inside others.

Web-graft analog of the reference's archive-containment query — "is container
A's item set a subset of container B's?"
(/root/reference/deduplicator/ProcessArchive.py:351-394, early-exit on any
unique item at :388-390). Here: doc A's *text* appears as an exact substring
of doc B's text.

Distributed plan (no O(n^2)):
 1. anchor generation — each inner-candidate doc contributes its *minimum*
    k-shingle hash (a winnowing anchor). If A ⊂ B at token boundaries, every
    A-shingle is a B-shingle, so A's min-shingle is in B's shingle set.
 2. candidate join — explode outer docs' distinct shingle hashes, semi-join
    against the broadcast anchor set, then equi-join anchors == shingles.
    Shuffle volume: one row per (outer doc, anchored shingle), not n^2.
 3. exact verify — applyInPandas grouped by outer doc: build one suffix
    array over the outer text (functions/suffix.py) and binary-search each
    inner candidate. Amortizes many probes per outer doc.

Emitted pairs are (inner_id, outer_id) with inner strictly shorter; equal
texts are the exact-dup operator's job.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.columns import token_shingles, tokens
from ..functions.hashing import MINHASH_PRIME  # noqa: F401  (doc cross-ref)


def _shingle_hashes32(text_col: str, k: int) -> F.Column:
    """Distinct shingle_hash32 values, JVM-side: md5 -> first 8 hex -> conv.

    Kept only for oracle-parity queries (plans/queries.q_doc_fingerprint);
    the engine path uses columns.shingle_hashes64 (xxhash64, ~20x cheaper)."""
    sh = token_shingles(tokens(F.col(text_col)), k)
    return F.array_distinct(
        F.transform(
            sh,
            lambda s: F.conv(
                F.substring(F.md5(F.encode(s, "UTF-8")), 1, 8), 16, 10
            ).cast("long"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    k_shingle: int = 5,
    use_suffix_array: bool = True,
    shingle_col: str | None = None,
    hot_anchor_cap: int | None = 250_000,
) -> DataFrame:
    """(inner_id, outer_id) where inner text ⊂ outer text, len(inner) < len(outer).

    Pass shingle_col when the docs table already carries the shingle-hash set
    (engine/pipeline computes it once in the signature pass) — anchors and the
    outer explode then reuse it with zero recomputation.

    Candidate plan (ids only — no text leaves its partition until the final
    verify): min-anchor equi-join -> shingle-subset filter (containment
    implies inner's WHOLE shingle set ⊆ outer's, checked JVM-side with
    array_except) -> texts joined for the few survivors -> per-outer-doc
    suffix-array verify.

    Skew: the anchor is each doc's globally RAREST shingle (min by document
    frequency, hash tie-break) — valid because containment puts EVERY inner
    shingle in the outer set, so any shingle works as the anchor, and the
    rarest is the most selective. A common shingle can therefore never
    accumulate a large anchor group; only true near-identical mega-clusters
    (where every shingle is shared by all m members) stay hot, and anchors
    whose inner x df product exceeds hot_anchor_cap are skipped — their
    connectivity is the SimHash/Jaccard legs' job (the reference's
    >100-candidate skip, /root/reference/deduplicator/ProcessArchive.py:
    504-513). None disables the cap.
    """
    if shingle_col is None:
        from ..functions.udfs import make_shingle_hashes_udf

        docs = docs.withColumn(
            "_sh", make_shingle_hashes_udf(k_shingle)(F.col(text_col))
        )
        shingle_col = "_sh"
    base = docs.filter(F.col(shingle_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        F.length(text_col).alias("_len"),
        F.col(shingle_col).alias("_sh"),
    )
    # docs with < k_shingle tokens have no anchor and are skipped: containment
    # is only defined for inner docs of at least one shingle (degenerate/empty
    # docs are the blacklist's business, not this operator's).
    # anchor = min shingle hash (a winnowing anchor)
    exploded = base.select(F.col("_id"), F.col("_len"), F.explode("_sh").alias("s"))
    df_tbl = exploded.groupBy("s").agg(F.count("*").alias("df"))
    inner = (
        exploded.join(df_tbl, "s")
        .groupBy("_id", "_len")
        .agg(F.min(F.struct("df", "s")).alias("_m"))
        .select(
            F.col("_id").alias("inner_id"),
            F.col("_len").alias("inner_len"),
            F.col("_m.s").alias("anchor"),
        )
    )
    if hot_anchor_cap is not None:
        hot = (
            inner.groupBy("anchor")
            .agg(F.count("*").alias("n_in"))
            .join(df_tbl.withColumnRenamed("s", "anchor"), "anchor")
            .filter(F.col("n_in") * F.col("df") > hot_anchor_cap)
            .select("anchor")
        )
        inner = inner.join(F.broadcast(hot), "anchor", "left_anti")
    # prune outer shingle rows to the ones that are somebody's anchor
    outer = exploded.select(
        F.col("_id").alias("outer_id"),
        F.col("_len").alias("outer_len"),
        F.col("s").alias("anchor"),
    ).join(F.broadcast(inner.select("anchor").distinct()), "anchor", "left_semi")

    cand = (
        outer.join(inner, "anchor")
        .filter(
            (F.col("inner_id") != F.col("outer_id"))
            & (F.col("inner_len") < F.col("outer_len"))
        )
        .select("outer_id", "inner_id")
        .dropDuplicates(["outer_id", "inner_id"])
    )
    # exact necessary condition, JVM-side: inner shingle set ⊆ outer's
    sh_in = base.select(F.col("_id").alias("inner_id"), F.col("_sh").alias("_sh_in"))
    sh_out = base.select(F.col("_id").alias("outer_id"), F.col("_sh").alias("_sh_out"))
    cand = (
        cand.join(sh_in, "inner_id")
        .join(sh_out, "outer_id")
        .filter(F.size(F.array_except("_sh_in", "_sh_out")) == 0)
        .select("outer_id", "inner_id")
    )
    texts_in = base.select(
        F.col("_id").alias("inner_id"), F.col("_text").alias("inner_text")
    )
    texts_out = base.select(
        F.col("_id").alias("outer_id"), F.col("_text").alias("outer_text")
    )
    cand = cand.join(texts_in, "inner_id").join(texts_out, "outer_id").select(
        "outer_id", "outer_text", "inner_id", "inner_text"
    )

    if not use_suffix_array:
        return cand.filter(
            F.contains(F.col("outer_text"), F.col("inner_text"))
        ).select("inner_id", "outer_id")

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.suffix import sa_contains, suffix_array

        out_rows = []
        for outer_text, grp in pdf.groupby("outer_text", sort=False):
            blob = outer_text.encode("utf-8")
            if len(grp) == 1:
                row = grp.iloc[0]
                if row["inner_text"].encode("utf-8") in blob:
                    out_rows.append((int(row["inner_id"]), int(row["outer_id"])))
                continue
            sa = suffix_array(blob)
            for _, row in grp.iterrows():
                if sa_contains(blob, sa, row["inner_text"]):
                    out_rows.append((int(row["inner_id"]), int(row["outer_id"])))
        return pd.DataFrame(out_rows, columns=["inner_id", "outer_id"])

    return cand.groupBy("outer_id").applyInPandas(
        verify, schema="inner_id long, outer_id long"
    )


def containment_pairs_bruteforce(
    docs: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """O(n^2) oracle for differential tests."""
    k_shingle = 5
    a = docs.select(
        F.col(id_col).alias("inner_id"), F.col(text_col).alias("ta")
    ).filter(F.size(tokens(F.col(text_col))) >= k_shingle)
    b = docs.select(F.col(id_col).alias("outer_id"), F.col(text_col).alias("tb"))
    return (
        a.crossJoin(b)
        .filter(
            (F.col("inner_id") != F.col("outer_id"))
            & (F.length("ta") < F.length("tb"))
            & F.contains(F.col("tb"), F.col("ta"))
        )
        .select("inner_id", "outer_id")
    )
