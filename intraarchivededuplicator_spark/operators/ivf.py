"""IVF-flat approximate nearest neighbor — the second ANN scale path.

operators/ann.py routes candidates through hyperplane-LSH band joins (the
text-SimHash trick reused on vectors). This module is the classical inverted-
file alternative: quantize every vector to its nearest coarse centroid (its
"cell"), store vectors as per-cell inverted lists, and answer a query by
scanning only the lists of its `nprobe` closest cells. The reference's
BK-tree plays the same role for Hamming space (prune the search to a metric
neighborhood, /root/reference/deduplicator/bktree.hpp getWithinDistance);
IVF is that idea for cosine space, realized as pure DataFrame algebra.

Spark realization — zero Python in the hot path, three slim exchanges:

1. coarse centroids: the `n_cells` vectors with the smallest
   (md5(vec_id), vec_id) — a distributed TakeOrdered top-k, engine-portable
   (the DuckDB oracle recomputes the identical sample; same device as
   plans/queries.q_deterministic_sample). Sampled centroids are a legitimate
   IVF quantizer; kmeans_centroids below is the Lloyd-refined production
   swap-in via the same (cell_id, cvec) contract — every downstream stage
   is unchanged (pass quantizer="kmeans" to either query shape).
2. assignment: broadcast the centroid table (n_cells x dim ints — KB-sized
   driver state, exactly what a cluster would broadcast) and compute the
   exact integer-scaled cosine of every (vector, centroid) pair in one
   map-only pass; rank cells per vector with a window over the SLIM
   (id, cell, ccos) projection — vectors never ride this exchange.
3. candidates: each vector's inverted-list cell is its rank-1 assignment;
   each QUERY probes its `nprobe` best cells. probes |><| members on cell_id
   (slim id pairs), then the exact fixed-point cosine re-rank joins the
   vectors back by id and a per-query window keeps top-k.

Determinism contract (shared with the DuckDB oracle, which replays the
whole plan as SQL — candidacy is part of the differential spec, so the
driver check is hash-exact, not recall-statistical): integer-scaled vectors
(ann.INT_SCALE) make every dot/norm an exact int64; cosines are rounded to
6 decimals before any ordering; all ties break on ascending id. `+ 0.0`
normalizes a rounded -0.0 so both engines order the zero identically.

Recall is governed by (n_cells, nprobe): nprobe == n_cells degenerates to
exhaustive search (pinned equal to brute force in tests); the sf-gated query
uses nprobe < n_cells so cell pruning is exercised under the hash gate.
Skew: cell populations are data-dependent; `hot_cap` (the S13 analog)
excludes cells whose list exceeds the cap from candidacy so one megacell
cannot quadratically dominate the probe join — at 10^12 rows size n_cells
~ sqrt(n) and cap lists at a small multiple of the mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from .ann import rcos6, scaled_vec


def _scaled_vecs(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """("_id", "_v"): integer-scaled vectors with null/empty rows dropped —
    such rows are absent from the SQL oracle by construction (unnest emits
    no rows), so the engine drops them too; parity, and it keeps null/NaN
    cosines out of the rank ordering."""
    return emb.select(
        F.col(id_col).alias("_id"), scaled_vec(F.col(vec_col)).alias("_v")
    ).filter(F.col("_v").isNotNull() & (F.size("_v") > 0))


def _sample_centroids(vecs: DataFrame, n_cells: int) -> list[tuple[int, list[int]]]:
    """[(cell_id, scaled_centroid_vec)] from a _scaled_vecs frame — the
    n_cells rows with the smallest (md5(id), id). orderBy+limit compiles to
    a distributed TakeOrdered (no global sort); the result is the
    coarse-quantizer state every IVF build materializes driver-side and
    broadcasts (KBs: n_cells x dim x 8B). The ONE sampling implementation:
    _ivf_candidates (the engine) and centroid_rows (the test surface) both
    call this, so they cannot drift."""
    rows = (
        vecs.orderBy(F.md5(F.col("_id").cast("string")).asc(), F.col("_id").asc())
        .limit(n_cells)
        .collect()
    )
    return [(i, list(r["_v"])) for i, r in enumerate(rows)]


def centroid_rows(
    emb: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[tuple[int, list[int]]]:
    """Public quantizer-build entry over a raw embeddings frame; see
    _sample_centroids (shared with the engine's _ivf_candidates)."""
    return _sample_centroids(_scaled_vecs(emb, id_col, vec_col), n_cells)


def kmeans_centroids(
    vecs: DataFrame, n_cells: int, n_iter: int = 3
) -> list[tuple[int, list[int]]]:
    """Lloyd-refined coarse quantizer in the same (cell_id, cvec) contract
    as _sample_centroids — the documented production swap-in: every
    downstream stage (assignment, probe join, re-rank, hot_cap) is unchanged.

    Spherical k-means in the INT_SCALE fixed-point space: seeding is the
    deterministic md5 sample (so kmeans_centroids(n_iter=0) IS the sampled
    quantizer), assignment uses the same exact integer-scaled cosine as the
    query-time quantizer, and each new centroid is the per-dimension mean of
    its members ROUNDED BACK to int64 scale — so query-time assignment stays
    exact integer arithmetic and the refined quantizer is deterministic
    across executors/runs/partitionings. Empty cells keep their previous
    centroid (cell count never collapses). Cost per iteration: one map-only
    broadcast assignment + one groupBy(cell) mean over dim agg columns (no
    explode; map-side partial aggregation) — at 10^12 rows run it on the
    same ~sqrt(n)-cell sample a production IVF build trains on, not the
    full table.

    No SQL oracle: the iterative refinement is not expressible in one DuckDB
    query, so kmeans-quantized plans are pytest-pinned (differential vs the
    sampled quantizer's contract + recall measurement) rather than
    driver-gated; gated queries keep quantizer="sampled".
    """
    cents = _sample_centroids(vecs, n_cells)
    if not cents or n_iter <= 0:
        return cents
    spark = vecs.sparkSession
    dim = len(cents[0][1])
    for _ in range(n_iter):
        cents_df = spark.createDataFrame(
            cents, "cell_id int, cvec array<bigint>"
        )
        ccos = rcos6(F.col("_v"), F.col("cvec"))
        # argmax cell per vector: max(struct) keeps the best (ccos, then
        # LOWEST cell_id on ties) without a window sort
        best = (
            vecs.join(F.broadcast(cents_df))
            .select(
                "_id",
                "_v",
                F.struct(
                    ccos.alias("c"), (-F.col("cell_id")).alias("nc")
                ).alias("_s"),
            )
            .groupBy("_id", "_v")
            .agg(F.max("_s").alias("_s"))
            .select((-F.col("_s.nc")).cast("int").alias("cell_id"), "_v")
        )
        # Exact long SUM / COUNT, not F.avg: avg(bigint) accumulates in a
        # double, which is order-dependent (partitioning-dependent) once a
        # cell's per-dimension sum passes 2^53 — breaking the determinism
        # guarantee above. sum(bigint) is exact int64 (order-free); one
        # double division of two exact values is then deterministic. Bound:
        # |component| ~ INT_SCALE*|x| <~ 2^27, so int64 sum overflow needs
        # > 2^36 members in one cell — unreachable for any sane n_cells.
        cnt = F.count(F.lit(1))
        mean_cols = [
            F.round(F.sum(F.col("_v")[i]) / cnt).cast("long").alias(f"_m{i}")
            for i in range(dim)
        ]
        new_rows = best.groupBy("cell_id").agg(*mean_cols).collect()
        by_cell = {
            r["cell_id"]: [r[f"_m{i}"] for i in range(dim)] for r in new_rows
        }
        cents = [
            (cid, by_cell.get(cid, cvec)) for cid, cvec in cents
        ]
    return cents


def _ivf_candidates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    nprobe: int,
    hot_cap: int | None,
    quantizer: str = "sampled",
    kmeans_iter: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """(vecs, cand): the persisted scaled-vector table ("_id", "_v") and the
    directed probe candidates (qid, nid) — the shared front half of both IVF
    query shapes. quantizer: "sampled" (md5 sample; the oracle-gated
    default) or "kmeans" (Lloyd-refined, see kmeans_centroids)."""
    spark: SparkSession = emb.sparkSession
    vecs = _scaled_vecs(emb, id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)

    # quantizer build doubles as the persist-materializing action, so the
    # main job reads vectors from cache instead of re-scanning the source
    if quantizer == "kmeans":
        rows = kmeans_centroids(vecs, n_cells, kmeans_iter)
    elif quantizer == "sampled":
        rows = _sample_centroids(vecs, n_cells)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    cents = spark.createDataFrame(rows, "cell_id int, cvec array<bigint>")
    # map-only quantization: n x n_cells slim rows out, vectors stay put
    ccos = rcos6(F.col("_v"), F.col("cvec"))
    assign = (
        vecs.join(F.broadcast(cents))
        .select("_id", "cell_id", ccos.alias("_ccos"))
    )
    w_cell = Window.partitionBy("_id").orderBy(
        F.desc("_ccos"), F.asc("cell_id")
    )
    ranked_cells = assign.select(
        "_id", "cell_id", F.row_number().over(w_cell).alias("_r")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    members = ranked_cells.filter(F.col("_r") == 1).select(
        F.col("cell_id"), F.col("_id").alias("nid")
    )
    if hot_cap is not None:
        ok = (
            members.groupBy("cell_id")
            .count()
            .filter(F.col("count") <= hot_cap)
            .select("cell_id")
        )
        members = members.join(F.broadcast(ok), "cell_id", "left_semi")
    probes = ranked_cells.filter(F.col("_r") <= nprobe).select(
        F.col("cell_id"), F.col("_id").alias("qid")
    )
    # a member belongs to exactly one cell and probe cells are distinct per
    # query, so (qid, nid) pairs are unique by construction — no dedup pass
    cand = probes.join(members.hint("shuffle_hash"), "cell_id").filter(
        F.col("qid") != F.col("nid")
    )
    return vecs, cand


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    hot_cap: int | None = None,
    quantizer: str = "sampled",
    kmeans_iter: int = 3,
) -> DataFrame:
    """(id, neighbor_id, rank, cosine): IVF-routed approximate top-k.

    Missing true neighbors live in unprobed cells (ANN semantics); every
    returned cosine is exact. Columns match the brute-force twin
    (plans/queries.q_embedding_knn) so recall is directly measurable.
    """
    vecs, cand = _ivf_candidates(
        emb, id_col, vec_col, n_cells, nprobe, hot_cap, quantizer, kmeans_iter
    )
    q = vecs.select(F.col("_id").alias("qid"), F.col("_v").alias("qv"))
    n = vecs.select(F.col("_id").alias("nid"), F.col("_v").alias("nv"))
    scored = (
        cand.select("qid", "nid")
        .join(q.hint("shuffle_hash"), "qid")
        .join(n.hint("shuffle_hash"), "nid")
        .select(
            "qid",
            "nid",
            rcos6(F.col("qv"), F.col("nv")).alias("cosine"),
        )
    )
    w_k = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(id_col),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            "cosine",
        )
    )


def ivf_near_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    hot_cap: int | None = None,
    quantizer: str = "sampled",
    kmeans_iter: int = 3,
) -> DataFrame:
    """(id_lo, id_hi, cosine) with cosine >= threshold — the IVF-routed twin
    of ann.ann_near_pairs. A pair is a candidate when EITHER side probes the
    other's cell (both sides always probe their own cell at rank 1, so
    same-cell pairs are never missed); directed candidates canonicalize to
    undirected pairs before the exact re-rank, so each pair pays one cosine.
    Precision is exact; recall is governed by (n_cells, nprobe)."""
    vecs, cand = _ivf_candidates(
        emb, id_col, vec_col, n_cells, nprobe, hot_cap, quantizer, kmeans_iter
    )
    pairs = cand.select(
        F.least("qid", "nid").alias("id_lo"),
        F.greatest("qid", "nid").alias("id_hi"),
    ).distinct()
    a = vecs.select(F.col("_id").alias("id_lo"), F.col("_v").alias("_va"))
    b = vecs.select(F.col("_id").alias("id_hi"), F.col("_v").alias("_vb"))
    return (
        pairs.join(a.hint("shuffle_hash"), "id_lo")
        .join(b.hint("shuffle_hash"), "id_hi")
        .select(
            "id_lo",
            "id_hi",
            rcos6(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_cell_stats(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> DataFrame:
    """(cell_id, n_members, min_id, max_id): inverted-list sizes of the
    sampled-quantizer IVF index — the S13-style observability surface for
    the vector path. Cell-population skew is data-dependent; this table is
    what hot_cap thresholds are SET from (read the histogram, pick the cap),
    so it's a first-class gated surface rather than a debug print.

    Same front half as _ivf_candidates (shared _scaled_vecs /
    _sample_centroids helpers — one sampling implementation, no drift), with
    the probe/candidate stages dropped: map-only broadcast assignment, one
    window for the argmax cell, one partial-aggregated exchange on cell_id.
    n_cells rows out by construction."""
    spark = emb.sparkSession
    vecs = _scaled_vecs(emb, id_col, vec_col)
    cents = spark.createDataFrame(
        _sample_centroids(vecs, n_cells), "cell_id int, cvec array<bigint>"
    )
    ccos = rcos6(F.col("_v"), F.col("cvec"))
    w = Window.partitionBy("_id").orderBy(F.desc("_ccos"), F.asc("cell_id"))
    members = (
        vecs.join(F.broadcast(cents))
        .select("_id", "cell_id", ccos.alias("_ccos"))
        .select("_id", "cell_id", F.row_number().over(w).alias("_r"))
        .filter(F.col("_r") == 1)
    )
    return members.groupBy("cell_id").agg(
        F.count("*").alias("n_members"),
        F.min("_id").alias("min_id"),
        F.max("_id").alias("max_id"),
    )
