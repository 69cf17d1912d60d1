"""The flagship dataflow: pages -> signatures -> pairs -> clusters -> report.

Set-oriented re-realization of the reference's three entry points
(SURVEY.md §3): ingest (dir-scan), per-container dedup (processDownload), and
all-pairs edge extraction (loader.py) collapse into one declarative plan:

    read pages
      -> extract text (Arrow UDF)                      [scanner/hashFile.py]
      -> md5 + SimHash64 + MinHash signatures          [H1/H2/H3 analogs]
      -> pairs: exact stars ∪ banded-Hamming ∪ containment
                ∪ Jaccard-verified MinHash-LSH          [J1/J7/J12]
      -> union-find clusters                           [graphApi components]
      -> per-site match aggregation / best match       [A6-A8, R1]

Every stage is checkpointable with per-partition lineage (engine/checkpoint).
"""

from __future__ import annotations

import hashlib as _hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT_CONFIG, DedupConfig
from ..functions.columns import tokens
from ..functions.textprep import with_extracted_text
from ..functions.udfs import make_fast_signatures_udf
from ..operators.banded_join import banded_self_join
from ..operators.cluster import assign_clusters
from ..operators.containment import containment_pairs
from ..operators.exact import exact_pairs, with_text_hash
from ..operators.lsh import jaccard_verify_pairs, minhash_candidate_pairs
from .checkpoint import NullCheckpointer, StageCheckpointer


def config_fingerprint(cfg: DedupConfig) -> str:
    return _hashlib.md5(repr(cfg).encode()).hexdigest()


class _ResumedStageMetrics:
    """Observation stand-in for a checkpoint-resumed stage: the stage's
    compute (and its .observe action) never ran, so a live Observation.get
    would block indefinitely. Surfaces the lineage sidecar's counters with
    the same .get property shape instead."""

    def __init__(self, meta: dict):
        self._meta = meta

    @property
    def get(self) -> dict:
        return {"resumed": True, "output_rows": self._meta.get("output_rows")}


def compute_docs(
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    extract: bool = True,
    hash_partitions: int | None = None,
    rep_gate: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, [text], lang) -> docs signature table.

    id = xxhash64(url): stable across runs/partitionings (the dbId analog,
    SURVEY.md §1.1). site = url host (the fsPath/container analog).

    hash_partitions: when set, the table is hash-partitioned on text_hash
    BEFORE the signature UDFs run. The shuffle then carries only raw text
    (the signature columns don't exist yet), and the exact-first
    representative window downstream is shuffle-free — its ClusteredDistribution
    on text_hash is already satisfied. This is the scale-safe replacement for
    r1's full-row window shuffle (VERDICT r1 "What's wrong" #3): at 100TB the
    old plan re-shuffled the whole corpus + shingle arrays on text_hash.

    rep_gate: adds a rep_id column (min id per text_hash group, shuffle-free
    under hash_partitions) and runs the signature UDFs ONLY on each group's
    representative row — members carry null signatures and resolve them via
    rep_id. An m-member exact group (error pages, mirrored templates) costs
    one signature computation instead of m, and a mega-group of identical
    pages that hash-colocates into one partition contributes ~one row of UDF
    work, not a skewed partition of it. (Window-propagating the rep's
    signatures to members was measured and rejected: ArrowEvalPython does not
    preserve the child's output partitioning, so the post-UDF window forces a
    full-row exchange of text + signature arrays — the exact shuffle this
    mode exists to avoid.)
    """
    df = with_extracted_text(pages) if extract else pages
    df = with_text_hash(df)
    if hash_partitions:
        df = df.repartition(hash_partitions, "text_hash")
    df = df.withColumn("id", F.xxhash64("url")).withColumn(
        "n_tokens", F.size(tokens(F.col("text")))
    )
    sig_udf = make_fast_signatures_udf(
        cfg.k_shingle, cfg.minhash_params, winnow_w=cfg.containment_winnow_w
    )
    sig_text = F.col("text")
    rep_cols = []
    if rep_gate:
        grp = Window.partitionBy("text_hash")
        if cfg.junk_filter:
            # rep election must be junk-aware (ADVICE r2): junk rules look at
            # the URL, which differs within a byte-identical group, so the
            # min-id member can be junk while siblings are not. Elect the rep
            # among NON-JUNK members (falling back to min id for all-junk
            # groups, whose members build_pairs junk-gates out anyway) so a
            # live group never loses fuzzy matching to a junk-flagged rep —
            # and never signs an all-junk rep at all.
            from ..functions.junk import is_junk_page

            df = df.withColumn("_junk", is_junk_page("url", "text", "n_tokens"))
            df = df.withColumn(
                "rep_id",
                F.coalesce(
                    F.min(F.when(~F.col("_junk"), F.col("id"))).over(grp),
                    F.min("id").over(grp),
                ),
            )
            is_rep = (F.col("id") == F.col("rep_id")) & ~F.col("_junk")
        else:
            df = df.withColumn("rep_id", F.min("id").over(grp))
            is_rep = F.col("id") == F.col("rep_id")
        sig_text = F.when(is_rep, F.col("text"))
        rep_cols = [F.col("rep_id")]
    sig = sig_udf(sig_text)  # one expression: evaluated once per row
    simhash_col = sig["simhash"]
    if rep_gate:
        # null (not degenerate 0) for non-reps so NOT NULL signature gates
        # and the hot-band registry skip them outright
        simhash_col = F.when(is_rep, simhash_col)
    winnow_cols = (
        [
            sig["win_interior"].alias("win_interior"),
            sig["win_boundary"].alias("win_boundary"),
        ]
        if cfg.containment_winnow_w is not None
        else []
    )
    return df.select(
        F.col("id"),
        F.col("url"),
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("site"),
        F.col("text"),
        F.col("text_hash"),
        *rep_cols,
        simhash_col.alias("simhash"),
        sig["minhash"].alias("minhash"),
        sig["shingle_hashes"].alias("shingle_hashes"),
        *winnow_cols,
        F.col("n_tokens"),
        *([F.col("lang")] if "lang" in df.columns else []),
        *([F.col("warc_ts")] if "warc_ts" in df.columns else []),
    )


def build_pairs(
    docs: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Union of all pair families, canonical + deduplicated:
    (id_lo, id_hi, distance, kind). kind precedence exact > simhash >
    containment > jaccard > minhash when the same pair is found by several
    legs.

    With cfg.exact_first (default), byte-identical texts collapse to their
    min-id representative first: members link to the rep by star edges
    (distance 0, kind 'exact'), and every fuzzy leg sees only distinct texts.
    Connectivity of the cluster graph is unchanged (a star spans exactly the
    clique it replaces) while an m-member exact group emits m-1 edges instead
    of m(m-1)/2 and is hashed/sig-joined once instead of m times."""
    # P6 junk gate: blank pages, infrastructure paths, and short error-page
    # boilerplate never enter the pair legs
    # (/root/reference/deduplicator/ProcessArchive.py:228-262 analog);
    # without it every blank/404 page md5-matches every other one
    if cfg.junk_filter:
        from ..functions.junk import is_junk_page

        matchable = docs.filter(~is_junk_page("url", "text", "n_tokens"))
    else:
        matchable = docs.filter(F.col("n_tokens") > 0)
    if cfg.exact_first:
        if "rep_id" in docs.columns:
            # rep_id precomputed in compute_docs(rep_gate=True): shuffle-free
            # under text_hash partitioning, and signatures were only computed
            # for reps in the first place
            with_rep = matchable
        else:
            w = Window.partitionBy("text_hash")
            with_rep = matchable.withColumn("rep_id", F.min("id").over(w))
        # rep is the min id, so (rep_id, id) is already canonical
        exact = (
            with_rep.filter(F.col("id") != F.col("rep_id"))
            .select(
                F.col("rep_id").alias("id_lo"),
                F.col("id").alias("id_hi"),
                F.lit(0).alias("distance"),
            )
            .withColumn("kind", F.lit("exact"))
        )
        matchable = with_rep.filter(F.col("id") == F.col("rep_id")).drop("rep_id")
    else:
        exact = exact_pairs(matchable, "id", "text_hash").withColumn(
            "kind", F.lit("exact")
        )
    # shingle sets were computed once in compute_docs; never recompute here
    shingled = matchable.select("id", "shingle_hashes").filter(
        F.col("shingle_hashes").isNotNull()
    )
    sim = banded_self_join(
        matchable,
        "id",
        "simhash",
        cfg.simhash_radius,
        n_bands=cfg.simhash_bands,
        blacklist=cfg.blacklist,
        hot_threshold=cfg.hot_band_threshold,
        salt=cfg.hot_band_salt,
        hot_keys=hot_keys,
    ).withColumn("kind", F.lit("simhash"))
    mh_cand = minhash_candidate_pairs(
        matchable,
        "id",
        "minhash",
        n_bands=cfg.minhash_bands,
        rows_per_band=cfg.minhash_k // cfg.minhash_bands,
        hot_threshold=cfg.hot_band_threshold,
    )
    mh = mh_cand.select(
        "id_lo", "id_hi", F.lit(None).cast("int").alias("distance")
    ).withColumn("kind", F.lit("minhash"))
    # exact-Jaccard verification promotes candidates into the cluster graph —
    # LSH candidates alone are probabilistic and must not merge clusters
    jac = (
        jaccard_verify_pairs(
            mh_cand.select("id_lo", "id_hi"),
            shingled,
            threshold=cfg.jaccard_verify_threshold,
        )
        .select("id_lo", "id_hi", F.lit(None).cast("int").alias("distance"))
        .withColumn("kind", F.lit("jaccard"))
    )
    cont = (
        containment_pairs(
            matchable,
            "id",
            "text",
            cfg.k_shingle,
            shingle_col="shingle_hashes",
            # winnowed anchor universe precomputed by the signature kernel
            # when cfg.containment_winnow_w is set (compute_docs)
            **(
                {
                    "winnow_interior_col": "win_interior",
                    "winnow_boundary_col": "win_boundary",
                }
                if "win_interior" in matchable.columns
                else {}
            ),
        )
        .select(
            F.least("inner_id", "outer_id").alias("id_lo"),
            F.greatest("inner_id", "outer_id").alias("id_hi"),
            F.lit(None).cast("int").alias("distance"),
        )
        .withColumn("kind", F.lit("containment"))
    )
    prec = (
        F.when(F.col("kind") == "exact", 0)
        .when(F.col("kind") == "simhash", 1)
        .when(F.col("kind") == "containment", 2)
        .when(F.col("kind") == "jaccard", 3)
        .otherwise(4)
    )
    all_pairs = (
        exact.unionByName(sim).unionByName(cont).unionByName(jac).unionByName(mh)
    )
    return (
        all_pairs.withColumn("_prec", prec)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("id_lo", "id_hi").orderBy("_prec")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_prec", "_rn")
    )


def dedup_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    checkpointer: StageCheckpointer | None = None,
    extract: bool = True,
    cluster_kinds: tuple[str, ...] = ("exact", "simhash", "containment", "jaccard"),
) -> dict[str, DataFrame]:
    """Returns {'docs', 'pairs', 'clusters'}.

    Clustering uses the *verified* pair families by default — exact hash,
    banded-Hamming-verified SimHash, suffix-array-verified containment, and
    exact-Jaccard-verified MinHash. Raw MinHash LSH candidates are emitted in
    `pairs` but do not merge clusters (they are probabilistic candidates, not
    matches — mirrors the reference clustering only confirmed Phash4 edges,
    /root/reference/graphApi.py:38-57).
    """
    ck = checkpointer or NullCheckpointer()
    ck.config_fingerprint = config_fingerprint(cfg)

    # A10 progress counters, Spark-native: Observation metrics ride the
    # normal actions as accumulators (the uiFrontend progress-tag analog,
    # /root/reference/deduplicator/ProcessArchive.py status logging) — no
    # extra jobs, readable after each stage materializes via
    # out["observations"][stage].get. For a RESUMED checkpoint stage no
    # action executes, so the live Observation would block forever on .get
    # (ADVICE r2) — those entries are swapped for the sidecar's metrics.
    from pyspark.sql import Observation

    obs = {"docs": Observation("docs"), "pairs": Observation("pairs")}

    def _finalize_obs(stage: str) -> None:
        for m in reversed(ck.metrics):
            if m.get("stage") == stage:
                if m.get("resumed"):
                    obs[stage] = _ResumedStageMetrics(m)
                return

    # a narrow source (one parquet file, one kafka partition) must not
    # serialize the Arrow UDF stages, and raw scan partitions are often
    # SKEWED (size-based splits over rows of very different text lengths) —
    # round-robin repartition whenever the source has fewer partitions than
    # the target. r1 scaling failure: `< target//2` left an 8-partition skewed
    # scan unbalanced at local[8] (docs stage 178s vs 25s balanced).
    target_parts = spark.sparkContext.defaultParallelism * 2
    if pages.rdd.getNumPartitions() < target_parts:
        pages = pages.repartition(target_parts)

    docs = ck.run(
        spark,
        "docs",
        lambda: compute_docs(
            pages,
            cfg,
            extract=extract,
            hash_partitions=target_parts,
            rep_gate=cfg.exact_first,
        ).observe(
            obs["docs"],
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_tokens") <= 0, 1).otherwise(0)).alias(
                "n_blank"
            ),
            F.sum(F.when(F.col("simhash").isNotNull(), 1).otherwise(0)).alias(
                "n_signed"
            ),
        ),
    )
    _finalize_obs("docs")
    if isinstance(ck, NullCheckpointer):
        # without a materializing checkpointer the pair legs would each
        # recompute the signature UDFs — materialize now (eagerly: the
        # union-find localCheckpoint below would otherwise re-execute the
        # whole multi-leg pairs plan inside one job, where the optimizer has
        # mis-sized a join side badly enough to OOM the broadcast exchange;
        # observed at 160k docs even with a 48g heap). localCheckpoint
        # rather than persist+count: it ALSO truncates lineage, so the ~6
        # downstream actions analyze/optimize a LogicalRDD leaf instead of
        # re-walking the extract+signature tree each time — that driver-side
        # planning is single-threaded and identical at every parallelism
        # level, i.e. pure Amdahl overhead at cluster scale. (At production
        # scale StageCheckpointer gives the same truncation via parquet.)
        docs = docs.localCheckpoint()
    # S13 skew registry: SimHash band keys whose group exceeds the hot
    # threshold — the high_incidence_hashes side table analog
    # (/root/reference/dbPhashApi.py:185-191), persisted by jobs/dedup_job so
    # operators can consult it for salting/blacklisting across runs. Computed
    # ONCE over the cached docs and shared with the banded self-join's
    # hot/cold split below (r2 verdict: previously this explode+groupBy ran
    # twice per pipeline). Registry rows are a slight superset of the join's
    # own view (blacklisted sigs included) — safe, see banded_self_join.
    from ..operators.banded_join import explode_bands, hot_band_keys

    hot_bands = hot_band_keys(
        explode_bands(
            docs.filter(F.col("simhash").isNotNull()), "id", "simhash",
            cfg.simhash_bands,
        ),
        cfg.hot_band_threshold,
    )
    if cfg.hot_band_threshold is not None:
        # tiny by construction (keys above the threshold); persist so the
        # registry aggregation runs once across its two broadcast uses
        hot_bands = hot_bands.persist()

    pairs = ck.run(
        spark,
        "pairs",
        lambda: build_pairs(
            docs,
            cfg,
            hot_keys=hot_bands if cfg.hot_band_threshold is not None else None,
        ).observe(
            obs["pairs"],
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("kind") == "exact", 1).otherwise(0)).alias(
                "n_exact"
            ),
        ),
    )
    _finalize_obs("pairs")
    if isinstance(ck, NullCheckpointer):
        pairs = pairs.localCheckpoint()
    clusters = ck.run(
        spark,
        "clusters",
        lambda: assign_clusters(
            docs, pairs.filter(F.col("kind").isin(list(cluster_kinds)))
        ).join(docs.select("id", "url").hint("shuffle_hash"), "id"),
    )
    return {
        "docs": docs,
        "pairs": pairs,
        "clusters": clusters,
        "hot_bands": hot_bands,
        "observations": obs,
    }
