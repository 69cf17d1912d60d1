"""End-to-end pipeline on the synthetic corpus: the golden-state layer.

Mirrors the reference's end-to-end archive tests
(/root/reference/Tests/Test_DuplicateArchiveDetector.py:64-442): run the full
pipeline, then assert cluster semantics + the BASELINE recall target
(dup-pair recall >= 0.99 vs the brute-force oracle at identical config).
"""

import pytest
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.config import DedupConfig
from intraarchivededuplicator_spark.engine.pipeline import (
    build_pairs,
    compute_docs,
    dedup_pipeline,
)
from intraarchivededuplicator_spark.fixtures.synth import gen_pages
from intraarchivededuplicator_spark.operators.banded_join import brute_force_pairs
from intraarchivededuplicator_spark.operators.containment import (
    containment_pairs,
    containment_pairs_bruteforce,
)

CFG = DedupConfig(hot_band_threshold=100, hot_band_salt=4)
N_ROWS = 800


@pytest.fixture(scope="module")
def corpus(spark):
    c = gen_pages(N_ROWS, seed=42)
    pages = spark.createDataFrame(c.pages)
    truth = spark.createDataFrame(c.truth)
    return pages, truth, c


@pytest.fixture(scope="module")
def result(spark, corpus):
    pages, truth, _ = corpus
    out = dedup_pipeline(spark, pages, CFG)
    out["docs"] = out["docs"].cache()
    out["pairs"] = out["pairs"].cache()
    out["clusters"] = out["clusters"].cache()
    return out


def test_extraction_invariant(spark, corpus, result):
    """Extracted text == ground-truth text for every url (byte-identical)."""
    pages, _, c = corpus
    got = {
        r["url"]: r["text"] for r in result["docs"].select("url", "text").collect()
    }
    for url, text in zip(c.pages["url"], c.pages["text"]):
        assert got[url] == text


def test_recall_vs_bruteforce_oracle(spark, result):
    """BASELINE target: dup-pair recall >= 0.99 vs the O(n^2) oracle at the
    same signature config, measured the way the north rule states it — both
    ends of every true in-radius pair share a cluster_id. (With exact_first
    canonicalization the pairs table stores star edges + rep-level fuzzy
    pairs, so pair-set equality is not the contract; connectivity is.) The
    banded join is exact by pigeonhole, so this must be 1.0."""
    docs = result["docs"]
    truth_pairs = brute_force_pairs(
        docs.filter(
            ~F.col("simhash").isin(list(CFG.blacklist)) & (F.col("n_tokens") > 0)
        ),
        "id",
        "simhash",
        CFG.simhash_radius,
    )
    t = {(r["id_lo"], r["id_hi"]) for r in truth_pairs.collect()}
    cl = {r["id"]: r["cluster_id"] for r in result["clusters"].collect()}
    assert len(t) > 0
    same = sum(1 for a, b in t if cl[a] == cl[b])
    recall = same / len(t)
    assert recall >= 0.99, f"recall {recall}"
    assert recall == 1.0  # banded join is exact by pigeonhole


def test_exact_dups_clustered(spark, corpus, result):
    _, truth, _ = corpus
    joined = (
        result["clusters"]
        .join(truth, "url")
        .select("url", "cluster_id", "dup_class", "base_url")
        .cache()
    )
    cl = {r["url"]: r["cluster_id"] for r in joined.collect()}
    ex = truth.filter(F.col("dup_class") == "exact_dup").collect()
    assert len(ex) > 0
    for r in ex:
        assert cl[r["url"]] == cl[r["base_url"]], r["url"]


def test_near_dups_clustered(spark, corpus, result):
    """Near dups whose SimHash landed within the radius must share a cluster."""
    _, truth, _ = corpus
    docs = result["docs"]
    cl = {r["url"]: r["cluster_id"] for r in result["clusters"].collect()}
    # under exact_first, signatures live on each text_hash group's
    # representative row; members resolve via rep_id
    rows = docs.select("id", "url", "rep_id", "simhash").collect()
    by_id = {r["id"]: r["simhash"] for r in rows}
    sigs = {r["url"]: by_id[r["rep_id"]] for r in rows}
    from intraarchivededuplicator_spark.functions.hashing import hamming64

    nd = truth.filter(F.col("dup_class") == "near_dup").collect()
    assert len(nd) > 0
    in_radius = 0
    for r in nd:
        if hamming64(sigs[r["url"]], sigs[r["base_url"]]) <= CFG.simhash_radius:
            in_radius += 1
            assert cl[r["url"]] == cl[r["base_url"]], r["url"]
    assert in_radius > 0  # fixture produces in-radius near dups


def test_containment_clustered(spark, corpus, result):
    _, truth, _ = corpus
    cl = {r["url"]: r["cluster_id"] for r in result["clusters"].collect()}
    co = truth.filter(F.col("dup_class") == "containment").collect()
    assert len(co) > 0
    for r in co:
        assert cl[r["url"]] == cl[r["base_url"]], r["url"]


def test_degenerate_and_template_clones_not_merged(spark, corpus, result):
    """degenerate docs (blacklisted sig) and template clones must NOT form
    giant clusters (P9 semantics, ProcessArchive.py:21-27; template_clone
    guards extraction correctness)."""
    _, truth, _ = corpus
    joined = result["clusters"].join(truth, "url")
    deg = joined.filter(F.col("dup_class") == "degenerate")
    # every degenerate doc is its own singleton cluster
    n_deg = deg.count()
    assert n_deg > 0
    assert deg.select("cluster_id").distinct().count() == n_deg
    tc = joined.filter(F.col("dup_class") == "template_clone")
    n_tc = tc.count()
    assert n_tc > 0
    assert tc.select("cluster_id").distinct().count() == n_tc


def test_hot_cluster_single_component(spark, corpus, result):
    _, truth, _ = corpus
    joined = result["clusters"].join(truth, "url")
    hot = joined.filter(F.col("dup_class") == "hot_cluster")
    assert hot.count() > 10
    assert hot.select("cluster_id").distinct().count() == 1


def test_cluster_assignments_match_ground_truth_components(spark, corpus, result):
    """Partition equality on the confirmed relations: two docs share a
    pipeline cluster iff they share a ground-truth component, restricted to
    classes whose relations are deterministic (exact/containment/hot)."""
    _, truth, _ = corpus
    joined = (
        result["clusters"]
        .join(truth, "url")
        .filter(F.col("dup_class").isin(["unique", "exact_dup", "containment", "hot_cluster"]))
        .select("cluster_id", "cluster_gt")
    ).collect()
    # pipeline clusters must refine-or-equal gt: same gt -> same cluster
    by_gt = {}
    for r in joined:
        by_gt.setdefault(r["cluster_gt"], set()).add(r["cluster_id"])
    for gt, cls in by_gt.items():
        assert len(cls) == 1, f"gt component {gt} split into {len(cls)} clusters"


def test_containment_operator_differential(spark, corpus):
    pages, _, _ = corpus
    docs = compute_docs(pages, CFG).select("id", "text").cache()
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(docs, "id", "text", CFG.k_shingle).collect()
    }
    expect = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs_bruteforce(docs, "id", "text").collect()
    }
    assert len(expect) > 0
    assert got == expect


def test_containment_winnowed_differential(spark, corpus):
    """winnow_w shrinks the df/anchor exchange ~4.5x but must emit the
    IDENTICAL pair set (deterministic interior-anchor guarantee,
    hashing.winnow_split): differential vs the O(n^2) oracle on the synth
    corpus (min 200 tokens >> winnow_w + k + 1)."""
    pages, _, _ = corpus
    docs = compute_docs(pages, CFG).select("id", "text").cache()
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(
            docs, "id", "text", CFG.k_shingle, winnow_w=8
        ).collect()
    }
    expect = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs_bruteforce(docs, "id", "text").collect()
    }
    assert len(expect) > 0
    assert got == expect


def test_containment_winnowed_via_pipeline_columns(spark, corpus):
    """cfg.containment_winnow_w routes the kernel-precomputed win_interior /
    win_boundary columns through compute_docs into containment_pairs; the
    pair set must match the non-winnowed default path."""
    pages, _, _ = corpus
    cfg_w = DedupConfig(
        hot_band_threshold=100, hot_band_salt=4, containment_winnow_w=8
    )
    docs = compute_docs(pages, cfg_w).cache()
    assert "win_interior" in docs.columns and "win_boundary" in docs.columns
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(
            docs,
            "id",
            "text",
            cfg_w.k_shingle,
            shingle_col="shingle_hashes",
            winnow_interior_col="win_interior",
            winnow_boundary_col="win_boundary",
        ).collect()
    }
    expect = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs_bruteforce(
            docs.select("id", "text"), "id", "text"
        ).collect()
    }
    assert len(expect) > 0
    assert got == expect


def test_containment_winnowed_midtoken_boundary(spark):
    """Mid-token cut + winnowing: the perturbed first/last shingle can only
    poison the first/last window's selection, which winnow_split quarantines
    to the boundary slice — anchors stay interior, so the pair is found."""
    words = [f"w{i:02d}" for i in range(60)]
    outer = " ".join(words)
    inner = outer[2:-2]  # cut mid-token at BOTH ends
    rows = [(1, inner), (2, outer), (3, inner)]
    docs = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(docs, "id", "text", 5, winnow_w=5).collect()
    }
    assert (1, 2) in got and (3, 2) in got


def test_containment_boundary_anchor_not_missed(spark):
    """ADVICE r2 regression: with a single min-df anchor, a mid-token cut
    whose boundary shingle gains df>=2 from a THIRD doc (here: an exact copy
    of the inner) becomes the rarest anchor — it is absent from the outer, so
    the true (inner, outer) pair was silently missed. Multi-anchor candidacy
    (slack+1 = 3 rarest df>=2 shingles; containment.py's constant
    boundary-slack argument) must recover it."""
    words = [f"w{i:02d}" for i in range(40)]
    outer = " ".join(words)
    inner = outer[2:]  # cut mid-token: first token becomes '00' -> boundary
    rows = [
        (1, inner),      # inner candidate
        (2, outer),      # true container
        (3, inner),      # exact copy: boundary shingles now df>=2 but the
                         # copy is not a valid outer (equal length)
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(docs, "id", "text", 5).collect()
    }
    assert (1, 2) in got and (3, 2) in got


def test_checkpoint_resume(spark, corpus, tmp_path):
    """Stage outputs are reused on resume (S4 incremental-skip analog)."""
    from intraarchivededuplicator_spark.engine.checkpoint import StageCheckpointer

    pages, _, _ = corpus
    small = pages.limit(100)
    ck1 = StageCheckpointer(root=str(tmp_path))
    out1 = dedup_pipeline(spark, small, CFG, checkpointer=ck1)
    n1 = out1["clusters"].count()
    assert all(not m["resumed"] for m in ck1.metrics)
    assert all(m["output_rows"] > 0 for m in ck1.metrics)
    assert all("partitions" in m for m in ck1.metrics)

    ck2 = StageCheckpointer(root=str(tmp_path))
    out2 = dedup_pipeline(spark, small, CFG, checkpointer=ck2)
    assert all(m["resumed"] for m in ck2.metrics)
    assert out2["clusters"].count() == n1
    # ADVICE r2: resumed stages must expose sidecar counters, not a live
    # Observation whose .get would block forever (no action ever ran)
    for stage in ("docs", "pairs"):
        got = out2["observations"][stage].get
        assert got["resumed"] and got["output_rows"] > 0

    # config change invalidates the checkpoint
    ck3 = StageCheckpointer(root=str(tmp_path))
    out3 = dedup_pipeline(
        spark, small, DedupConfig(simhash_radius=2), checkpointer=ck3
    )
    assert all(not m["resumed"] for m in ck3.metrics)


def test_observation_progress_counters(spark, corpus, result):
    """A10: pipeline stages expose Observation metrics that rode the normal
    materializing actions (no extra jobs)."""
    obs = result["observations"]
    d = obs["docs"].get
    p = obs["pairs"].get
    assert d["n_docs"] == result["docs"].count()
    assert d["n_signed"] <= d["n_docs"]
    assert p["n_pairs"] == result["pairs"].count()
    assert 0 < p["n_exact"] <= p["n_pairs"]


def test_junk_rep_election(spark):
    """ADVICE r2 / VERDICT r2 #5: when the min-id member of an exact group is
    URL-junk (junk rules see the url, which differs within a byte-identical
    group), the representative must still be a NON-junk member — otherwise the
    whole group silently loses fuzzy matching and the junk doc leaks into the
    pairs table via star edges."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the farmer watches from the old wooden fence nearby today"
    )
    near = base.replace("today", "tonight")
    junk_urls = [f"http://j{i}.example.com/style.css" for i in range(50)]
    live_url = "http://live.example.com/article"
    partner_url = "http://other.example.com/article"
    # pick a junk url whose xxhash64 id sorts BELOW the live member's id so
    # the junk member would win a junk-unaware min-id election
    ids = {
        r["u"]: r["h"]
        for r in spark.createDataFrame(
            [(u,) for u in junk_urls + [live_url, partner_url]], "u string"
        )
        .select("u", F.xxhash64("u").alias("h"))
        .collect()
    }
    junk_url = min(junk_urls, key=lambda u: ids[u])
    assert ids[junk_url] < ids[live_url], "fixture assumption broke"

    pages = spark.createDataFrame(
        [(junk_url, base), (live_url, base), (partner_url, near)],
        "url string, text string",
    )
    out = dedup_pipeline(spark, pages, CFG, extract=False)
    docs = {r["url"]: r.asDict() for r in out["docs"].collect()}
    # the live member, not the lower-id junk one, is the group rep and signed
    assert docs[live_url]["rep_id"] == docs[live_url]["id"]
    assert docs[live_url]["simhash"] is not None
    assert docs[junk_url]["simhash"] is None
    # the junk doc appears in NO pair; the live group still fuzzy-matches
    pair_rows = out["pairs"].collect()
    pair_ids = {r["id_lo"] for r in pair_rows} | {r["id_hi"] for r in pair_rows}
    assert ids[junk_url] not in pair_ids
    fuzzy = {
        (r["id_lo"], r["id_hi"])
        for r in pair_rows
        if r["kind"] in ("simhash", "jaccard", "containment", "minhash")
    }
    a, b = sorted((ids[live_url], ids[partner_url]))
    assert (a, b) in fuzzy
    out["docs"].unpersist()
    out["pairs"].unpersist()


def test_containment_shuffle_anchor_branch_differential(spark, corpus):
    """broadcast_anchors=False is the documented 10^9+-doc plan (both sides
    of the anchor join shuffle-partition on the shingle hash instead of
    broadcasting the inner/passing tables). It must emit the IDENTICAL pair
    set as the default broadcast branch — otherwise the scale fallback is
    dead code that fails only at 10^9 docs (VERDICT r4 "What's wrong" #2)."""
    pages, _, _ = corpus
    docs = compute_docs(pages, CFG).select("id", "text").cache()
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(
            docs, "id", "text", CFG.k_shingle, broadcast_anchors=False
        ).collect()
    }
    expect = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(docs, "id", "text", CFG.k_shingle).collect()
    }
    assert len(expect) > 0
    assert got == expect
