"""Pin the round-5 final-session curation surfaces: soft_dedup_weights
(SoftDeDup reweighting over the keep-list clusters), quality_funnel
(first-failing-rule attrition report), perplexity_buckets (CCNet
head/middle/tail by the char-bigram LM score).

Each gets (a) a transport-strict DuckDB oracle differential at sf0.001 —
the driver's own compare, at a different SF than the driver uses — and
(b) composition invariants against the already-gated surfaces they build
on (keep-list clusters, text-quality arithmetic, charlm scores).
"""

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracles import normalize_df  # noqa: E402

from intraarchivededuplicator_spark.plans import oracle as o  # noqa: E402
from intraarchivededuplicator_spark.plans import queries as q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _oracle_df(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF}/documents.parquet'"
    )
    return con.sql(sql).df()


def _oracle_df_emb(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF}/embeddings.parquet'"
    )
    return con.sql(sql).df()


def _strict_compare(spdf, opdf):
    scols, skinds, srows = normalize_df(spdf)
    ocols, okinds, orows = normalize_df(opdf)
    assert scols == ocols
    assert srows == orows
    for c in scols:
        assert {"int", "float"} != {skinds[c], okinds[c]}, c


def test_soft_dedup_weights_oracle_and_invariants(spark):
    spdf = q.q_soft_dedup_weights(spark, SF).toPandas()
    opdf = _oracle_df(o.sql_soft_dedup_weights(q.SIMHASH_RADIUS))
    _strict_compare(spdf, opdf)

    # composition: same clusters as the gated keep-list; weight arithmetic
    kl = q.q_dedup_keep_list(spark, SF).toPandas()
    assert dict(zip(spdf.doc_id, spdf.cluster_id)) == dict(
        zip(kl.doc_id, kl.cluster_id)
    )
    sizes = kl.groupby("cluster_id").size().to_dict()
    for r in spdf.itertuples():
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.weight == pytest.approx(
            round(1.0 / r.cluster_size, 6), abs=0
        )
    # per-cluster weight mass ~ 1 (exact up to the round6 per member)
    mass = spdf.groupby("cluster_id").weight.sum()
    assert all(abs(m - 1.0) < 1e-4 for m in mass)
    # kept singletons weigh exactly 1.0
    kept_single = kl[kl.reason.eq("kept")].merge(spdf, on="doc_id")
    ones = kept_single[kept_single.cluster_size.eq(1)]
    assert (ones.weight == 1.0).all() and len(ones) > 0


def test_quality_funnel_oracle_and_composition(spark):
    spdf = q.q_quality_funnel(spark, SF).toPandas()
    opdf = _oracle_df(
        o.sql_quality_funnel(
            q.STOPWORDS,
            q.FUNNEL_MIN_TOKENS,
            q.FUNNEL_MAX_STOP_RATIO,
            q.FUNNEL_MIN_DISTINCT_RATIO,
        )
    )
    _strict_compare(spdf, opdf)
    # the strict profile splits the corpus: >= 2 outcomes incl. 'passed',
    # fractions sum to ~1, counts sum to the corpus size
    assert "passed" in set(spdf.reason)
    assert len(spdf) >= 2
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert spdf.n_docs.sum() == n_docs
    assert abs(spdf.frac.sum() - 1.0) < 1e-4


def test_perplexity_buckets_oracle_and_ntile_law(spark):
    spdf = q.q_perplexity_buckets(spark, SF).toPandas()
    opdf = _oracle_df(
        o.sql_perplexity_buckets(q.CHARLM_TRAIN_MOD, q.PPL_BUCKETS)
    )
    _strict_compare(spdf, opdf)

    # composition with the gated charlm score: per lang, bucket sizes obey
    # NTILE (first buckets get the remainder) and score extents are ordered
    # head <= middle <= tail with no overlap beyond shared boundary values.
    sc = q.q_charlm_quality(spark, SF).toPandas().set_index("doc_id")
    langs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .toPandas()
        .set_index("doc_id")
    )
    joined = sc.join(langs, how="inner")
    for lang, grp in joined.groupby("lang"):
        n = len(grp)
        qsize, rem = divmod(n, q.PPL_BUCKETS)
        expect = [qsize + (1 if i < rem else 0) for i in range(q.PPL_BUCKETS)]
        rows = spdf[spdf.lang.eq(lang)].set_index("bucket")
        got = [
            int(rows.loc[b].n_docs) if b in rows.index else 0
            for b in ("head", "middle", "tail")
        ]
        assert got == expect, (lang, got, expect)
        order = [
            rows.loc[b] for b in ("head", "middle", "tail") if b in rows.index
        ]
        for a, b in zip(order, order[1:]):
            assert a.nlp_lo <= a.nlp_hi <= b.nlp_lo <= b.nlp_hi


def test_token_entropy_oracle_and_first_principles(spark):
    spdf = q.q_token_entropy(spark, SF).toPandas()
    opdf = _oracle_df(o.sql_token_entropy(q.TTR_Q))
    _strict_compare(spdf, opdf)

    # first principles: recompute the quantized entropy for a sample of docs
    from collections import Counter

    from intraarchivededuplicator_spark.functions.charlm import LP_MICRO

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(25)
        .collect()
    )
    got = spdf.set_index("doc_id")
    for r in docs:
        toks = [t for t in r.text.split() if t]
        if not toks:
            assert r.doc_id not in got.index
            continue
        cnt = Counter(toks)
        n = sum(cnt.values())
        s = sum(
            c * -LP_MICRO[max(1, (c * q.TTR_Q) // n) - 1]
            for c in cnt.values()
        )
        row = got.loc[r.doc_id]
        assert row.n_tokens == n and row.n_types == len(cnt)
        assert row.entropy_micro == s // n
        # quantized entropy tracks true entropy within the bucket error
        true_h = -sum(
            (c / n) * math.log(c / n) for c in cnt.values()
        )
        assert abs(row.entropy_micro / 1e6 - true_h) < 0.05


def test_gram_novelty_invariants(spark):
    spdf = q.q_gram_novelty_by_batch(spark, SF).toPandas()
    opdf = _oracle_df(
        o.sql_gram_novelty_by_batch(q.K_SHINGLE, q.NOVELTY_BATCH)
    )
    _strict_compare(spdf, opdf)
    first = spdf.sort_values("batch_id").iloc[0]
    assert first.batch_id == 0 and first.novelty_ratio == 1.0
    assert (spdf.n_novel <= spdf.n_grams).all()
    # sum of novel grams across batches == corpus-wide distinct gram count
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF}/documents.parquet'"
    )
    total = con.sql(
        f"WITH {o.cte_shingles(q.K_SHINGLE)} "
        "SELECT count(DISTINCT s) FROM shing"
    ).fetchone()[0]
    assert spdf.n_novel.sum() == total


def test_multi_signal_clusters_refine_single_families(spark):
    spdf = q.q_multi_signal_clusters(spark, SF).toPandas()
    opdf = _oracle_df(
        o.sql_multi_signal_clusters(
            q.SIMHASH_RADIUS, q.ORACLE_MINHASH, q.K_SHINGLE, 4, 4
        )
    )
    _strict_compare(spdf, opdf)
    multi = dict(zip(spdf.doc_id, spdf.cluster_id))
    # every single-family co-clustering survives in the union graph
    sim = q.q_simhash_clusters(spark, SF).toPandas()
    mh = q.q_minhash_dedup_clusters(spark, SF).toPandas()
    for fam in (sim, mh):
        by_cluster = fam.groupby("cluster_id").doc_id.agg(list)
        for members in by_cluster:
            assert len({multi[d] for d in members}) == 1
    # and the multi clustering is at least as coarse (<= as many clusters)
    assert spdf.cluster_id.nunique() <= min(
        sim.cluster_id.nunique(), mh.cluster_id.nunique()
    )


def test_dedup_ablation_monotone_and_consistent(spark):
    spdf = q.q_dedup_ablation(spark, SF).toPandas()
    opdf = _oracle_df(
        o.sql_dedup_ablation(
            q.SIMHASH_RADIUS, q.ORACLE_MINHASH, q.K_SHINGLE, 4, 4
        )
    )
    _strict_compare(spdf, opdf)
    s = spdf.sort_values("signals").reset_index(drop=True)
    # cumulative signals can only merge clusters: n_clusters monotone down,
    # removal monotone up
    assert (s.n_clusters.diff().dropna() <= 0).all()
    assert (s.n_removed.diff().dropna() >= 0).all()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert (s.n_clusters + s.n_removed == n_docs).all()
    # the full config equals the gated multi_signal_clusters cluster count
    multi = q.q_multi_signal_clusters(spark, SF).toPandas()
    assert s.iloc[-1].n_clusters == multi.cluster_id.nunique()
    # and the exact-only config equals the exact dup-group arithmetic
    kl = q.q_dedup_keep_list(spark, SF).toPandas()
    assert s.iloc[1].n_clusters == kl.cluster_id.nunique()


def test_ivf_cell_stats_matches_engine_assignment(spark):
    spdf = q.q_ivf_cell_stats(spark, SF).toPandas()
    opdf = _oracle_df_emb(o.sql_ivf_cell_stats(q.EMB_SCALE, 16))
    _strict_compare(spdf, opdf)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_valid = emb.filter(
        "embedding is not null and size(embedding) > 0"
    ).count()
    assert spdf.n_members.sum() == n_valid  # every vector in exactly 1 cell
    assert len(spdf) == 16
    assert (spdf.min_id <= spdf.max_id).all()


def test_anchor_text_profile_first_principles(spark):
    spdf = q.q_anchor_text_profile(spark, SF).toPandas()
    opdf = _oracle_df(o.sql_anchor_text_profile(q.ANCHOR_TERMS))
    _strict_compare(spdf, opdf)
    # independent Python replay of the plant
    from collections import Counter

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    cnt = Counter()
    for did in ids:
        for j in range(did % 4):
            dst = f"site{(did * 7 + j * 13) % 20}.example.com"
            term = f"t{(did + j * 17) % q.ANCHOR_TERMS}"
            cnt[(dst, term)] += 1
    by_dom = {}
    for (dst, term), c in cnt.items():
        by_dom.setdefault(dst, []).append((term, c))
    for r in spdf.itertuples():
        terms = by_dom[r.dst_domain]
        assert r.n_inlinks == sum(c for _, c in terms)
        assert r.n_unique_terms == len(terms)
        best = min(terms, key=lambda tc: (-tc[1], int(tc[0][1:])))
        assert (r.top_term, r.top_term_count) == best


def test_simhash_pair_precision_consistency(spark):
    spdf = q.q_simhash_pair_precision(spark, SF).toPandas()
    opdf = _oracle_df(
        o.sql_simhash_pair_precision(
            q.SIMHASH_RADIUS, q.K_SHINGLE, q.PRECISION_TAU
        )
    )
    _strict_compare(spdf, opdf)
    # same pair set as the gated radius pairs, same distances
    rp = q.q_simhash_radius_pairs(spark, SF).toPandas()
    assert set(zip(spdf.id_lo, spdf.id_hi, spdf.distance)) == set(
        zip(rp.id_lo, rp.id_hi, rp.distance)
    )
    assert ((spdf.exact_jaccard >= 0) & (spdf.exact_jaccard <= 1)).all()
    assert (spdf.is_tp == (spdf.exact_jaccard >= q.PRECISION_TAU)).all()


def test_domain_dup_affinity_totals(spark):
    spdf = q.q_domain_dup_affinity(spark, SF).toPandas()
    opdf = _oracle_df(o.sql_domain_dup_affinity(q.SIMHASH_RADIUS))
    _strict_compare(spdf, opdf)
    rp = q.q_simhash_radius_pairs(spark, SF).toPandas()
    assert spdf.n_pairs.sum() == len(rp)
    assert abs(spdf.frac.sum() - 1.0) < 1e-4


def test_cluster_diameter_stats_chaining_law(spark):
    spdf = q.q_cluster_diameter_stats(spark, SF).toPandas()
    opdf = _oracle_df(o.sql_cluster_diameter_stats(q.SIMHASH_RADIUS))
    _strict_compare(spdf, opdf)
    cl = q.q_simhash_clusters(spark, SF).toPandas()
    sizes = cl.groupby("cluster_id").size()
    multi = sizes[sizes >= 2]
    # exactly the multi-member clusters appear, with matching sizes
    assert set(spdf.cluster_id) == set(multi.index)
    assert dict(zip(spdf.cluster_id, spdf.n_members)) == multi.to_dict()
    # pair-connected members bound the diameter from below by the radius
    # only via chaining: clusters of size 2 can never be chained (their
    # single pair IS a radius pair)
    two = spdf[spdf.n_members.eq(2)]
    assert (~two.chained).all()
    assert (spdf.chained == (spdf.diameter > q.SIMHASH_RADIUS)).all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_surface_plan_shapes(spark):
    """Scale-shape pins for the final-session queries: the heavy paths keep
    partial aggregation and bounded exchanges; the only SinglePartition
    exchanges are the bounded-by-construction funnel/summary windows
    (<= 4 reason rows, <= 2 scope rows)."""
    # token_entropy: lp table broadcast-joined, no SinglePartition anywhere
    p = _plan(q.q_token_entropy(spark, SF))
    assert "BroadcastHashJoin" in p  # the 1024-row lp table
    assert "SinglePartition" not in p
    # gram_novelty: two hash aggregates over the gram key, no broadcast of
    # the unbounded gram dictionary, no SinglePartition
    p = _plan(q.q_gram_novelty_by_batch(spark, SF))
    assert "SinglePartition" not in p
    assert "BroadcastHashJoin" not in p  # gram df table must NOT broadcast
    # anchor_text_profile: pure aggregation path — no window, no
    # SinglePartition (argmax is max(struct), not a rank window)
    p = _plan(q.q_anchor_text_profile(spark, SF))
    assert "SinglePartition" not in p
    assert "Window" not in p
    # soft_dedup_weights: the size join must not plan a broadcast of the
    # cluster-size table (unbounded at corpus scale) on the weights leg
    p = _plan(q.q_soft_dedup_weights(spark, SF))
    assert "ShuffledHashJoin" in p
    # funnels: the ONLY SinglePartition window is over the bounded
    # reason/scope aggregate (downstream of the groupBy, never the corpus)
    for fn in (q.q_quality_funnel, q.q_domain_dup_affinity):
        p = _plan(fn(spark, SF))
        agg_pos = p.find("SinglePartition")
        assert agg_pos != -1  # bounded-by-construction total window


def test_closing_surface_plan_shapes(spark):
    """Scale-shape pins for the closing-session queries: every window is
    doc-/vector-partitioned (no SinglePartition exchange anywhere — these
    run over the unbounded corpus), and the bounded-output rollups stay
    pure aggregation paths."""
    for fn in (
        q.q_dup_span_stats,
        q.q_dup_span_removal,
        q.q_ann_recall_audit,
        q.q_lsh_recall_audit,
        q.q_minhash_recall_audit,
    ):
        p = _plan(fn(spark, SF))
        assert "SinglePartition" not in p, fn.__name__
    # bounded rollups: aggregation only — no rank window, no SinglePartition
    for fn in (
        q.q_pack_efficiency,
        q.q_source_quality_rollup,
        q.q_lineitem_pricing_summary,
    ):
        p = _plan(fn(spark, SF))
        assert "SinglePartition" not in p, fn.__name__
        assert "Window" not in p, fn.__name__
    # shard_balance: the ONLY SinglePartition is the share window over the
    # bounded N_SHARDS aggregate (downstream of the groupBy, never the
    # corpus) — the funnel discipline
    p = _plan(q.q_shard_balance(spark, SF))
    agg_pos = p.find("HashAggregate")
    sp_pos = p.find("SinglePartition")
    assert sp_pos != -1 and agg_pos != -1
    assert p.count("SinglePartition") <= 2  # the one bounded window
