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
