"""Pin q_dedup_keep_list: the C1 keep/drop decision table.

Two layers on a planted corpus (exact twins, a near-dup family containing an
exact twin, a degenerate-simhash exact pair, a null-text row, singletons):

1. transport-strict DuckDB oracle differential (the driver's compare) on the
   planted corpus — pins the full column contract incl. reasons and the
   NULL-text / blacklisted-simhash corners at fixture-forced coverage the
   driver's random testdata can't guarantee;
2. composition invariants vs an independent driver-side union-find over the
   SAME collected edge set — exactly one kept doc per cluster, keep ==
   (doc_id == cluster_id), exact twins co-clustered, reasons consistent with
   the exact-twin relation.
"""

import sys

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracles import normalize_df  # noqa: E402

from intraarchivededuplicator_spark.operators.banded_join import (  # noqa: E402
    banded_self_join,
)
from intraarchivededuplicator_spark.operators.exact import (  # noqa: E402
    exact_pairs,
    with_text_hash,
)
from intraarchivededuplicator_spark.plans import oracle as o  # noqa: E402
from intraarchivededuplicator_spark.plans.queries import (  # noqa: E402
    SIMHASH_RADIUS,
    docs_with_sig,
    q_dedup_keep_list,
)


def _planted_corpus(spark, tmp_path) -> str:
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(50)]

    def txt() -> str:
        return " ".join(vocab[i] for i in rng.randint(0, 50, 40))

    base_a = txt()
    near_a = base_a.split()
    near_a[20] = "tokX"  # one token of 40 -> few flipped shingles
    near_a = " ".join(near_a)
    rows = [
        (0, base_a, "en"),   # family A representative
        (1, near_a, "en"),   # near twin of 0 (pinned below)
        (2, base_a, "en"),   # exact twin of 0 — must read 'exact_dup'
        (3, txt(), "en"),    # singleton
        (4, "x y", "en"),    # degenerate simhash (no 3-shingle) ...
        (5, "x y", "en"),    # ... exact twin: ONLY the exact leg links them
        (6, None, "en"),     # null text: singleton on both engines
        (7, txt(), "en"),    # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_dedup_keep_list_matches_oracle_on_planted_corpus(spark, tmp_path):
    sf_dir = _planted_corpus(spark, tmp_path)
    # fixture sanity: the near twin must actually be within the radius, and
    # the degenerate pair must be invisible to the near leg
    d = docs_with_sig(spark, sf_dir)
    sig = {r["doc_id"]: r["simhash"] for r in d.collect()}
    assert 0 < bin(sig[0] ^ sig[1]).count("1") <= SIMHASH_RADIUS
    assert sig[4] == sig[5] == 0

    spdf = q_dedup_keep_list(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    opdf = con.sql(o.sql_dedup_keep_list(SIMHASH_RADIUS)).df()

    scols, skinds, srows = normalize_df(spdf)
    ocols, okinds, orows = normalize_df(opdf)
    assert scols == ocols
    for c in scols:
        assert {"int", "float"} != {skinds[c], okinds[c]}, c
    assert srows == orows and len(srows) == 8

    by_id = {r[scols.index("doc_id")]: r for r in srows}
    reason = {k: v[scols.index("reason")] for k, v in by_id.items()}
    cluster = {k: v[scols.index("cluster_id")] for k, v in by_id.items()}
    assert reason["2"] == "exact_dup" and cluster["2"] == "0"
    assert reason["1"] == "near_dup" and cluster["1"] == "0"
    assert reason["5"] == "exact_dup" and cluster["5"] == "4"
    for k in ("0", "3", "4", "6", "7"):
        assert reason[k] == "kept" and cluster[k] == k


def test_dedup_keep_list_composition(spark, tmp_path):
    sf_dir = _planted_corpus(spark, tmp_path)
    d = with_text_hash(docs_with_sig(spark, sf_dir))
    near = banded_self_join(d, "doc_id", "simhash", SIMHASH_RADIUS, blacklist=(0,))
    ex = exact_pairs(d, "doc_id", "text_hash")
    edges = [
        (r["id_lo"], r["id_hi"])
        for r in near.select("id_lo", "id_hi")
        .unionByName(ex.select("id_lo", "id_hi"))
        .collect()
    ]
    assert edges

    universe = [r["doc_id"] for r in d.select("doc_id").collect()]
    parent = {v: v for v in universe}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for v in universe:
        comp.setdefault(find(v), []).append(v)
    expect_cluster = {v: min(m) for m in comp.values() for v in m}

    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
        for r in q_dedup_keep_list(spark, sf_dir).collect()
    }
    assert set(got) == set(universe)
    kept_per_cluster = {}
    for doc_id, (cid, keep, reason) in got.items():
        assert cid == expect_cluster[doc_id]
        assert keep == (doc_id == cid)
        assert (reason == "kept") == keep
        if keep:
            kept_per_cluster[cid] = kept_per_cluster.get(cid, 0) + 1
    assert all(n == 1 for n in kept_per_cluster.values())
    assert set(kept_per_cluster) == set(expect_cluster.values())


def test_dedup_funnel_on_planted_corpus(spark, tmp_path):
    """q_dedup_funnel == transport-strict oracle on the planted corpus (all
    three reasons present by construction), and == a Python groupBy over
    the gated keep-list output."""
    from intraarchivededuplicator_spark.plans.queries import q_dedup_funnel

    sf_dir = _planted_corpus(spark, tmp_path)
    spdf = q_dedup_funnel(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    opdf = con.sql(o.sql_dedup_funnel(SIMHASH_RADIUS)).df()
    scols, skinds, srows = normalize_df(spdf)
    ocols, okinds, orows = normalize_df(opdf)
    assert scols == ocols and srows == orows
    for c in scols:
        assert {"int", "float"} != {skinds[c], okinds[c]}, c
    # 8 planted docs -> 5 kept, 2 exact_dup, 1 near_dup
    counts = {
        r["reason"]: r["n_docs"]
        for r in q_dedup_funnel(spark, sf_dir).collect()
    }
    assert counts == {"kept": 5, "exact_dup": 2, "near_dup": 1}

    kl = q_dedup_keep_list(spark, sf_dir).toPandas()
    assert counts == kl.groupby("reason").size().to_dict()
