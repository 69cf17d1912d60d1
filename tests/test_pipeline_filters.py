"""Pin the LLM-pipeline filter queries on planted corpora where the expected
values are hand-computable: contamination_overlap (decontamination n-gram
check) and doc_repetition_stats (Gopher-style repetition signals)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from intraarchivededuplicator_spark.plans.queries import (  # noqa: E402
    CONTAM_PROBE_MOD,
    K_SHINGLE,
    q_contamination_overlap,
    q_doc_repetition_stats,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_contamination_overlap_planted(spark, tmp_path):
    """Probe doc 0 (0 % 11 == 0) shares an exact K_SHINGLE-token run with
    corpus doc 1 (one shared shingle) and a longer run with doc 2 (three
    shared shingles, distinct-counted once each); doc 3 shares nothing;
    doc 4 is shorter than K_SHINGLE tokens and can never appear. Probe
    self-rows are excluded. Note 11 % 11 == 0 would make doc 11 a probe —
    ids stay below CONTAM_PROBE_MOD except the probe itself."""
    assert CONTAM_PROBE_MOD == 11 and K_SHINGLE == 5
    run5 = "p1 p2 p3 p4 p5"            # one shared 5-shingle
    run7 = "q1 q2 q3 q4 q5 q6 q7"      # 7 tokens -> 3 shared 5-shingles
    rows = [
        (0, f"{run5} z1 z2 {run7}", "en"),            # the probe
        (1, f"a1 a2 {run5} a3 a4", "en"),
        (2, f"b1 {run7} b2", "en"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8", "en"),
        (4, "d1 d2 d3", "en"),                         # < K_SHINGLE tokens
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r["corpus_id"], r["probe_id"]): r["n_shared"]
        for r in q_contamination_overlap(spark, sf_dir).collect()
    }
    assert got == {(1, 0): 1, (2, 0): 3}


def test_doc_repetition_stats_planted(spark, tmp_path):
    """doc 0 'a b a b a b': 2-grams {a b: 3, b a: 2} -> n=5, top=0.6;
    3-grams {a b a: 2, b a b: 2} -> every occurrence repeated -> dup=1.0.
    doc 1 all-distinct tokens: top 2-gram frac = 1/5, dup 3-gram frac = 0.
    doc 2 has only two tokens (no 3-gram) and is omitted."""
    rows = [
        (0, "a b a b a b", "en"),
        (1, "t1 t2 t3 t4 t5 t6", "en"),
        (2, "x y", "en"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["n_2grams"], r["top_2gram_frac"], r["dup_3gram_frac"])
        for r in q_doc_repetition_stats(spark, sf_dir).collect()
    }
    assert set(got) == {0, 1}
    assert got[0] == (5, 0.6, 1.0)
    assert got[1] == (5, 0.2, 0.0)


def test_canonical_url_stacked_corners(spark):
    """Pin canonical_url on inputs that stack MULTIPLE variants at once and
    on the separator-repair corners the gated plant (one variant per row)
    cannot reach: utm-first + kept param, utm-only, utm-last, fragment after
    query, https + :80 + uppercase + trailing slash together."""
    from intraarchivededuplicator_spark.functions.urlnorm import canonical_url

    cases = [
        # everything at once
        ("HTTPS://WWW.Ex.COM:80/A/B/?utm_source=x#frag",
         "http://www.ex.com/A/B"),
        # utm first, real param kept: '&b=2' promoted to '?b=2'
        ("http://ex.com/p?utm_a=1&b=2", "http://ex.com/p?b=2"),
        # utm only -> bare path
        ("http://ex.com/p?utm_a=1&utm_b=2", "http://ex.com/p"),
        # utm last after a kept param
        ("http://ex.com/p?b=2&utm_a=1", "http://ex.com/p?b=2"),
        # fragment strips before anything else
        ("http://ex.com/p?b=2#sec?utm_a=1", "http://ex.com/p?b=2"),
        # path case preserved; :80 only dropped at end of authority
        ("http://Ex.Com/Path:80/X", "http://ex.com/Path:80/X"),
        # no-op
        ("http://ex.com/p?b=2", "http://ex.com/p?b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    ).select("i", canonical_url(F.col("url")).alias("c"))
    got = {r["i"]: r["c"] for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])

    import duckdb

    from intraarchivededuplicator_spark.plans import oracle as o

    # the oracle's RE2 pipeline must agree on the same stacked corners:
    # lift its c1..c8 chain by substituting a VALUES table for u0
    sql = o.sql_url_canonicalize()
    head, tail = sql.split("c1 AS", 1)
    vals = ", ".join(
        f"({i}, '{u}')" for i, (u, _) in enumerate(cases)
    )
    lifted = (
        f"WITH u0(doc_id, url) AS (VALUES {vals}),\nc1 AS" + tail
    )
    con = duckdb.connect(":memory:")
    rows = con.execute(lifted).fetchall()
    for i, _, c, _ in rows:
        assert c == cases[i][1], (i, cases[i][0], c)


def test_distinct_shingle_kernel_matches_hof(spark):
    """The Arrow distinct-shingle kernel must emit exactly the rows the
    interpreted HOF pipeline (tokens -> token_shingles -> array_distinct ->
    explode) emits — on the real sf0.001 corpus AND on corners the corpus
    lacks: null text, empty text, < k tokens, exactly k tokens, repeated
    shingles, and multi-whitespace runs."""
    from pyspark.sql import functions as F2

    from intraarchivededuplicator_spark.functions.columns import (
        token_shingles,
        tokens,
    )
    from intraarchivededuplicator_spark.functions.shingle_kernel import (
        distinct_shingles,
    )
    from intraarchivededuplicator_spark.plans import queries as q

    k = 4
    corners = [
        (1000, None),
        (1001, ""),
        (1002, "one two three"),  # k-1 tokens
        (1003, "one two three four"),  # exactly k
        (1004, "a b c d a b c d a b c d"),  # repeated shingles
        (1005, "x\t\ty   z\n w v"),  # whitespace runs
    ]
    base = q.load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(corners, "doc_id long, text string")
    d = base.unionByName(extra)

    hof = d.select(
        "doc_id",
        F2.explode(F2.array_distinct(token_shingles(tokens("text"), k))).alias(
            "s"
        ),
    )
    got = sorted(map(tuple, distinct_shingles(d, k).collect()))
    want = sorted(map(tuple, hof.collect()))
    assert got == want and len(got) > 0


def test_domain_quota_topk_semantics(spark):
    """Independent recompute of the per-domain quota: rank docs per source by
    (passes_quality DESC, n_tokens DESC, doc_id), keep k — using the already
    gate-proven q_text_quality output as the quality truth, so this pins the
    quota/ranking layer specifically. Also pins the scale shape: the
    executed plan must contain a PARTIAL WindowGroupLimit below the exchange
    (the map-side top-k that keeps a spam domain from flooding the sort)."""
    import collections

    from intraarchivededuplicator_spark.plans import queries as q

    sf = "/root/testdata/sf0.001"
    k = 3
    df = q.q_domain_quota_topk(spark, sf, k=k)
    got = [
        (r["source"], r["doc_id"], r["n_tokens"], r["passes_quality"], r["quota_rank"])
        for r in df.collect()
    ]
    quality = {
        r["doc_id"]: (r["passes_quality"], r["n_tokens"])
        for r in q.q_text_quality(spark, sf).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in q.load(spark, sf, "documents").select("doc_id", "source").collect()
    }
    per = collections.defaultdict(list)
    for doc_id, (passes, n_tok) in quality.items():
        # sort key: passes DESC, n_tokens DESC, doc_id ASC
        per[src[doc_id]].append((not passes, -n_tok, doc_id))
    want = []
    for s, rows in per.items():
        for rank, (inv_p, neg_t, doc_id) in enumerate(sorted(rows)[:k], start=1):
            want.append((s, doc_id, -neg_t, not inv_p, rank))
    assert sorted(got) == sorted(want)
    assert all(len(v) > k for v in per.values())  # the quota actually bites

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_url_latest_snapshot_argmax(spark):
    """Independent Python recompute of the latest-capture argmax (the gate
    only proves Spark == DuckDB; this pins both against first principles),
    plus: the winning spelling must VARY across groups — the group-index
    rotation in ts_sec is load-bearing, otherwise the argmax would only ever
    be exercised on one of the 4 planted variants."""
    import collections

    from intraarchivededuplicator_spark.plans import queries as q

    sf = "/root/testdata/sf0.001"
    got = {
        r["canonical_url"]: (r["n_captures"], r["latest_doc_id"], r["latest_ts_sec"])
        for r in q.q_url_latest_snapshot(spark, sf).collect()
    }
    ids = [
        r["doc_id"]
        for r in q.load(spark, sf, "documents").select("doc_id").collect()
    ]
    groups = collections.defaultdict(list)
    for i in ids:
        base = i - i % 4
        canon = f"http://site{base % 20}.example.com/Docs/{base}"
        ts = base * 61 + ((i // 4 + (i % 4) * 3) % 4) * 13 + 86400
        groups[canon].append((ts, i))
    assert set(got) == set(groups)
    winners = set()
    for canon, members in groups.items():
        ts, i = max(members)
        assert got[canon] == (len(members), i, ts), canon
        winners.add(i % 4)
    assert winners == {0, 1, 2, 3}


def test_url_revisit_diff_first_principles(spark):
    """Independent Python recompute of the revisit change counts (the gate
    only proves Spark == DuckDB; this pins both against first principles),
    plus: the per-group transition PATTERN must vary across groups — the
    time rotation means different groups see changes at different visit
    positions, so the lag comparison isn't exercised on one fixed sequence."""
    import collections

    from intraarchivededuplicator_spark.plans import queries as q

    sf = "/root/testdata/sf0.001"
    got = {
        r["canonical_url"]: (r["n_captures"], r["n_changes"], r["change_ratio"])
        for r in q.q_url_revisit_diff(spark, sf).collect()
    }
    ids = [
        r["doc_id"]
        for r in q.load(spark, sf, "documents").select("doc_id").collect()
    ]
    groups = collections.defaultdict(list)
    for i in ids:
        base = i - i % 4
        canon = f"http://site{base % 20}.example.com/Docs/{base}"
        ts = base * 61 + ((i // 4 + (i % 4) * 3) % 4) * 13 + 86400
        groups[canon].append((ts, 1 if i % 4 in (0, 3) else 0))
    assert set(got) == set(groups)
    patterns = set()
    for canon, caps in groups.items():
        vs = [v for _, v in sorted(caps)]
        chg = [int(a != b) for a, b in zip(vs, vs[1:])]
        n_changes = sum(chg)
        ratio = round(n_changes / (len(vs) - 1), 6) + 0.0 if len(vs) > 1 else 0.0
        assert got[canon] == (len(vs), n_changes, ratio), canon
        if len(chg) == 3:
            patterns.add(tuple(chg))
    assert len(patterns) >= 2  # rotation varies the transition pattern


def test_stratified_sample_plan_and_values(spark):
    """The per-stratum reservoir must (a) push a PARTIAL WindowGroupLimit
    below the exchange — the O(k x strata) shuffle guarantee — and
    (b) match an independent Python recompute of the md5-ordered top-k
    per (lang, band) stratum."""
    import collections
    import hashlib

    from intraarchivededuplicator_spark.plans import queries as q

    sf = "/root/testdata/sf0.001"
    df = q.q_stratified_sample(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan

    got = {
        (r["lang"], r["band"], r["doc_id"], r["samp_rank"])
        for r in df.collect()
    }
    rows = q.load(spark, sf, "documents").select("doc_id", "lang", "text").collect()
    lo, hi = q.STRATA_BANDS
    strata = collections.defaultdict(list)
    for r in rows:
        n_tok = len([t for t in __import__("re").split(r"\s+", r["text"]) if t])
        band = "short" if n_tok < lo else ("medium" if n_tok < hi else "long")
        key = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        strata[(r["lang"], band)].append((key, r["doc_id"]))
    want = set()
    for (lang, band), members in strata.items():
        for rank, (_, did) in enumerate(sorted(members)[: q.STRATA_K], start=1):
            want.add((lang, band, did, rank))
    assert got == want
    assert any(len(v) > q.STRATA_K for v in strata.values())  # k actually bites


def test_langid_confusion_conserves_and_inverts(spark):
    """The confusion matrix must be the exact inversion of the two gated
    parents (labels x q_langid_heuristic): cells recomputed in Python,
    per-label shares summing to 1, doc totals conserved."""
    import collections

    from intraarchivededuplicator_spark.plans import queries as q

    sf = "/root/testdata/sf0.001"
    labels = {
        r["doc_id"]: r["lang"]
        for r in q.load(spark, sf, "documents").select("doc_id", "lang").collect()
    }
    pred = {
        r["doc_id"]: r["lang_guess"]
        for r in q.q_langid_heuristic(spark, sf).collect()
    }
    want = collections.Counter((labels[d], pred[d]) for d in labels)
    got = {}
    shares = collections.defaultdict(float)
    for r in q.q_langid_confusion(spark, sf).collect():
        got[(r["lang"], r["lang_guess"])] = r["n_docs"]
        shares[r["lang"]] += r["label_share"]
        assert r["is_correct"] == (r["lang"] == r["lang_guess"])
    assert got == dict(want)
    assert sum(got.values()) == len(labels)
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-5, (lang, s)
