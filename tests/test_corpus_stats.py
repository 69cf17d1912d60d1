"""First-principles pins for the corpus-profiling queries added in round 5:
dup_gram_stats (cross-doc duplicated-shingle coverage), length_quantiles
(exact discrete per-lang quantiles) and minhash_dedup_clusters (the third
member of the clustering trio). Each is recomputed in pure Python from the
sf0.001 parquet, independent of both the Spark plan and the DuckDB oracle."""

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from intraarchivededuplicator_spark.functions.hashing import (
    minhash_sig,
    shingles,
    tokenize,
)
from intraarchivededuplicator_spark.plans import queries as q

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_dup_gram_stats_first_principles(spark):
    """Per-doc distinct K_SHINGLE grams, corpus df, dup count + ratio — all
    recomputed from the raw text with the documented Python twins of the
    engine's kernel."""
    pdf = _docs()[["doc_id", "text"]]
    per_doc: dict[int, set[str]] = {}
    for r in pdf.itertuples():
        gs = set(shingles(tokenize(r.text), q.K_SHINGLE))
        if gs:
            per_doc[int(r.doc_id)] = gs
    df: dict[str, int] = {}
    for gs in per_doc.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    want = {
        d: (len(gs), sum(1 for g in gs if df[g] >= 2))
        for d, gs in per_doc.items()
    }

    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_gram_ratio"])
        for r in q.q_dup_gram_stats(spark, SF).collect()
    }
    assert set(got) == set(want)
    for d, (n, dup) in want.items():
        gn, gd, gr = got[d]
        assert (gn, gd) == (n, dup), d
        assert gr == pytest.approx(round(dup / n, 6))
    # the corpus must exercise both sides of the df>=2 predicate
    assert any(dup > 0 for _, dup in want.values())
    assert any(dup < n for n, dup in want.values())


def test_length_quantiles_first_principles(spark):
    """Discrete quantile = value at BIGINT position (n*q+99)//100 in
    (n_chars, doc_id) order, recomputed per lang with plain sorting."""
    pdf = _docs()[["lang", "doc_id", "n_chars"]]
    want = {}
    for lang, grp in pdf.groupby("lang"):
        vals = grp.sort_values(["n_chars", "doc_id"])["n_chars"].tolist()
        n = len(vals)
        want[lang] = (
            n,
            *[vals[(n * qq + 99) // 100 - 1] for qq in (25, 50, 75, 95)],
        )

    got = {
        r["lang"]: (r["n_docs"], r["p25"], r["p50"], r["p75"], r["p95"])
        for r in q.q_length_quantiles(spark, SF).collect()
    }
    assert got == want
    # sanity: quantiles are monotone and within the per-lang extent
    for lang, (n, p25, p50, p75, p95) in got.items():
        assert p25 <= p50 <= p75 <= p95


def test_domain_link_graph_first_principles(spark):
    """Edge counts recomputed from the arithmetic plant directly (no html,
    no regex) — pins that the engine's regexp extraction over the planted
    payload recovers exactly the planted targets, nothing more."""
    ids = [int(x) for x in _docs().doc_id]
    want: dict[tuple[str, str], tuple[int, set]] = {}
    for i in ids:
        src = f"site{i % 20}.example.com"
        for j in range(i % 4):
            dst = f"site{(i * 7 + j * 13) % 20}.example.com"
            n, pages = want.get((src, dst), (0, set()))
            pages.add(i)
            want[(src, dst)] = (n + 1, pages)

    got = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["n_pages"])
        for r in q.q_domain_link_graph(spark, SF).collect()
    }
    assert got == {k: (n, len(p)) for k, (n, p) in want.items()}
    # the plant must produce zero-link docs (absent), multi-link docs and
    # self-loops (internal links) so the extraction sees all three shapes
    assert any(i % 4 == 0 for i in ids)
    assert any((s == d) for s, d in want)


def test_domain_pagerank_first_principles(spark):
    """The fixed-point recurrence recomputed in pure Python integers from
    the arithmetic plant: r0 = S//n, r_{k+1}(v) = S*15//(100n) +
    sum((r_k(u)*85)//(100*outdeg(u))). Every value must match exactly —
    the whole point of integer PageRank is bit-equality of an iterative
    algorithm."""
    ids = [int(x) for x in _docs().doc_id]
    edges = set()
    nodes = set()
    for i in ids:
        src = f"site{i % 20}.example.com"
        nodes.add(src)
        for j in range(i % 4):
            dst = f"site{(i * 7 + j * 13) % 20}.example.com"
            edges.add((src, dst))
            nodes.add(dst)
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    S = q.PR_SCALE
    r = {v: S // n for v in nodes}
    for _ in range(q.PR_ITERS):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += (r[s] * 85) // (100 * outdeg[s])
        r = {v: S * 15 // (100 * n) + inflow[v] for v in nodes}

    got = {
        row["domain"]: (row["pagerank_scaled"], row["pagerank"])
        for row in q.q_domain_pagerank(spark, SF).collect()
    }
    assert set(got) == nodes
    for v in nodes:
        assert got[v][0] == r[v], v
    # truncating integer division only ever loses mass: total <= SCALE
    assert sum(x for x, _ in got.values()) <= S
    # the graph must be non-trivial: ranks differentiate
    assert len({x for x, _ in got.values()}) > 1


def test_doc_salient_terms_first_principles(spark):
    """Top-3 tf/df terms recomputed with plain Python dict arithmetic;
    float score compared exactly (single IEEE division both places)."""
    pdf = _docs()[["doc_id", "text"]]
    tf: dict[int, dict[str, int]] = {}
    for r in pdf.itertuples():
        m: dict[str, int] = {}
        for t in tokenize(r.text):
            m[t] = m.get(t, 0) + 1
        if m:
            tf[int(r.doc_id)] = m
    df: dict[str, int] = {}
    for m in tf.values():
        for t in m:
            df[t] = df.get(t, 0) + 1
    want = {}
    for d, m in tf.items():
        ranked = sorted(
            ((tok, c, df[tok]) for tok, c in m.items()),
            key=lambda x: (-(x[1] / x[2]), x[0]),
        )[:3]
        # both engines round HALF_UP (Spark F.round / DuckDB round), unlike
        # Python's banker's round — 3/384 = 0.0078125 must become 0.007813
        want[d] = [
            (
                tok,
                c,
                dfv,
                float(
                    Decimal(c / dfv).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                )
                + 0.0,
                i + 1,
            )
            for i, (tok, c, dfv) in enumerate(ranked)
        ]

    got: dict[int, list] = {}
    for r in q.q_doc_salient_terms(spark, SF).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["token"], r["tf"], r["df"], r["salience"], r["rank"])
        )
    for d in got:
        got[d].sort(key=lambda x: x[4])
    assert got == want


def _py_union_find(n_ids, edges):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru > rv:
                ru, rv = rv, ru
            parent[rv] = ru
    return {i: find(i) for i in n_ids}


def test_minhash_dedup_clusters_composition(spark):
    """Clusters == union-find over the engine's own band-candidate pairs,
    with every doc (including degenerate no-shingle docs, which band
    nowhere) present exactly once; singletons keep their own id."""
    pdf = _docs()[["doc_id", "text"]]
    all_ids = [int(x) for x in pdf.doc_id]

    # recompute the band pairs from first principles via the documented
    # Python twin of the signature kernel
    sigs = {
        int(r.doc_id): minhash_sig(r.text, q.K_SHINGLE, q.ORACLE_MINHASH)
        for r in pdf.itertuples()
    }
    bands: dict[tuple[int, tuple], list[int]] = {}
    for d, sig in sigs.items():
        if sig is None:
            continue
        for b in range(4):
            key = (b, tuple(sig[b * 4 : (b + 1) * 4]))
            bands.setdefault(key, []).append(d)
    edges = set()
    for members in bands.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                edges.add((ms[i], ms[j]))

    want = _py_union_find(all_ids, sorted(edges))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in q.q_minhash_dedup_clusters(spark, SF).collect()
    }
    assert got == want
    # the corpus must actually produce multi-member minhash clusters
    assert len(set(want.values())) < len(all_ids)


def test_vocab_stats_first_principles(spark):
    """Corpus vocab profile recomputed with a plain Counter."""
    from collections import Counter

    freq = Counter()
    for r in _docs().itertuples():
        freq.update(tokenize(r.text))
    n_tokens = sum(freq.values())
    n_types = len(freq)
    n_hapax = sum(1 for v in freq.values() if v == 1)
    row = q.q_vocab_stats(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (
        n_tokens,
        n_types,
        n_hapax,
    )
    assert r["hapax_frac"] == float(
        Decimal(n_hapax / n_types).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    assert r["top_token_share"] == float(
        Decimal(max(freq.values()) / n_tokens).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def test_pair_distance_histogram_first_principles(spark):
    """Histogram == brute-force Hamming over the engine's own signatures,
    and it must be a superset-refinement of the gated radius-4 pair set."""
    from intraarchivededuplicator_spark.plans.queries import docs_with_sig

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in docs_with_sig(spark, SF).collect()
    }
    ids = sorted(sigs)
    hist: dict[int, int] = {}
    for i, a in enumerate(ids):
        if sigs[a] == 0:
            continue
        for b in ids[i + 1 :]:
            if sigs[b] == 0:
                continue
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= q.PAIR_HIST_RADIUS:
                hist[d] = hist.get(d, 0) + 1

    got = {
        r["distance"]: r["n_pairs"]
        for r in q.q_pair_distance_histogram(spark, SF).collect()
    }
    assert got == hist
    # the sweep is the calibration table: pairs within the dedup radius
    # must equal the gated radius-pair count
    n4 = sum(v for k, v in got.items() if k <= q.SIMHASH_RADIUS)
    n_gate = q.q_simhash_radius_pairs(spark, SF).count()
    assert n4 == n_gate


def test_title_typo_pairs_first_principles(spark):
    """SymSpell deletion-neighborhood join == brute-force Levenshtein <= 1
    over the planted titles (recall 1.0 — the pigeonhole guarantee), with
    the reject path provably live (distance-2 variant pairs collide in the
    key space but must not survive the verify)."""

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def title(i: int) -> str:
        g = i // 4
        base = f"page title about topic {g}"
        p = (g % len(base)) + 1
        m = i % 4
        if m == 0:
            return base
        if m == 1:
            return base[: p - 1] + base[p:]
        if m == 2:
            return base[: p - 1] + "Z" + base[p:]
        return base[:p] + "q" + base[p:]

    ids = [int(x) for x in _docs().doc_id]
    titles = {i: title(i) for i in ids}
    want = {}
    for i in ids:
        for j in ids:
            if i < j:
                d = lev(titles[i], titles[j])
                if d <= 1:
                    want[(i, j)] = d

    got = {
        (r["id_lo"], r["id_hi"]): r["lev"]
        for r in q.q_title_typo_pairs(spark, SF).collect()
    }
    assert got == want
    # reject path live: within a group, deletion-vs-insertion variants are
    # candidates (they share the base's deletion key) at distance 2
    g0 = [i for i in ids if i // 4 == 1]
    if len(g0) == 4:
        assert lev(titles[g0[1]], titles[g0[3]]) == 2
        assert (g0[1], g0[3]) not in got
    # and distance-0-and-1 pairs both occur
    assert 1 in got.values()


def test_heavy_hitter_grams_first_principles(spark):
    """Exact two-pass frequent items == plain Python df count + threshold,
    and the result is invariant to the pass-1 partitioning (the pigeonhole
    candidate superset is partitioning-DEPENDENT; the exact pass-2 recount
    makes the OUTPUT partitioning-independent)."""
    from intraarchivededuplicator_spark.functions.shingle_kernel import (
        distinct_shingles,
    )
    from intraarchivededuplicator_spark.operators.heavy_hitters import (
        frequent_grams,
    )

    pdf = _docs()[["doc_id", "text"]]
    df: dict[str, int] = {}
    for r in pdf.itertuples():
        for g in set(shingles(tokenize(r.text), q.K_SHINGLE)):
            df[g] = df.get(g, 0) + 1
    want = {g: c for g, c in df.items() if c >= q.HH_MIN_DF}
    assert want  # corpus exercises the registry (df reaches 4 at sf0.001)

    got = {
        r["gram"]: r["df_docs"]
        for r in q.q_heavy_hitter_grams(spark, SF).collect()
    }
    assert got == want

    # partition-independence: 1 part (pass 1 IS the exact filter, lb=3),
    # 2 parts (lb=2 — the prune bites: the df=1 tail dies map-side), and
    # a width above the threshold (lb=1 — prune degenerates, still exact)
    occ = distinct_shingles(
        spark.createDataFrame(pdf[["doc_id", "text"]]), q.K_SHINGLE
    )
    for parts in (1, 2, 5):
        got_p = {
            r["gram"]: r["df_docs"]
            for r in frequent_grams(
                occ, q.HH_MIN_DF, local_parts=parts
            ).collect()
        }
        assert got_p == want, parts


def test_charlm_quality_first_principles(spark):
    """Train/score the char-bigram LM in pure Python (math.log only enters
    via the same LP_MICRO table the engine and oracle share) and pin the
    engine's integer scores exactly."""
    from intraarchivededuplicator_spark.functions.charlm import (
        CHARLM_Q,
        LP_FLOOR,
        LP_MICRO,
    )

    pdf = _docs()[["doc_id", "text"]]
    c2: dict[str, int] = {}
    for r in pdf.itertuples():
        if int(r.doc_id) % q.CHARLM_TRAIN_MOD or r.text is None:
            continue
        t = r.text
        for i in range(len(t) - 1):
            bgm = t[i : i + 2]
            c2[bgm] = c2.get(bgm, 0) + 1
    c1: dict[str, int] = {}
    for bgm, c in c2.items():
        c1[bgm[0]] = c1.get(bgm[0], 0) + c
    model = {
        bgm: LP_MICRO[max(1, (c * CHARLM_Q) // c1[bgm[0]]) - 1]
        for bgm, c in c2.items()
    }

    want = {}
    for r in pdf.itertuples():
        if r.text is None or len(r.text) < 2:
            continue
        total = n = 0
        t = r.text
        for i in range(len(t) - 1):
            total += model.get(t[i : i + 2], LP_FLOOR)
            n += 1
        nlp = (-total) // n
        want[int(r.doc_id)] = (n, nlp, nlp <= q.CHARLM_MAX_NLP)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["nlp_micro"], r["keep_flag"])
        for r in q.q_charlm_quality(spark, SF).collect()
    }
    assert got == want
    # the corpus exercises the unseen-bigram backoff (scored docs outside
    # the training slice) and, at larger SFs, both flag values; at sf0.001
    # at least assert score spread is real
    assert len({v[1] for v in want.values()}) > 10


def _write_span_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_dup_span_stats_planted(spark, tmp_path):
    """Planted spans pin the run arithmetic (K_SHINGLE=5): docs 0/1 share a
    10-token run -> 6 consecutive dup positions -> ONE span of 10 tokens;
    doc 2 carries TWO disjoint 5-token shared runs -> two 1-gram spans of
    5 tokens each; doc 3 contributes the second copy of the h-run with its
    flanks unique; doc 4 is sub-shingle-length (no row); doc 5 shares
    nothing (zero spans, ratio 0.0)."""
    assert q.K_SHINGLE == 5
    s10 = " ".join(f"s{i}" for i in range(1, 11))
    s5 = "s1 s2 s3 s4 s5"
    h5 = "h1 h2 h3 h4 h5"
    rows = [
        (0, f"c1 c2 c3 c4 {s10} d1 d2 d3 d4 d5 d6", "en"),
        (1, f"e1 e2 {s10} f1 f2 f3 f4", "en"),
        (2, f"{s5} u1 u2 u3 u4 {h5}", "en"),
        (3, f"z1 {h5} z2", "en"),
        (4, "w1 w2 w3", "en"),
        (5, "v1 v2 v3 v4 v5 v6", "en"),
    ]
    sf_dir = _write_span_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (
            r["n_positions"],
            r["n_dup_positions"],
            r["n_spans"],
            r["longest_span_tokens"],
            r["dup_pos_ratio"],
        )
        for r in q.q_dup_span_stats(spark, sf_dir).collect()
    }
    assert got == {
        0: (16, 6, 1, 10, 0.375),
        1: (12, 6, 1, 10, 0.5),
        2: (10, 2, 2, 5, 0.2),
        3: (3, 1, 1, 5, round(1 / 3, 6)),
        5: (2, 0, 0, 0, 0.0),
    }


def test_dup_span_stats_first_principles(spark):
    """Positional grams, corpus df, gaps-and-islands runs — recomputed in
    pure Python from the sf0.001 parquet, independent of Spark and DuckDB."""
    pdf = _docs()[["doc_id", "text"]]
    per_doc: dict[int, list[str]] = {}
    for r in pdf.itertuples():
        gs = shingles(tokenize(r.text), q.K_SHINGLE)
        if gs:
            per_doc[int(r.doc_id)] = gs
    df: dict[str, set[int]] = {}
    for d, gs in per_doc.items():
        for g in gs:
            df.setdefault(g, set()).add(d)
    want = {}
    for d, gs in per_doc.items():
        runs, cur = [], 0
        for g in gs:
            if len(df[g]) >= 2:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        n_dup = sum(runs)
        longest = (max(runs) + q.K_SHINGLE - 1) if runs else 0
        want[d] = (
            len(gs),
            n_dup,
            len(runs),
            longest,
            round(n_dup / len(gs), 6),
        )

    got = {
        r["doc_id"]: (
            r["n_positions"],
            r["n_dup_positions"],
            r["n_spans"],
            r["longest_span_tokens"],
            r["dup_pos_ratio"],
        )
        for r in q.q_dup_span_stats(spark, SF).collect()
    }
    assert set(got) == set(want)
    for d, w in want.items():
        assert got[d][:4] == w[:4], d
        assert got[d][4] == pytest.approx(w[4])
    # the corpus must exercise spans on both sides: some docs with multiple
    # spans, some with none
    assert any(w[2] >= 2 for w in want.values())
    assert any(w[2] == 0 for w in want.values())


def test_minhash_recall_audit_planted(spark, tmp_path):
    """Planted mid-Jaccard corpus pins the audit against a pure-Python
    recompute (shingle_hash32 sets -> integer buckets; minhash_sig -> 4x4
    band keys -> candidate pairs). The corpus is built so the truth set
    spans several buckets; catch/miss per pair falls out of the fixed
    seed-42 MinHash params rather than being asserted by hand."""
    from intraarchivededuplicator_spark.functions.hashing import (
        minhash_sig,
        shingle_hash32,
    )

    # pairs (2j, 2j+1) share a j-dependent fraction of an 80-token stream:
    # doc 2j = tokens [0, 80); doc 2j+1 = tokens [cut_j, 80 + cut_j) of the
    # SAME pair-local stream -> Jaccard spans ~(80-cut)/(80+cut)
    rows = []
    for pair, cut in enumerate([4, 10, 18, 28, 40, 52]):
        toks = [f"p{pair}w{i}" for i in range(80 + cut)]
        rows.append((2 * pair, " ".join(toks[:80]), "en"))
        rows.append((2 * pair + 1, " ".join(toks[cut:]), "en"))
    sf_dir = _write_span_docs(spark, tmp_path, rows)

    shs = {
        d: {shingle_hash32(s) for s in shingles(tokenize(t), q.K_SHINGLE)}
        for d, t, _ in rows
    }
    sigs = {d: minhash_sig(t, q.K_SHINGLE, q.ORACLE_MINHASH) for d, t, _ in rows}
    bands = {
        d: {(b, tuple(sig[4 * b : 4 * b + 4])) for b in range(4)}
        for d, sig in sigs.items()
    }
    want: dict[int, list[int]] = {}
    ids = sorted(shs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            i = len(shs[x] & shs[y])
            u = len(shs[x] | shs[y])
            if i == 0 or 2 * i < u:
                continue
            caught = bool(bands[x] & bands[y])
            b = (10 * i) // u
            want.setdefault(b, [0, 0])
            want[b][0] += 1
            want[b][1] += int(caught)

    got = {
        r["bucket_tenths"]: (r["n_pairs"], r["n_caught"], r["recall"])
        for r in q.q_minhash_recall_audit(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for b, (n, c) in want.items():
        assert got[b][:2] == (n, c), b
        assert got[b][2] == pytest.approx(round(c / n, 6))
    # the plant must span buckets; at least one true pair must be missed
    # by the 4x4 geometry or the audit proves nothing at this corpus
    assert len(want) >= 3
    assert any(c < n for n, c in want.values())
    assert any(c > 0 for n, c in want.values())


def test_dup_span_removal_planted(spark, tmp_path):
    """Removal semantics pinned end-to-end (K_SHINGLE=5, min span 10
    tokens): the earliest doc owning a shared run keeps its copy; the later
    doc loses exactly the span's token extent; runs below the token floor
    survive; a doc wholly covered by an owned-elsewhere span reconstructs
    to the empty stream (md5(''))."""
    import hashlib as _hl

    assert q.K_SHINGLE == 5 and q.DUP_SPAN_RMIN == 6
    s12 = " ".join(f"s{i}" for i in range(1, 13))
    t7 = " ".join(f"t{i}" for i in range(1, 8))
    rows = [
        (0, f"c1 c2 c3 c4 {s12} d1 d2 d3 d4", "en"),
        (1, f"e1 e2 {s12} f1 f2", "en"),
        (2, f"g1 g2 g3 g4 g5 {t7} h1 h2 h3 h4", "en"),
        (3, f"u1 {t7} u2 u3 u4 u5 u6 u7", "en"),
        (4, s12, "en"),
        (5, "x1", "en"),
    ]
    sf_dir = _write_span_docs(spark, tmp_path, rows)

    def h(s: str) -> str:
        return _hl.md5(s.encode()).hexdigest()

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_hash"])
        for r in q.q_dup_span_removal(spark, sf_dir).collect()
    }
    assert got == {
        0: (20, 0, h(rows[0][1])),          # owner keeps everything
        1: (16, 12, h("e1 e2 f1 f2")),      # exactly the span cut
        2: (16, 0, h(rows[2][1])),          # owner of the short run
        3: (14, 0, h(rows[3][1])),          # 7-token run < 10: survives
        4: (12, 12, h("")),                 # wholly-covered doc empties
        5: (1, 0, h("x1")),                 # sub-shingle doc untouched
    }


def test_pack_efficiency_first_principles(spark):
    """Per-lang padded/concat sequence counts recomputed in pure Python
    from the sf0.001 parquet with the pack family's split-on-single-space
    token convention."""
    c = q.PACK_CAP_GATE
    pdf = _docs()[["lang", "text"]]
    agg: dict[str, list[int]] = {}
    for r in pdf.itertuples():
        n = len(r.text.split(" "))
        a = agg.setdefault(r.lang, [0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += -(-n // c)
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_tokens"],
            r["n_seqs_padded"],
            r["n_seqs_concat"],
            r["pad_tokens"],
            r["pad_frac"],
        )
        for r in q.q_pack_efficiency(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for lang, (nd, nt, sp) in agg.items():
        sc = -(-nt // c)
        pad = sp * c - nt
        assert got[lang][:5] == (nd, nt, sp, sc, pad), lang
        assert got[lang][5] == pytest.approx(round(pad / (sp * c), 6))
    # padding must be real and concat must actually save sequences
    assert any(v[2] > -(-v[1] // c) for v in agg.values())


def test_source_quality_rollup_first_principles(spark):
    """Per-source pass/dup fractions recomputed in pure Python from the
    sf0.001 parquet: quality gate re-derived with the documented tokenize
    twin + regex, dup membership from md5(text) multiplicity."""
    import hashlib as _hl
    import re as _re

    pdf = _docs()[["doc_id", "source", "text"]]
    hcount: dict[str, int] = {}
    for r in pdf.itertuples():
        h = _hl.md5(r.text.encode()).hexdigest()
        hcount[h] = hcount.get(h, 0) + 1
    agg: dict[str, list[int]] = {}
    for r in pdf.itertuples():
        toks = tokenize(r.text)
        n = len(toks)
        n_stop = sum(1 for t in toks if t in q.STOPWORDS)
        n_dist = len(set(toks))
        passes = (
            n >= q.QUALITY_MIN_TOKENS
            and round(n_stop / max(n, 1), 6) <= q.QUALITY_MAX_STOP_RATIO
            and round(n_dist / max(n, 1), 6) >= q.QUALITY_MIN_DISTINCT_RATIO
        )
        isdup = hcount[_hl.md5(r.text.encode()).hexdigest()] >= 2
        a = agg.setdefault(r.source, [0, 0, 0])
        a[0] += 1
        a[1] += int(passes)
        a[2] += int(isdup)

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_pass"],
            r["n_dup"],
            r["pass_frac"],
            r["dup_frac"],
            r["keep_flag"],
        )
        for r in q.q_source_quality_rollup(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for s, (nd, npass, ndup) in agg.items():
        pf, duf = round(npass / nd, 6), round(ndup / nd, 6)
        assert got[s][:3] == (nd, npass, ndup), s
        assert got[s][3] == pytest.approx(pf)
        assert got[s][4] == pytest.approx(duf)
        assert got[s][5] == (
            pf >= q.SRC_MIN_PASS_FRAC and duf <= q.SRC_MAX_DUP_FRAC
        ), s
    # sf0.001 is clean synthetic text (all docs pass, no byte-identical
    # dups) — the split verdicts are exercised by the sf0.01 driver gate;
    # this pin's job is the composition arithmetic
    assert any(v[1] > 0 for v in agg.values())


def test_shard_balance_first_principles(spark):
    """Shard totals recomputed in pure Python (md5 hex-prefix mod N), and
    the balance property the report exists to show: every shard within
    3x of uniform doc share on the 500-doc corpus."""
    import hashlib as _hl

    pdf = _docs()[["doc_id", "text"]]
    agg: dict[int, list[int]] = {}
    for r in pdf.itertuples():
        sid = (
            int(_hl.md5(str(int(r.doc_id)).encode()).hexdigest()[:8], 16)
            % q.N_SHARDS
        )
        a = agg.setdefault(sid, [0, 0, 0])
        a[0] += 1
        a[1] += len(r.text.split(" "))
        a[2] += len(r.text.encode("utf-8"))

    rows = q.q_shard_balance(spark, SF).collect()
    got = {
        r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_bytes"], r["doc_share"])
        for r in rows
    }
    assert set(got) == set(agg)
    total = sum(v[0] for v in agg.values())
    for sid, (nd, nt, nb) in agg.items():
        assert got[sid][:3] == (nd, nt, nb), sid
        assert got[sid][3] == pytest.approx(round(nd / total, 6))
        assert nd <= 3 * total / q.N_SHARDS
    assert len(agg) == q.N_SHARDS


def test_lineitem_pricing_summary_first_principles(spark):
    """Q1-shape aggregates recomputed with pandas integer arithmetic from
    the sf0.001 parquet (cents / basis points, one rounded division per
    output)."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li.l_shipdate <= pd.Timestamp("1998-09-02")]
    want = {}
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        sq = int(round_half_up_series(g.l_quantity * 100).sum())
        sp = int(round_half_up_series(g.l_extendedprice * 100).sum())
        sdp = int(
            round_half_up_series(
                g.l_extendedprice * (1 - g.l_discount) * 100
            ).sum()
        )
        sc = int(
            round_half_up_series(
                g.l_extendedprice * (1 - g.l_discount) * (1 + g.l_tax) * 100
            ).sum()
        )
        sd = int(round_half_up_series(g.l_discount * 10000).sum())
        n = len(g)
        want[(rf, ls)] = (
            round(sq / 100.0, 6),
            round(sp / 100.0, 6),
            round(sdp / 100.0, 6),
            round(sc / 100.0, 6),
            round(sq / (n * 100), 6),
            round(sp / (n * 100), 6),
            round(sd / (n * 10000), 6),
            n,
        )

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"],
            r["sum_base_price"],
            r["sum_disc_price"],
            r["sum_charge"],
            r["avg_qty"],
            r["avg_price"],
            r["avg_disc"],
            r["count_order"],
        )
        for r in q.q_lineitem_pricing_summary(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k][7] == w[7], k
        for i in range(7):
            assert got[k][i] == pytest.approx(w[i]), (k, i)


def round_half_up_series(s):
    """numpy rint is banker's; both engines round HALF_UP on positives."""
    import numpy as np

    return np.floor(s.to_numpy() + 0.5)


def test_dup_span_removal_randomized_differential(spark, tmp_path):
    """Randomized differential pin for the removal semantics: 60 docs from
    a 12-token alphabet (forcing heavy gram collisions), including empty
    docs, sub-shingle docs, exact copies, and slices of other docs —
    compared doc-for-doc against an independent pure-Python
    implementation of owner/df/run/extent arithmetic."""
    import hashlib as _hl
    import random

    rng = random.Random(7)
    alpha = [f"w{i}" for i in range(12)]
    texts: dict[int, str] = {}
    for d in range(60):
        mode = rng.random()
        if mode < 0.08:
            texts[d] = ""
        elif mode < 0.16:
            texts[d] = " ".join(rng.choices(alpha, k=rng.randint(1, 4)))
        elif mode < 0.45 and d > 0:
            src = texts[rng.randrange(d)].split()
            if len(src) >= 6:
                lo = rng.randrange(len(src) - 5)
                hi = rng.randint(lo + 5, len(src))
                core = src[lo:hi]
            else:
                core = rng.choices(alpha, k=8)
            pre = rng.choices(alpha, k=rng.randint(0, 3))
            post = rng.choices(alpha, k=rng.randint(0, 3))
            texts[d] = " ".join(pre + core + post)
        else:
            texts[d] = " ".join(rng.choices(alpha, k=rng.randint(5, 25)))

    k, rmin = q.K_SHINGLE, q.DUP_SPAN_RMIN
    toks = {d: tokenize(t) for d, t in texts.items()}
    grams = {d: shingles(tl, k) for d, tl in toks.items()}
    dfs: dict[str, int] = {}
    owner: dict[str, int] = {}
    for d in sorted(grams):
        for g in set(grams[d]):
            dfs[g] = dfs.get(g, 0) + 1
            owner.setdefault(g, d)
    want = {}
    for d, gl in grams.items():
        n = len(toks[d])
        if n < 1:
            continue
        remv = [
            i
            for i, g in enumerate(gl, start=1)
            if dfs[g] >= 2 and owner[g] != d
        ]
        covered: set[int] = set()
        run: list[int] = []
        for p in remv + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= rmin:
                    covered.update(range(run[0], run[-1] + k))
                run = []
            if p is not None:
                run.append(p)
        kept = [t for i, t in enumerate(toks[d], start=1) if i not in covered]
        want[d] = (
            n,
            n - len(kept),
            _hl.md5(" ".join(kept).encode()).hexdigest(),
        )

    sf_dir = _write_span_docs(
        spark, tmp_path, [(d, t, "en") for d, t in texts.items()]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_hash"])
        for r in q.q_dup_span_removal(spark, sf_dir).collect()
    }
    assert got == want
    # the random corpus must exercise actual removal and survivors
    assert any(v[1] > 0 for v in want.values())
    assert any(v[1] == 0 for v in want.values())
