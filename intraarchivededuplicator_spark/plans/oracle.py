"""DuckDB oracle-SQL builders mirroring the engine's signature spec.

These SQL strings recompute the *entire* signature pipeline (tokenize ->
md5 token hashes -> SimHash64 -> MinHash -> banded candidates -> radius pairs
-> connected components) in pure ANSI-ish SQL, so the driver's DuckDB
differential check exercises the engine end-to-end, not just relational
plumbing. Every construct was probe-verified against DuckDB: hex-string
casts ('0x…'::BIGINT), bit_count/xor on BIGINT (two's-complement, matches
Spark), arithmetic >> with masking, lambdas, recursive CTEs.

The semantics mirror functions/hashing.py exactly — see that module for the
reference citations (signed-int64 convention per
/root/reference/scanner/unitConverters.py:5-34).
"""

from __future__ import annotations

from ..functions.hashing import MINHASH_PRIME, MinHashParams

INT64_MIN_SQL = "(-9223372036854775807 - 1)"


def sql_md5_prefix_mod(expr: str, mod: int) -> str:
    """DuckDB twin of functions/columns.md5_prefix_mod: non-negative bucket
    in [0, mod) from the first 8 md5 hex chars. One definition for the
    shard / split / DSIR-bucket oracles."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT % {mod}"


def sql_token_hash64(tok_expr: str) -> str:
    """Signed int64 from first 16 md5 hex chars of a token expression."""
    hi = f"('0x' || substr(md5({tok_expr}), 1, 1))::BIGINT"
    lo = f"('0x' || substr(md5({tok_expr}), 2, 15))::BIGINT"
    return (
        f"(CASE WHEN {hi} >= 8 THEN ({hi} - 16) * (1::BIGINT << 60) + {lo} "
        f"ELSE {hi} * (1::BIGINT << 60) + {lo} END)"
    )


def sql_shingle_hash32(s_expr: str) -> str:
    return f"('0x' || substr(md5({s_expr}), 1, 8))::BIGINT"


def cte_tokens(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """CTE `toks(doc_id, tok)` — whitespace-run split, empties dropped."""
    return (
        f"toks AS (SELECT {id_col} AS doc_id, t.tok AS tok "
        f"FROM {table}, unnest(list_filter(string_split_regex({text_col}, '\\s+'), "
        f"x -> x <> '')) AS t(tok))"
    )


def cte_simhash(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> str:
    """CTEs ending in `sh(doc_id, simhash)` covering every row (degenerate -> 0).

    Features are shingle_k-token shingles (see hashing.simhash64's rationale).
    """
    return f"""
{cte_shingles(shingle_k, table, id_col, text_col)},
tok_counts AS (
    SELECT doc_id, s AS tok, count(*)::BIGINT AS cnt FROM shing GROUP BY doc_id, s
),
tok_h AS (
    SELECT doc_id, cnt, {sql_token_hash64('tok')} AS h FROM tok_counts
),
bits AS (
    SELECT doc_id, j,
           CASE WHEN sum(CASE WHEN ((h >> j) & 1) = 1 THEN cnt ELSE -cnt END) > 0
                THEN 1::BIGINT ELSE 0::BIGINT END AS bit
    FROM tok_h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) js
    GROUP BY doc_id, j
),
sh_raw AS (
    SELECT doc_id,
           sum(CASE WHEN j = 63 THEN bit * {INT64_MIN_SQL} ELSE bit << j END)::BIGINT
               AS simhash
    FROM bits GROUP BY doc_id
),
sh AS (
    SELECT d.{id_col} AS doc_id, coalesce(sh_raw.simhash, 0::BIGINT) AS simhash
    FROM {table} d LEFT JOIN sh_raw ON d.{id_col} = sh_raw.doc_id
)"""


def sql_simhash_signatures(table: str = "documents") -> str:
    return f"WITH {cte_simhash(table)} SELECT doc_id, simhash FROM sh ORDER BY doc_id"


def sql_simhash_radius_pairs(radius: int, table: str = "documents", blacklist=(0,)) -> str:
    """Brute-force Hamming-radius pairs over the SQL-computed SimHashes —
    exactly what the banded join must reproduce (recall 1.0)."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH {cte_simhash(table)}
SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
       bit_count(xor(a.simhash, b.simhash))::INT AS distance
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
  AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
ORDER BY id_lo, id_hi"""


def sql_incremental_near_pairs(
    radius: int, new_mod: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_incremental_near_pairs: the full
    brute-force radius-pair set restricted to pairs with at least one side
    in the new batch (doc_id % new_mod == 0) — the engine's two banded legs
    (new-vs-index broadcast probe + within-batch self-join) must together
    reproduce exactly this restriction with recall 1.0."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH {cte_simhash(table)}
SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
       bit_count(xor(a.simhash, b.simhash))::INT AS distance
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
  AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
  AND (a.doc_id % {new_mod} = 0 OR b.doc_id % {new_mod} = 0)
ORDER BY id_lo, id_hi"""


def sql_near_pairs_within_horizon(
    radius: int, horizon_sec: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Radius pairs additionally gated by |event-time delta| <= horizon, with
    event time synthesized as doc_id * 61 seconds (the batch twin of the
    streaming near-dedup operator; see plans/queries.q_near_pairs_within_horizon)."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH {cte_simhash(table)}
SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
       bit_count(xor(a.simhash, b.simhash))::INT AS distance,
       (greatest(a.doc_id, b.doc_id) * 61)::BIGINT AS pair_ts_sec
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
  AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
  AND abs(a.doc_id - b.doc_id) * 61 <= {horizon_sec}
ORDER BY id_lo, id_hi"""


def sql_simhash_clusters(radius: int, table: str = "documents", blacklist=(0,)) -> str:
    """Connected components over radius pairs via recursive CTE; every doc
    gets a cluster (singletons = own id)."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH RECURSIVE {cte_simhash(table)},
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach (src, dst) AS (
    SELECT doc_id, doc_id FROM sh
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src ORDER BY doc_id"""


def sql_dedup_cluster_stats(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_dedup_cluster_stats: the recursive-CTE
    cluster assignment of sql_simhash_clusters, folded into the size
    histogram (clusters per size, docs per size, removable duplicates).
    Counts stay BIGINT (the transport-strict HUGEINT discipline)."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH RECURSIVE {cte_simhash(table)},
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach (src, dst) AS (
    SELECT doc_id, doc_id FROM sh
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
),
clusters AS (
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
),
sizes AS (
    SELECT cluster_id, count(*)::BIGINT AS cluster_size
    FROM clusters GROUP BY cluster_id
)
SELECT cluster_size,
       count(*)::BIGINT AS n_clusters,
       (count(*) * cluster_size)::BIGINT AS n_docs,
       (count(*) * (cluster_size - 1))::BIGINT AS n_removable
FROM sizes GROUP BY cluster_size ORDER BY cluster_size"""


def _cte_keep_list(radius: int, table: str = "documents", blacklist=(0,)) -> str:
    """Shared CTE chain ending in `kl(doc_id, cluster_id, keep, reason)` —
    the C1 keep/drop verdict (see sql_dedup_keep_list). Callers must open
    with WITH RECURSIVE. One definition feeds sql_dedup_keep_list,
    sql_dedup_funnel's twin and sql_token_yield_funnel so the decision
    arithmetic cannot drift between gated surfaces."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""{cte_simhash(table)},
ex AS (SELECT doc_id, md5(text) AS text_hash FROM {table}),
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
    UNION
    SELECT x.doc_id, y.doc_id
    FROM ex x JOIN ex y ON x.doc_id < y.doc_id AND x.text_hash = y.text_hash
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach (src, dst) AS (
    SELECT doc_id, doc_id FROM sh
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
),
cl AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
exf AS (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY text_hash) AS h_min FROM ex
),
kl AS (
    SELECT c.doc_id, c.cluster_id,
           (c.doc_id = c.cluster_id) AS keep,
           CASE WHEN c.doc_id = c.cluster_id THEN 'kept'
                WHEN e.h_min < c.doc_id THEN 'exact_dup'
                ELSE 'near_dup' END AS reason
    FROM cl c JOIN exf e ON c.doc_id = e.doc_id
)"""


def sql_dedup_keep_list(radius: int, table: str = "documents", blacklist=(0,)) -> str:
    """Oracle for plans/queries.q_dedup_keep_list: exact (md5 text) and near
    (SimHash Hamming <= radius, degenerate-blacklisted) duplicate edges closed
    into connected components via a recursive CTE; the min-id member of each
    cluster is kept, the rest drop with reason 'exact_dup' when a smaller-id
    byte-identical twin exists anywhere, else 'near_dup'. The h_min window
    mirrors the engine's NULL-safe text_hash grouping."""
    return f"""
WITH RECURSIVE {_cte_keep_list(radius, table, blacklist)}
SELECT doc_id, cluster_id, keep, reason FROM kl ORDER BY doc_id"""


def sql_stream_exact_dedup(horizon_sec: int, table: str = "documents") -> str:
    """Oracle for the streaming exact-dedup replay (plans/queries.
    q_stream_exact_dedup_replay): a doc survives iff it is the first arrival
    of its md5 text hash, or the event-time gap from the PREVIOUS same-hash
    arrival exceeds the horizon (every arrival — emitted or suppressed —
    renews the suppression window, so the rule is one lag() window, no
    recursion). Event time = doc_id * 61 s, as in the near-dedup replay."""
    return f"""
WITH ex AS (
    SELECT doc_id, md5(text) AS text_hash, (doc_id * 61)::BIGINT AS ts_sec
    FROM {table} WHERE text IS NOT NULL
),
g AS (
    SELECT doc_id, text_hash, ts_sec,
           lag(ts_sec) OVER (PARTITION BY text_hash ORDER BY ts_sec, doc_id)
               AS prev_ts
    FROM ex
)
SELECT doc_id, text_hash, ts_sec FROM g
WHERE prev_ts IS NULL OR ts_sec - prev_ts > {horizon_sec}
ORDER BY doc_id"""


def sql_simhash_hot_bands(
    n_bands: int, threshold: int, table: str = "documents", blacklist=(0,)
) -> str:
    """S13 skew registry: band keys shared by more than ``threshold`` docs.

    Replicates columns.band_key's LSB-first logical-shift slicing in SQL:
    signed int64 -> unsigned via HUGEINT, then (u // 2^offset) % 2^width per
    band (offsets/widths from columns.band_widths, widest first)."""
    from ..functions.columns import band_widths

    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    rows, offset = [], 0
    for band_id, w in enumerate(band_widths(n_bands)):
        rows.append(f"({band_id}, {1 << offset}::HUGEINT, {1 << w}::HUGEINT)")
        offset += w
    values = ", ".join(rows)
    return f"""
WITH {cte_simhash(table)},
u AS (
    SELECT doc_id,
           CASE WHEN simhash < 0
                THEN simhash::HUGEINT + 18446744073709551616::HUGEINT
                ELSE simhash::HUGEINT END AS us
    FROM sh WHERE simhash NOT IN ({bl})
),
bands AS (
    SELECT doc_id, b.band_id, CAST((us // b.dv) % b.md AS BIGINT) AS band_key
    FROM u CROSS JOIN (VALUES {values}) AS b(band_id, dv, md)
)
SELECT band_id::INT AS band_id, band_key, count(*)::BIGINT AS n_members
FROM bands GROUP BY band_id, band_key HAVING count(*) > {threshold}
ORDER BY band_id, band_key"""


def cte_shingles(
    k: int, table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """CTE `shing(doc_id, s)` — k-token shingles joined by single spaces."""
    return f"""
toklist AS (
    SELECT {id_col} AS doc_id,
           list_filter(string_split_regex({text_col}, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
shing AS (
    SELECT doc_id, array_to_string(tl[i:i+{k - 1}], ' ') AS s
    FROM toklist, unnest(generate_series(1, len(tl) - {k - 1})) AS r(i)
)"""


# Shared URL plant (queries.py _planted_urls twin) and RE2 canonicalization
# chain for the url_* oracle family. The chain re-implements
# functions/urlnorm.canonical_url INDEPENDENTLY (note '\\1' backreferences
# and the explicit 'g' flag vs Spark's '$1'/replace-all default); c8 emits
# (doc_id, url, canonical_url).
def _url_plant(table: str) -> str:
    return f"""raw AS (
    SELECT doc_id,
           (doc_id - doc_id % 4) AS base,
           'site' || ((doc_id - doc_id % 4) % 20)::VARCHAR || '.example.com'
               AS lhost,
           '/Docs/' || (doc_id - doc_id % 4)::VARCHAR AS path
    FROM {table}
),
u0 AS (
    SELECT doc_id,
           CASE doc_id % 4
               WHEN 0 THEN 'http://' || lhost || path
               WHEN 1 THEN 'https://' || lhost || path || '/'
               WHEN 2 THEN 'http://' || lhost || ':80' || path || '#sec2'
               ELSE 'http://' || upper(lhost) || path
                    || '?utm_source=feed&utm_medium=rss'
           END AS url
    FROM raw
)"""


_URL_CANON_CHAIN = """c1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM u0),
c2 AS (SELECT doc_id, url, regexp_replace(u, '(?i)^https?://', 'http://') AS u FROM c1),
c3 AS (SELECT doc_id, url,
              regexp_replace(u, '[?&]utm_[A-Za-z0-9_]+=[^&#]*', '', 'g') AS u
       FROM c2),
c4 AS (SELECT doc_id, url, regexp_replace(u, '\\?&', '?') AS u FROM c3),
c5 AS (SELECT doc_id, url, regexp_replace(u, '^([^?&]*)&', '\\1?') AS u FROM c4),
c6 AS (SELECT doc_id, url, regexp_replace(u, '[?&]$', '') AS u FROM c5),
c7 AS (
    SELECT doc_id, url,
           'http://'
           || regexp_replace(
                  lower(regexp_extract(u, '^http://([^/?#]*)', 1)), ':80$', '')
           || regexp_replace(u, '^http://[^/?#]*', '') AS u
    FROM c6
),
c8 AS (SELECT doc_id, url, regexp_replace(u, '/$', '') AS canonical_url FROM c7)"""


def sql_url_canonicalize(table: str = "documents") -> str:
    """Oracle for plans/queries.q_url_canonicalize: same arithmetic URL
    synthesis (_url_plant), independent RE2 canonicalization
    (_URL_CANON_CHAIN)."""
    return f"""
WITH {_url_plant(table)},
{_URL_CANON_CHAIN}
SELECT doc_id, url, canonical_url,
       min(doc_id) OVER (PARTITION BY canonical_url) AS group_min_id
FROM c8 ORDER BY doc_id"""


def sql_url_latest_snapshot(table: str = "documents") -> str:
    """Oracle for plans/queries.q_url_latest_snapshot: same plant + chain,
    argmax via row_number (vs the engine's max(struct) — independent
    formulation of the same reduction)."""
    return f"""
WITH {_url_plant(table)},
{_URL_CANON_CHAIN},
p AS (
    SELECT doc_id, canonical_url,
           ((doc_id - doc_id % 4) * 61
            + ((doc_id // 4 + (doc_id % 4) * 3) % 4) * 13 + 86400)::BIGINT
               AS ts_sec
    FROM c8
),
w AS (
    SELECT canonical_url, doc_id, ts_sec,
           row_number() OVER (
               PARTITION BY canonical_url
               ORDER BY ts_sec DESC, doc_id DESC) AS rn,
           count(*) OVER (PARTITION BY canonical_url) AS n_captures
    FROM p
)
SELECT canonical_url, n_captures,
       doc_id AS latest_doc_id, ts_sec AS latest_ts_sec
FROM w WHERE rn = 1 ORDER BY canonical_url"""


def sql_url_revisit_diff(table: str = "documents") -> str:
    """Oracle for plans/queries.q_url_revisit_diff: same plant + canon chain
    + capture times as sql_url_latest_snapshot, content versions
    1 when doc_id % 4 in (0, 3) else 0, change counting via lag over
    capture time. Counts stay BIGINT (the transport-strict HUGEINT
    discipline); ratio rounds to 6 decimals with the -0.0 normalization."""
    return f"""
WITH {_url_plant(table)},
{_URL_CANON_CHAIN},
p AS (
    SELECT doc_id, canonical_url,
           ((doc_id - doc_id % 4) * 61
            + ((doc_id // 4 + (doc_id % 4) * 3) % 4) * 13 + 86400)::BIGINT
               AS ts_sec,
           (CASE WHEN doc_id % 4 IN (0, 3) THEN 1 ELSE 0 END)::BIGINT
               AS content_v
    FROM c8
),
l AS (
    SELECT canonical_url, content_v,
           lag(content_v) OVER (
               PARTITION BY canonical_url ORDER BY ts_sec) AS prev_v
    FROM p
)
SELECT canonical_url,
       count(*)::BIGINT AS n_captures,
       coalesce(sum(CASE WHEN prev_v IS NOT NULL AND content_v != prev_v
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_changes,
       CASE WHEN count(*) > 1
            THEN round(coalesce(sum(CASE WHEN prev_v IS NOT NULL
                                          AND content_v != prev_v
                                     THEN 1 ELSE 0 END), 0)::DOUBLE
                       / (count(*) - 1), 6) + 0.0
            ELSE 0.0 END AS change_ratio
FROM l GROUP BY canonical_url ORDER BY canonical_url"""


def sql_contamination_overlap(
    k: int, probe_mod: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_contamination_overlap: corpus docs sharing
    >= 1 distinct k-token shingle with any probe (doc_id % probe_mod == 0)
    doc, with the distinct shared-shingle count; self excluded."""
    return f"""
WITH {cte_shingles(k, table)},
cs AS (SELECT DISTINCT doc_id, s FROM shing),
ps AS (
    SELECT DISTINCT doc_id AS probe_id, s FROM shing
    WHERE doc_id % {probe_mod} = 0
)
SELECT cs.doc_id AS corpus_id, ps.probe_id, count(*)::BIGINT AS n_shared
FROM cs JOIN ps ON cs.s = ps.s AND cs.doc_id <> ps.probe_id
GROUP BY 1, 2 ORDER BY 1, 2"""


def sql_doc_repetition_stats(table: str = "documents") -> str:
    """Oracle for plans/queries.q_doc_repetition_stats: per-doc Gopher-style
    repetition signals — top 2-gram occurrence fraction and the fraction of
    3-gram occurrences whose gram repeats; docs with no 3-gram omitted."""
    return f"""
WITH toklist AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
g2 AS (
    SELECT doc_id, array_to_string(tl[i:i+1], ' ') AS g
    FROM toklist, unnest(generate_series(1, len(tl) - 1)) AS r(i)
),
g3 AS (
    SELECT doc_id, array_to_string(tl[i:i+2], ' ') AS g
    FROM toklist, unnest(generate_series(1, len(tl) - 2)) AS r(i)
),
c2 AS (SELECT doc_id, g, count(*)::BIGINT AS cnt FROM g2 GROUP BY 1, 2),
c3 AS (SELECT doc_id, g, count(*)::BIGINT AS cnt FROM g3 GROUP BY 1, 2),
s2 AS (
    SELECT doc_id, sum(cnt)::BIGINT AS n_2grams,
           round(max(cnt)::DOUBLE / sum(cnt), 6) + 0.0 AS top_2gram_frac
    FROM c2 GROUP BY doc_id
),
s3 AS (
    SELECT doc_id,
           round(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END)::DOUBLE
                 / sum(cnt), 6) + 0.0 AS dup_3gram_frac
    FROM c3 GROUP BY doc_id
)
SELECT s2.doc_id, n_2grams, top_2gram_frac, dup_3gram_frac
FROM s2 JOIN s3 ON s2.doc_id = s3.doc_id ORDER BY s2.doc_id"""


def _line_plant(table: str = "documents") -> str:
    """CTE chain `tk, lraw, occ` — the DuckDB twin of
    functions/weblines.planted_lines: same arithmetic line synthesis
    (per-domain header/footer, text split into two halves at
    ceil(n/2) = (n+1)//2, promo line shared by doc x3/x7 of each decade),
    empties dropped, md5 line key. Built independently (UNION ALL with
    literal positions vs Spark's posexplode) so the differential pins the
    whole pipeline."""
    from ..functions.weblines import LINE_DOMAINS

    return f"""tk AS (
    SELECT doc_id, string_split(text, ' ') AS t,
           len(string_split(text, ' ')) AS n,
           (len(string_split(text, ' ')) + 1) // 2 AS h
    FROM {table}
),
lraw AS (
    SELECT doc_id, 0::BIGINT AS pos,
           'nav home about contact domain-' || (doc_id % {LINE_DOMAINS})::VARCHAR AS line
    FROM {table}
    UNION ALL
    SELECT doc_id, 1::BIGINT, array_to_string(list_slice(t, 1, h), ' ')
    FROM tk
    UNION ALL
    SELECT doc_id, 2::BIGINT,
           CASE WHEN n > h THEN array_to_string(list_slice(t, h + 1, n), ' ')
                ELSE '' END
    FROM tk
    UNION ALL
    SELECT doc_id, 3::BIGINT,
           CASE WHEN doc_id % 10 IN (3, 7)
                THEN 'promo code save ' || (doc_id - doc_id % 10 + 3)::VARCHAR
                ELSE '' END
    FROM {table}
    UNION ALL
    SELECT doc_id, 4::BIGINT,
           'copyright site-' || (doc_id % {LINE_DOMAINS})::VARCHAR || ' all rights reserved'
    FROM {table}
),
occ AS (
    SELECT doc_id, pos, line, md5(line) AS line_hash
    FROM lraw WHERE line <> ''
)"""


def sql_line_dup_stats(table: str = "documents") -> str:
    """Oracle for plans/queries.q_line_dup_stats: per-doc count of line
    occurrences whose line appears in >= 2 distinct docs."""
    return f"""
WITH {_line_plant(table)},
dfh AS (
    SELECT line_hash, count(DISTINCT doc_id) AS df_docs
    FROM occ GROUP BY 1
)
SELECT o.doc_id, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_lines,
       round(sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) + 0.0 AS dup_line_ratio
FROM occ o JOIN dfh USING (line_hash)
GROUP BY 1 ORDER BY 1"""


def _link_plant(table: str = "documents") -> str:
    """CTEs `pages(doc_id, src_domain, html)` + `edges(doc_id, src_domain,
    dst_domain)` — the queries._planted_link_html twin: byte-identical
    anchor html synthesized arithmetically, outlink hosts extracted with
    DuckDB's own regexp_extract_all. n (doc_id % 4) counts down through the
    j=0..2 anchor slots exactly like the Spark plant's per-slot F.when."""
    anchors = []
    for j in range(3):
        anchors.append(
            f"CASE WHEN doc_id % 4 > {j} THEN "
            f"'<a href=\"http://site' || ((doc_id * 7 + {j} * 13) % 20) "
            f"|| '.example.com/p/' || doc_id || '\">link</a>' ELSE '' END"
        )
    return f"""
pages AS (
    SELECT doc_id,
           'site' || (doc_id % 20) || '.example.com' AS src_domain,
           {anchors[0]} || '<p>' || text || '</p>' || {anchors[1]} || {anchors[2]}
               AS html
    FROM {table}
),
edges AS (
    SELECT doc_id, src_domain, t.dst AS dst_domain
    FROM pages,
         unnest(regexp_extract_all(html, 'href="http://([a-z0-9.]+)/', 1))
             AS t(dst)
)"""


def sql_domain_link_graph(table: str = "documents") -> str:
    """Oracle for plans/queries.q_domain_link_graph: domain-level edge
    aggregation over the _link_plant extraction."""
    return f"""
WITH {_link_plant(table)}
SELECT src_domain, dst_domain,
       count(*)::BIGINT AS n_links,
       count(DISTINCT doc_id)::BIGINT AS n_pages
FROM edges GROUP BY 1, 2 ORDER BY 1, 2"""


def sql_domain_pagerank(
    scale: int, iters: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_domain_pagerank: the identical fixed-point
    BIGINT recurrence unrolled as chained CTEs — rank r0 = scale // n, each
    round r_{{k+1}}(v) = scale*15 // (100*n) + sum over in-edges of
    (r_k(u)*85) // (100*outdeg(u)). Integer sums are order-independent, so
    the iterative algorithm stays hash-exact across engines."""
    rounds = []
    for k in range(iters):
        rounds.append(f"""
c{k + 1} AS (
    SELECT e.dst_domain AS domain,
           sum((r.r * 85) // (100 * d.outdeg))::BIGINT AS inflow
    FROM de e JOIN deg d USING (src_domain)
    JOIN r{k} r ON r.domain = e.src_domain
    GROUP BY 1
),
r{k + 1} AS (
    SELECT nodes.domain,
           (({scale} * 15) // (100 * nn.n)
            + coalesce(c{k + 1}.inflow, 0))::BIGINT AS r
    FROM nodes CROSS JOIN nn
    LEFT JOIN c{k + 1} ON nodes.domain = c{k + 1}.domain
)""")
    return f"""
WITH {_link_plant(table)},
de AS (SELECT DISTINCT src_domain, dst_domain FROM edges),
deg AS (SELECT src_domain, count(*)::BIGINT AS outdeg FROM de GROUP BY 1),
nodes AS (
    SELECT src_domain AS domain FROM pages
    UNION SELECT dst_domain FROM de
),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
r0 AS (
    SELECT domain, ({scale} // nn.n)::BIGINT AS r FROM nodes CROSS JOIN nn
),{",".join(rounds)}
SELECT domain, r AS pagerank_scaled,
       round(r / {float(scale)}, 6) + 0.0 AS pagerank
FROM r{iters} ORDER BY domain"""


def sql_doc_salient_terms(table: str = "documents") -> str:
    """Oracle for plans/queries.q_doc_salient_terms: per-doc top-3 tokens by
    tf/df (single IEEE division of the same BIGINTs — bit-identical across
    engines), ties token-ascending."""
    return f"""
WITH {cte_tokens(table)},
tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dft AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
s AS (
    SELECT doc_id, tok, tf, df, tf::DOUBLE / df AS score
    FROM tf JOIN dft USING (tok)
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, tok
    ) AS rn FROM s
)
SELECT doc_id, tok AS token, tf, df,
       round(score, 6) + 0.0 AS salience, rn::INT AS rank
FROM r WHERE rn <= 3 ORDER BY doc_id, rank"""


def sql_dedup_funnel(radius: int, table: str = "documents", blacklist=(0,)) -> str:
    """Oracle for plans/queries.q_dedup_funnel: sql_dedup_keep_list folded
    to per-reason counts and corpus fraction (the keep-list SQL runs as a
    subquery — DuckDB allows the nested WITH RECURSIVE)."""
    inner = sql_dedup_keep_list(radius, table, blacklist)
    return f"""
SELECT reason, count(*)::BIGINT AS n_docs,
       round(count(*)::DOUBLE / sum(count(*)) OVER (), 6) + 0.0 AS frac
FROM ({inner}) kl
GROUP BY 1 ORDER BY 1"""


def sql_soft_dedup_weights(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_soft_dedup_weights: sql_dedup_keep_list's
    cluster assignment (nested subquery, the sql_dedup_funnel precedent)
    folded to per-cluster sizes and the 1/size sampling weight."""
    inner = sql_dedup_keep_list(radius, table, blacklist)
    return f"""
WITH kl AS ({inner}),
sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size FROM kl GROUP BY 1)
SELECT doc_id, cluster_id, cluster_size,
       round(1.0::DOUBLE / cluster_size, 6) + 0.0 AS weight
FROM kl JOIN sz USING (cluster_id) ORDER BY doc_id"""


def sql_quality_funnel(
    stopwords: list[str],
    min_tokens: int,
    max_stop_ratio: float,
    min_distinct_ratio: float,
) -> str:
    """Oracle for plans/queries.q_quality_funnel: first-failing-rule verdict
    in the fixed order too_short -> stopword_heavy -> low_diversity ->
    passed over the shared _quality_m_cte arithmetic, folded to per-reason
    counts + corpus fraction."""
    return rf"""
WITH {_quality_m_cte(stopwords)},
v AS (
    SELECT CASE
        WHEN n_tokens < {min_tokens} THEN 'too_short'
        WHEN round(n_stop / greatest(n_tokens, 1), 6) > {max_stop_ratio}
            THEN 'stopword_heavy'
        WHEN round(n_distinct / greatest(n_tokens, 1), 6)
            < {min_distinct_ratio} THEN 'low_diversity'
        ELSE 'passed' END AS reason
    FROM m
)
SELECT reason, count(*)::BIGINT AS n_docs,
       round(count(*)::DOUBLE / sum(count(*)) OVER (), 6) + 0.0 AS frac
FROM v GROUP BY 1 ORDER BY 1"""


def sql_cdc_chunk_stats(w: int, mod: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_cdc_chunk_stats: the CDC boundary rule
    (functions/cdc.chunk_bounds) recomputed as SQL — a position p >= w ends
    a chunk iff the md5-prefix hash32 of the trailing w-char window is
    divisible by mod; the final position always ends one. Chunks are
    re-sliced with lag() over the end positions, hashed, and folded into
    the same per-doc df>=2 stats as the engine. Lengths are CHARACTER
    counts in both engines (Python len == DuckDB length; the corpus is
    ASCII so chars == bytes)."""
    return f"""
WITH bnd AS (
    SELECT doc_id, t.p AS p
    FROM {table}, unnest(generate_series({w}, length(text))) AS t(p)
    WHERE ('0x' || substr(md5(substr(text, t.p - {w - 1}, {w})), 1, 8))::BIGINT
          % {mod} = 0
),
ends AS (
    SELECT doc_id, p AS e FROM bnd
    UNION
    SELECT doc_id, length(text) FROM {table} WHERE length(text) > 0
),
ch AS (
    SELECT doc_id, e,
           coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s
    FROM ends
),
chunks AS (
    SELECT c.doc_id, md5(substr(d.text, c.s, c.e - c.s + 1)) AS h,
           (c.e - c.s + 1)::BIGINT AS clen
    FROM ch c JOIN {table} d USING (doc_id)
),
dfh AS (
    SELECT h, count(*)::BIGINT AS df_docs
    FROM (SELECT DISTINCT doc_id, h FROM chunks) GROUP BY 1
)
SELECT chunks.doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(clen)::BIGINT AS n_bytes,
       sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       sum(CASE WHEN df_docs >= 2 THEN clen ELSE 0 END)::BIGINT AS dup_bytes,
       round(sum(CASE WHEN df_docs >= 2 THEN clen ELSE 0 END)::DOUBLE
             / sum(clen), 6) + 0.0 AS dup_byte_ratio
FROM chunks JOIN dfh USING (h)
GROUP BY 1 ORDER BY 1"""


def sql_dup_gram_stats(k_shingle: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_dup_gram_stats: per-doc distinct-shingle
    count, the subset whose corpus doc-frequency >= 2, and their ratio.
    Groups by the gram STRING where the engine groups by md5(gram) — an
    independent formulation that also pins the engine's 16-byte hash key
    collision-free on the gated corpora."""
    return f"""
WITH {cte_shingles(k_shingle, table)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
dfg AS (SELECT s, count(*)::BIGINT AS df_docs FROM sd GROUP BY s)
SELECT sd.doc_id, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams,
       round(sum(CASE WHEN df_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) + 0.0 AS dup_gram_ratio
FROM sd JOIN dfg USING (s)
GROUP BY sd.doc_id ORDER BY sd.doc_id"""


def sql_dup_span_stats(k_shingle: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_dup_span_stats: per-doc maximal runs of
    consecutive positions whose k-gram occurs in >= 2 docs. Positional
    grams via generate_series (1-based, the kernel's pos contract); df
    groups by the gram STRING where the engine groups by md5(gram) — the
    independent formulation that also pins the 16-byte key collision-free;
    runs via the same pos - row_number() gaps-and-islands identity."""
    return f"""
WITH toklist AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
shing AS (
    SELECT doc_id, i AS pos,
           array_to_string(tl[i:i+{k_shingle - 1}], ' ') AS s
    FROM toklist, unnest(generate_series(1, len(tl) - {k_shingle - 1})) AS r(i)
),
dfg AS (
    SELECT s, count(DISTINCT doc_id)::BIGINT AS df_docs FROM shing GROUP BY s
),
dup AS (SELECT doc_id, pos FROM shing JOIN dfg USING (s) WHERE df_docs >= 2),
runs AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM dup
),
spans AS (
    SELECT doc_id, grp, count(*)::BIGINT AS run_len
    FROM runs GROUP BY doc_id, grp
),
sp AS (
    SELECT doc_id, count(*)::BIGINT AS n_spans,
           sum(run_len)::BIGINT AS n_dup_positions,
           (max(run_len) + {k_shingle - 1})::BIGINT AS longest_span_tokens
    FROM spans GROUP BY doc_id
),
tot AS (
    SELECT doc_id, (len(tl) - {k_shingle - 1})::BIGINT AS n_positions
    FROM toklist WHERE len(tl) >= {k_shingle}
)
SELECT t.doc_id, t.n_positions,
       coalesce(sp.n_dup_positions, 0)::BIGINT AS n_dup_positions,
       coalesce(sp.n_spans, 0)::BIGINT AS n_spans,
       coalesce(sp.longest_span_tokens, 0)::BIGINT AS longest_span_tokens,
       round(coalesce(sp.n_dup_positions, 0)::DOUBLE / t.n_positions, 6)
           + 0.0 AS dup_pos_ratio
FROM tot t LEFT JOIN sp USING (doc_id)
ORDER BY t.doc_id"""


def sql_dup_span_removal(
    k_shingle: int, rmin: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_dup_span_removal: per-gram (df, owner),
    non-owned duplicated gram runs of >= rmin positions, covered-token
    expansion, anti-join, ordered string_agg reassembly, md5 of the
    reconstructed token stream. Independent formulation: gram STRINGS (vs
    the engine's md5 keys), generate_series token expansion (vs
    F.sequence), string_agg ORDER BY (vs sorted collect_list)."""
    return f"""
WITH toklist AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
shing AS (
    SELECT doc_id, i AS pos,
           array_to_string(tl[i:i+{k_shingle - 1}], ' ') AS s
    FROM toklist, unnest(generate_series(1, len(tl) - {k_shingle - 1})) AS r(i)
),
gstat AS (
    SELECT s, count(DISTINCT doc_id)::BIGINT AS df_docs,
           min(doc_id) AS owner
    FROM shing GROUP BY s
),
remv AS (
    SELECT doc_id, pos FROM shing JOIN gstat USING (s)
    WHERE df_docs >= 2 AND owner <> doc_id
),
runs AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM remv
),
spans AS (
    SELECT doc_id, min(pos) AS p0, count(*)::BIGINT AS rl
    FROM runs GROUP BY doc_id, grp HAVING count(*) >= {rmin}
),
remtok AS (
    SELECT DISTINCT doc_id, p0 + j AS tpos
    FROM spans, unnest(generate_series(0, rl + {k_shingle - 2})) AS t(j)
),
toks AS (
    SELECT doc_id, i AS tpos, tl[i] AS tok
    FROM toklist, unnest(generate_series(1, len(tl))) AS r(i)
),
kept AS (
    SELECT t.doc_id, t.tpos, t.tok
    FROM toks t LEFT JOIN remtok r
      ON r.doc_id = t.doc_id AND r.tpos = t.tpos
    WHERE r.tpos IS NULL
),
ka AS (
    SELECT doc_id, count(*)::BIGINT AS n_kept,
           md5(string_agg(tok, ' ' ORDER BY tpos)) AS kept_hash
    FROM kept GROUP BY doc_id
),
tot AS (
    SELECT doc_id, len(tl)::BIGINT AS n_tokens
    FROM toklist WHERE len(tl) >= 1
)
SELECT t.doc_id, t.n_tokens,
       (t.n_tokens - coalesce(ka.n_kept, 0))::BIGINT AS n_removed,
       coalesce(ka.kept_hash, md5('')) AS kept_hash
FROM tot t LEFT JOIN ka USING (doc_id)
ORDER BY t.doc_id"""


def sql_heavy_hitter_grams(
    k_shingle: int, min_df: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_heavy_hitter_grams: grams with corpus
    doc-frequency >= min_df, exact counts — the plain GROUP BY ... HAVING
    formulation the engine's two-pass prune must reproduce exactly (the
    pigeonhole bound guarantees candidate-set completeness, so the outputs
    are identical even though the engine never globally counts the tail)."""
    return f"""
WITH {cte_shingles(k_shingle, table)},
sd AS (SELECT DISTINCT doc_id, s FROM shing)
SELECT s AS gram, count(*)::BIGINT AS df_docs
FROM sd GROUP BY s HAVING count(*) >= {min_df}
ORDER BY gram"""


def _cte_charlm(train_mod: int, table: str = "documents") -> str:
    """Shared CTE chain lp..agg for the char-bigram LM oracles
    (sql_charlm_quality, sql_perplexity_buckets): `agg(doc_id, n_bigrams,
    nlp_micro)`. The quantized log table is the SAME Python-computed
    constant list the engine broadcasts (functions/charlm.LP_MICRO)
    embedded as VALUES — by construction neither engine takes a log, so
    every doc total is exact int64 arithmetic. The model/scoring SQL
    re-derives the counts and quantization independently."""
    from ..functions.charlm import CHARLM_Q, LP_FLOOR, lp_values_sql

    return f"""lp(p_q, lp_micro) AS (VALUES {lp_values_sql()}),
tb AS (
    SELECT substr(text, i, 2) AS bg
    FROM {table}, unnest(generate_series(1, length(text) - 1)) AS r(i)
    WHERE doc_id % {train_mod} = 0
),
c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM tb GROUP BY bg),
c1 AS (SELECT substr(bg, 1, 1) AS a, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1),
model AS (
    SELECT q.bg, lp.lp_micro FROM (
        SELECT c2.bg, greatest(1, (c2.c2 * {CHARLM_Q}) // c1.c1) AS p_q
        FROM c2 JOIN c1 ON substr(c2.bg, 1, 1) = c1.a
    ) q JOIN lp USING (p_q)
),
sb AS (
    SELECT doc_id, substr(text, i, 2) AS bg
    FROM {table}, unnest(generate_series(1, length(text) - 1)) AS r(i)
),
sc AS (SELECT doc_id, bg, count(*)::BIGINT AS cnt FROM sb GROUP BY 1, 2),
agg AS (
    SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams,
           ((-sum(cnt * coalesce(lp_micro, {LP_FLOOR})))
            // sum(cnt))::BIGINT AS nlp_micro
    FROM sc LEFT JOIN model USING (bg) GROUP BY doc_id
)"""


def sql_charlm_quality(
    train_mod: int, max_nlp: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_charlm_quality — see _cte_charlm for the
    no-engine-takes-a-log exactness argument."""
    return f"""
WITH {_cte_charlm(train_mod, table)}
SELECT doc_id, n_bigrams, nlp_micro,
       nlp_micro <= {max_nlp} AS keep_flag
FROM agg ORDER BY doc_id"""


def sql_perplexity_buckets(
    train_mod: int, n_buckets: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_perplexity_buckets: the _cte_charlm score
    joined back to doc lang, NTILE({n_buckets}) per lang over (nlp_micro,
    doc_id) — NTILE's remainder-to-first-buckets rule is SQL-standard in
    both engines — folded to the per-(lang, bucket) summary."""
    return f"""
WITH {_cte_charlm(train_mod, table)},
ranked AS (
    SELECT d.lang, a.nlp_micro,
           ntile({n_buckets}) OVER (
               PARTITION BY d.lang ORDER BY a.nlp_micro, a.doc_id
           ) AS bucket_id
    FROM agg a JOIN {table} d USING (doc_id)
)
SELECT lang,
       CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*)::BIGINT AS n_docs,
       min(nlp_micro)::BIGINT AS nlp_lo,
       max(nlp_micro)::BIGINT AS nlp_hi
FROM ranked GROUP BY 1, 2 ORDER BY 1, 2"""


def sql_length_quantiles(table: str = "documents") -> str:
    """Oracle for plans/queries.q_length_quantiles: per-lang exact discrete
    quantiles of n_chars via the identical BIGINT position arithmetic
    `(n*q + 99) // 100` over a (n_chars, doc_id)-ordered row_number."""
    def pick(q: int) -> str:
        return (
            f"max(CASE WHEN rn = (n * {q} + 99) // 100 "
            f"THEN n_chars END)::BIGINT AS p{q}"
        )

    return f"""
WITH r AS (
    SELECT lang, n_chars::BIGINT AS n_chars,
           row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM {table}
)
SELECT lang, max(n)::BIGINT AS n_docs,
       {pick(25)}, {pick(50)}, {pick(75)}, {pick(95)}
FROM r GROUP BY lang ORDER BY lang"""


def sql_boilerplate_strip(table: str = "documents") -> str:
    """Oracle for plans/queries.q_boilerplate_strip: drop lines with corpus
    doc-frequency >= BOILERPLATE_DF, rebuild each doc in line order
    (string_agg ORDER BY pos vs the engine's struct-sorted collect_list —
    independent formulations of the ordered reconstruction)."""
    from ..functions.weblines import BOILERPLATE_DF

    return f"""
WITH {_line_plant(table)},
dfh AS (
    SELECT line_hash, count(DISTINCT doc_id) AS df_docs
    FROM occ GROUP BY 1
),
kept AS (
    SELECT o.doc_id, o.pos, o.line
    FROM occ o JOIN dfh USING (line_hash)
    WHERE df_docs < {BOILERPLATE_DF}
),
agg AS (
    SELECT doc_id, count(*)::BIGINT AS n_kept,
           string_agg(line, chr(10) ORDER BY pos) AS clean_text
    FROM kept GROUP BY 1
)
SELECT d.doc_id, coalesce(n_kept, 0)::BIGINT AS n_kept,
       coalesce(clean_text, '') AS clean_text
FROM {table} d LEFT JOIN agg USING (doc_id) ORDER BY 1"""


def sql_pii_scrub(table: str = "documents") -> str:
    """Oracle for plans/queries.q_pii_scrub: identical arithmetic PII plant
    (functions/weblines.planted_pii), independent regex engine (RE2 with
    explicit 'g' vs Spark's replace-all Java regex), same pattern strings."""
    from ..functions.weblines import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE

    email = "' contact user' || doc_id::VARCHAR || '@mail.example.com'"
    phone = ("' call +1-555-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0')")
    ip = ("' host 10.' || (doc_id % 250)::VARCHAR || '.0.' || "
          "(doc_id % 200)::VARCHAR")
    return f"""
WITH p AS (
    SELECT doc_id, text ||
        CASE doc_id % 4
            WHEN 0 THEN {email} || {phone} || {ip}
            WHEN 1 THEN {email}
            WHEN 2 THEN {phone}
            ELSE '' END AS raw
    FROM {table}
)
SELECT doc_id,
       len(regexp_extract_all(raw, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(raw, '{PII_PHONE_RE}'))::BIGINT AS n_phones,
       len(regexp_extract_all(raw, '{PII_IP_RE}'))::BIGINT AS n_ips,
       regexp_replace(
           regexp_replace(
               regexp_replace(raw, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_PHONE_RE}', '<PHONE>', 'g'),
           '{PII_IP_RE}', '<IP>', 'g') AS scrubbed
FROM p ORDER BY doc_id"""


def sql_bloom_dedup_incremental(
    m: int, k: int, batch_mod: int = 5, dup_mod: int = 10,
    table: str = "documents",
) -> str:
    """Oracle for plans/queries.q_bloom_dedup_incremental: same md5-derived
    double-hashing positions (h2 forced odd — with m a power of two the k
    probe positions of one key are provably distinct, so count(*) = k IS
    the all-bits-set test), membership recomputed as a set-semijoin instead
    of the engine's numpy bit array."""
    ivals = ", ".join(f"({i})" for i in range(k))
    h1 = "('0x' || substr(h, 1, 8))::BIGINT"
    h2 = "('0x' || substr(h, 9, 8))::BIGINT"
    return f"""
WITH d AS (SELECT doc_id, text FROM {table}),
b0 AS (
    SELECT doc_id, text,
           CASE WHEN doc_id % {dup_mod} = 0 THEN doc_id + 1 ELSE doc_id END
               AS src_id
    FROM d WHERE doc_id % {batch_mod} = 0
),
batch AS (
    SELECT b.doc_id, md5(coalesce(s.text, b.text)) AS h
    FROM b0 b LEFT JOIN d s ON s.doc_id = b.src_id
),
corpus AS (
    SELECT DISTINCT md5(text) AS h FROM d WHERE doc_id % {batch_mod} <> 0
),
ch AS (SELECT {h1} AS h1, {h2} - {h2} % 2 + 1 AS h2p FROM corpus),
cpos AS (
    SELECT DISTINCT (h1 + i.i * h2p) % {m} AS pos
    FROM ch CROSS JOIN (VALUES {ivals}) AS i(i)
),
bh AS (
    SELECT doc_id, h, {h1} AS h1, {h2} - {h2} % 2 + 1 AS h2p FROM batch
),
bpos AS (
    SELECT doc_id, (h1 + i.i * h2p) % {m} AS pos
    FROM bh CROSS JOIN (VALUES {ivals}) AS i(i)
),
hits AS (
    SELECT b.doc_id, count(c.pos) AS nhit
    FROM bpos b LEFT JOIN cpos c USING (pos)
    GROUP BY 1
)
SELECT bh.doc_id,
       (nhit = {k}) AS bloom_positive,
       (nhit = {k} AND c2.h IS NOT NULL) AS is_dup
FROM bh JOIN hits USING (doc_id) LEFT JOIN corpus c2 ON c2.h = bh.h
ORDER BY bh.doc_id"""


def sql_dedup_key_normalize(table: str = "documents") -> str:
    """Oracle for plans/queries.q_dedup_key_normalize: same arithmetic
    variant plant, same RE2-safe pattern strings through DuckDB's regex
    engine (explicit 'g' vs Spark's replace-all)."""
    from ..functions.weblines import DEDUP_PUNCT_RE

    norm = (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"lower(raw), '{DEDUP_PUNCT_RE}', ' ', 'g'), "
        "'[0-9]+', '0', 'g'), ' +', ' ', 'g'))"
    )
    return f"""
WITH d AS (SELECT doc_id, text FROM {table}),
v AS (
    SELECT a.doc_id, b.text AS bt
    FROM (SELECT doc_id, doc_id - doc_id % 4 AS base_id FROM d) a
    JOIN d b ON b.doc_id = a.base_id
),
r AS (
    SELECT doc_id,
           CASE doc_id % 4
               WHEN 0 THEN bt
               WHEN 1 THEN upper(bt) || '  !!'
               WHEN 2 THEN bt || ' price 42 eur'
               ELSE bt || ' PRICE, 77 eur' END AS raw
    FROM v
),
n AS (SELECT doc_id, md5(raw) AS raw_hash, md5({norm}) AS norm_hash FROM r)
SELECT doc_id, raw_hash, norm_hash,
       min(doc_id) OVER (PARTITION BY norm_hash) AS group_min_id
FROM n ORDER BY doc_id"""


def sql_sequence_pack_offsets(cap: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_sequence_pack_offsets: the NAIVE global
    prefix-sum window (fine in DuckDB's single-node world) — the engine's
    two-phase bucketed scan must reproduce it exactly."""
    return f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
    FROM {table}
),
s AS (
    SELECT doc_id, n_tokens,
           (sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens)::BIGINT AS start_offset
    FROM t
)
SELECT doc_id, n_tokens, start_offset,
       (start_offset // {cap})::BIGINT AS seq_id,
       (start_offset % {cap})::BIGINT AS offset_in_seq
FROM s ORDER BY doc_id"""


def sql_pack_efficiency(cap: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_pack_efficiency: per-lang padded-vs-concat
    sequence counts and padding fraction (split-on-single-space token
    counts, the pack family convention)."""
    return f"""
WITH t AS (
    SELECT lang, len(string_split(text, ' '))::BIGINT AS n FROM {table}
),
a AS (
    SELECT lang, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS n_tokens,
           sum((n + {cap - 1}) // {cap})::BIGINT AS n_seqs_padded
    FROM t GROUP BY lang
)
SELECT lang, n_docs, n_tokens, n_seqs_padded,
       ((n_tokens + {cap - 1}) // {cap})::BIGINT AS n_seqs_concat,
       (n_seqs_padded * {cap} - n_tokens)::BIGINT AS pad_tokens,
       round((n_seqs_padded * {cap} - n_tokens)::DOUBLE
             / (n_seqs_padded * {cap}), 6) + 0.0 AS pad_frac
FROM a ORDER BY lang"""


def sql_minhash_long(params: MinHashParams, k_shingle: int, table: str = "documents") -> str:
    """(doc_id, i, v) long-format MinHash signature; docs w/o shingles omitted."""
    vals = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(zip(params.a, params.b)))
    return f"""
WITH {cte_shingles(k_shingle, table)},
sh_h AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing),
params (i, a, b) AS (VALUES {vals})
SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
FROM sh_h CROSS JOIN params
GROUP BY doc_id, i ORDER BY doc_id, i"""


def sql_minhash_band_pairs(
    params: MinHashParams, k_shingle: int, n_bands: int, rows_per_band: int,
    table: str = "documents",
) -> str:
    """Candidate pairs sharing >= 1 MinHash band, with shared-band count."""
    vals = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(zip(params.a, params.b)))
    return f"""
WITH {cte_shingles(k_shingle, table)},
sh_h AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing),
params (i, a, b) AS (VALUES {vals}),
mh AS (
    SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
    FROM sh_h CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
    SELECT doc_id, i // {rows_per_band} AS band_id,
           string_agg(v, ',' ORDER BY i) AS band_key
    FROM mh WHERE i < {n_bands * rows_per_band}
    GROUP BY doc_id, i // {rows_per_band}
)
SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, count(*)::BIGINT AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id ORDER BY id_lo, id_hi"""


def sql_minhash_recall_audit(
    params: MinHashParams, k_shingle: int, n_bands: int, rows_per_band: int,
    table: str = "documents",
) -> str:
    """Oracle for plans/queries.q_minhash_recall_audit: truth pairs from
    the exact distinct-shingle-hash Jaccard (2*i >= u integer boundary),
    bucketed by (10*i) // u, left-joined against the banded MinHash
    candidate pairs. Re-derives BOTH legs independently of the engine's
    operators (shared-gram self-join for the truth leg vs the engine's
    prefix filter; band string_agg keys vs the engine's struct keys)."""
    vals = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(zip(params.a, params.b))
    )
    return f"""
WITH {cte_shingles(k_shingle, table)},
sh_h AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh_h GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, count(*)::BIGINT AS i
    FROM sh_h a JOIN sh_h b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
ex AS (
    SELECT id_lo, id_hi, (10 * i) // (sa.n + sb.n - i) AS bucket_tenths
    FROM inter JOIN sizes sa ON sa.doc_id = id_lo
               JOIN sizes sb ON sb.doc_id = id_hi
    WHERE 2 * i >= sa.n + sb.n - i
),
params (i, a, b) AS (VALUES {vals}),
mh AS (
    SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
    FROM sh_h CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
    SELECT doc_id, i // {rows_per_band} AS band_id,
           string_agg(v, ',' ORDER BY i) AS band_key
    FROM mh WHERE i < {n_bands * rows_per_band}
    GROUP BY doc_id, i // {rows_per_band}
),
cpair AS (
    SELECT DISTINCT a.doc_id AS id_lo, b.doc_id AS id_hi
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
)
SELECT e.bucket_tenths, count(*)::BIGINT AS n_pairs,
       sum(CASE WHEN c.id_lo IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_caught,
       round(sum(CASE WHEN c.id_lo IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) + 0.0 AS recall
FROM ex e LEFT JOIN cpair c
  ON c.id_lo = e.id_lo AND c.id_hi = e.id_hi
GROUP BY e.bucket_tenths ORDER BY e.bucket_tenths"""


def sql_minhash_dedup_clusters(
    params: MinHashParams, k_shingle: int, n_bands: int, rows_per_band: int,
    table: str = "documents",
) -> str:
    """Oracle for plans/queries.q_minhash_dedup_clusters: the band-pair
    edges of sql_minhash_band_pairs closed into connected components via a
    recursive CTE (the sql_simhash_clusters shape); every doc — including
    degenerate no-shingle docs, which band nowhere — gets a cluster
    (singletons = own id)."""
    vals = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(zip(params.a, params.b))
    )
    return f"""
WITH RECURSIVE {cte_shingles(k_shingle, table)},
sh_h AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing),
params (i, a, b) AS (VALUES {vals}),
mh AS (
    SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
    FROM sh_h CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
    SELECT doc_id, i // {rows_per_band} AS band_id,
           string_agg(v, ',' ORDER BY i) AS band_key
    FROM mh WHERE i < {n_bands * rows_per_band}
    GROUP BY doc_id, i // {rows_per_band}
),
pairs AS (
    SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach (src, dst) AS (
    SELECT doc_id, doc_id FROM {table}
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src ORDER BY doc_id"""


def sql_minhash_jaccard_estimate(
    params: MinHashParams, k_shingle: int, n_bands: int, rows_per_band: int,
    table: str = "documents",
) -> str:
    """Oracle for plans/queries.q_minhash_jaccard_estimate: the band-pair
    candidates (sql_minhash_band_pairs arithmetic), per-component equality
    count over the full signature, exact distinct-shingle Jaccard, and
    their absolute error — est/exact computed from the same raw integer
    terms in both engines before the one round6."""
    n_perm = len(params.a)
    vals = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(zip(params.a, params.b))
    )
    return f"""
WITH {cte_shingles(k_shingle, table)},
sh_h AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing),
params (i, a, b) AS (VALUES {vals}),
mh AS (
    SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
    FROM sh_h CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
    SELECT doc_id, i // {rows_per_band} AS band_id,
           string_agg(v, ',' ORDER BY i) AS band_key
    FROM mh WHERE i < {n_bands * rows_per_band}
    GROUP BY doc_id, i // {rows_per_band}
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_lo, b.doc_id AS id_hi
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
eqc AS (
    SELECT p.id_lo, p.id_hi,
           sum(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END)::BIGINT AS n_eq
    FROM pairs p
    JOIN mh ma ON ma.doc_id = p.id_lo
    JOIN mh mb ON mb.doc_id = p.id_hi AND mb.i = ma.i
    GROUP BY p.id_lo, p.id_hi
),
szs AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh_h GROUP BY doc_id),
inter AS (
    SELECT p.id_lo, p.id_hi, count(*)::BIGINT AS n_int
    FROM pairs p
    JOIN sh_h a ON a.doc_id = p.id_lo
    JOIN sh_h b ON b.doc_id = p.id_hi AND b.h = a.h
    GROUP BY p.id_lo, p.id_hi
)
SELECT e.id_lo, e.id_hi,
       round(e.n_eq / {float(n_perm)}, 6) + 0.0 AS est_jaccard,
       round(coalesce(i.n_int, 0)::DOUBLE
             / (sa.n + sb.n - coalesce(i.n_int, 0)), 6) + 0.0 AS exact_jaccard,
       round(abs(e.n_eq / {float(n_perm)}
                 - coalesce(i.n_int, 0)::DOUBLE
                   / (sa.n + sb.n - coalesce(i.n_int, 0))), 6) + 0.0 AS abs_err
FROM eqc e
LEFT JOIN inter i ON i.id_lo = e.id_lo AND i.id_hi = e.id_hi
JOIN szs sa ON sa.doc_id = e.id_lo
JOIN szs sb ON sb.doc_id = e.id_hi
ORDER BY e.id_lo, e.id_hi"""


def sql_minhash_pairs_cross_source(
    params: MinHashParams, k_shingle: int, n_bands: int, rows_per_band: int
) -> str:
    base = sql_minhash_band_pairs(params, k_shingle, n_bands, rows_per_band)
    return f"""
WITH pairs AS ({base})
SELECT p.id_lo, p.id_hi, p.n_shared_bands
FROM pairs p
JOIN documents a ON a.doc_id = p.id_lo
JOIN documents b ON b.doc_id = p.id_hi
WHERE a.source <> b.source"""


def sql_site_doc_groups() -> str:
    return """
SELECT source, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
FROM documents GROUP BY source"""


def sql_source_integrity() -> str:
    return """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct,
       round(count(DISTINCT md5(text)) / count(*), 6) AS uniq_ratio,
       (count(DISTINCT md5(text)) / count(*) < 0.5) AS is_suspect
FROM documents GROUP BY source"""


def sql_deterministic_sample() -> str:
    return """
SELECT doc_id, n_chars FROM documents
WHERE substring(md5(doc_id::VARCHAR), 1, 1) = '0'"""


def sql_shard_balance(n_shards: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_shard_balance: md5(doc_id) hex-prefix
    shard assignment (the J11 hash discipline), per-shard totals, shares
    over the bounded aggregate."""
    return f"""
WITH d AS (
    SELECT {sql_md5_prefix_mod('doc_id::VARCHAR', n_shards)} AS shard_id,
           len(string_split(text, ' '))::BIGINT AS n_tok,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM {table}
),
a AS (
    SELECT shard_id, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
           sum(n_bytes)::BIGINT AS n_bytes
    FROM d GROUP BY shard_id
)
SELECT shard_id, n_docs, n_tokens, n_bytes,
       round(n_docs::DOUBLE / sum(n_docs) OVER (), 6) + 0.0 AS doc_share,
       round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) + 0.0 AS token_share
FROM a ORDER BY shard_id"""


def sql_stratified_sample(lo: int, hi: int, k: int) -> str:
    """Oracle for plans/queries.q_stratified_sample: same whitespace
    tokenization (the _quality_m_cte discipline), same band edges, same
    md5(doc_id) reservoir order with doc_id tie-break."""
    return rf"""
WITH t AS (
    SELECT doc_id, lang,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS n_tok
    FROM documents
),
b AS (
    SELECT lang,
           CASE WHEN n_tok < {lo} THEN 'short'
                WHEN n_tok < {hi} THEN 'medium'
                ELSE 'long' END AS band,
           doc_id,
           md5(doc_id::VARCHAR) AS samp_key
    FROM t
),
w AS (
    SELECT lang, band, doc_id, samp_key,
           row_number() OVER (
               PARTITION BY lang, band ORDER BY samp_key, doc_id
           )::INT AS samp_rank
    FROM b
)
SELECT lang, band, doc_id, samp_rank FROM w
WHERE samp_rank <= {k} ORDER BY lang, band, samp_rank"""


def sql_events_hourly_rate() -> str:
    # hour bucket via epoch arithmetic + strftime on a NAIVE timestamp
    # (make_timestamp) — TZ-free in any DuckDB session, mirroring the Spark
    # side's arithmetic bucket (queries.q_events_hourly_rate).
    return """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000),
                '%Y-%m-%d %H:00:00') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 6) AS sum_value,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1, 2"""


def sql_crawl_rate_hourly() -> str:
    # batch twin of streaming crawl_rate (1-hour event-time windows over
    # events-as-pages); same TZ-free epoch bucketing as events_hourly_rate
    return """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000),
                '%Y-%m-%d %H:00:00') AS window_start,
       strftime(make_timestamp((CAST(floor(epoch(ts) / 3600) AS BIGINT) + 1) * 3600 * 1000000),
                '%Y-%m-%d %H:00:00') AS window_end,
       event_type AS lang,
       count(*) AS n_pages
FROM events GROUP BY 1, 2, 3"""


# --- query-for-query oracles for plans/queries.py ---------------------------

def sql_exact_dup_groups() -> str:
    return """
SELECT md5(text) AS text_hash, count(*) AS n_docs
FROM documents GROUP BY md5(text) HAVING count(*) >= 2"""


def sql_exact_hash_rows() -> str:
    return """
SELECT doc_id, md5(text) AS text_hash FROM documents
WHERE md5(text) IN (SELECT md5(text) FROM documents WHERE doc_id % 50 = 0)"""


def sql_simhash_radius_search(radius: int) -> str:
    return f"""
WITH {cte_simhash('documents')}
SELECT q.doc_id AS q_id, c.doc_id AS match_id,
       bit_count(xor(q.simhash, c.simhash))::INT AS distance
FROM sh q JOIN sh c ON q.doc_id % 100 = 0
WHERE bit_count(xor(q.simhash, c.simhash)) <= {radius}"""


def sql_best_simhash_match(radius: int, blacklist=(0,)) -> str:
    bl = ", ".join(str(b) for b in blacklist)
    return f"""
WITH {cte_simhash('documents')},
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v,
           bit_count(xor(a.simhash, b.simhash))::INT AS distance
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
sym AS (
    SELECT u AS doc_id, v AS match_id, distance FROM pairs
    UNION ALL SELECT v, u, distance FROM pairs
),
ranked AS (
    SELECT doc_id, match_id, distance,
           row_number() OVER (PARTITION BY doc_id ORDER BY distance ASC, match_id ASC) AS rn
    FROM sym
)
SELECT doc_id, match_id AS best_match_id, distance FROM ranked WHERE rn = 1"""


def sql_match_count_histogram(radius: int, blacklist=(0,)) -> str:
    bl = ", ".join(str(b) for b in blacklist)
    return f"""
WITH {cte_simhash('documents')},
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
per_doc AS (
    SELECT doc_id, count(*) AS n_matches FROM (
        SELECT u AS doc_id FROM pairs UNION ALL SELECT v FROM pairs
    ) GROUP BY doc_id
)
SELECT n_matches, count(*) AS n_docs FROM per_doc GROUP BY n_matches"""


def sql_ngram_jaccard_pairs(n: int = 3, threshold: float = 0.5) -> str:
    return f"""
WITH grams AS (
    SELECT DISTINCT doc_id, substr(text, i, {n}) AS gram
    FROM documents, unnest(generate_series(1, length(text) - {n - 1})) AS r(i)
    WHERE length(text) >= {n}
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
shared AS (
    SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, count(*) AS n_shared
    FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_lo, id_hi, n_shared,
       round(n_shared / (x.n + y.n - n_shared), 6) AS jaccard
FROM shared s JOIN sizes x ON s.id_lo = x.doc_id JOIN sizes y ON s.id_hi = y.doc_id
WHERE round(n_shared / (x.n + y.n - n_shared), 6) >= {threshold}"""


def sql_containment_pairs(k_shingle: int = 5) -> str:
    return f"""
WITH tok AS (
    SELECT doc_id, text,
           len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
    FROM documents
)
SELECT a.doc_id AS inner_id, b.doc_id AS outer_id
FROM tok a JOIN tok b
  ON a.doc_id <> b.doc_id AND length(a.text) < length(b.text)
 AND a.nt >= {k_shingle}
 AND contains(b.text, a.text)"""


def sql_doc_stats() -> str:
    return """
WITH t AS (
    SELECT doc_id, length(text)::BIGINT AS n_chars,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM documents
)
SELECT doc_id, n_chars, len(tl)::BIGINT AS n_tokens,
       len(list_distinct(tl))::BIGINT AS n_distinct_tokens,
       round(len(list_distinct(tl)) / greatest(len(tl), 1), 6) AS distinct_ratio
FROM t"""


def sql_token_stats_bpe() -> str:
    from ..functions.bpe import sql_bpe_encode

    return f"""
WITH t AS (
    SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM documents
),
ex AS (SELECT doc_id, unnest(tl) AS tok FROM t),
enc AS (SELECT doc_id, {sql_bpe_encode('tok')} AS e FROM ex),
sub AS (
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           sum(len(string_split(e, chr(1))) - 1)::BIGINT AS n_subwords
    FROM enc GROUP BY doc_id
)
SELECT t.doc_id, coalesce(sub.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(sub.n_subwords, 0)::BIGINT AS n_subwords
FROM t LEFT JOIN sub ON t.doc_id = sub.doc_id"""


def sql_title_typo_pairs(table: str = "documents") -> str:
    """Oracle for plans/queries.q_title_typo_pairs: the planted-title twin
    (queries._planted_titles) joined ALL-PAIRS with DuckDB's own levenshtein
    — the brute-force ground truth the SymSpell deletion-neighborhood join
    must reproduce with recall 1.0."""
    plant = """
t AS (
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN base
             WHEN 1 THEN substr(base, 1, p - 1) || substr(base, p + 1, L)
             WHEN 2 THEN substr(base, 1, p - 1) || 'Z' || substr(base, p + 1, L)
             ELSE substr(base, 1, p) || 'q' || substr(base, p + 1, L)
           END AS title
    FROM (
        SELECT doc_id,
               'page title about topic ' || (doc_id // 4) AS base,
               length('page title about topic ' || (doc_id // 4)) AS L,
               ((doc_id // 4) % length('page title about topic ' || (doc_id // 4))) + 1 AS p
        FROM {table}
    )
)""".replace("{table}", table)
    return f"""
WITH {plant}
SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
       levenshtein(a.title, b.title)::INT AS lev
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 1
ORDER BY 1, 2"""


def sql_vocab_stats(table: str = "documents") -> str:
    """Oracle for plans/queries.q_vocab_stats: corpus vocabulary profile
    folded from per-token occurrence counts. Every count is cast ::BIGINT
    (the transport-strict HUGEINT discipline)."""
    return f"""
WITH {cte_tokens(table)},
freq AS (SELECT tok, count(*)::BIGINT AS n FROM toks GROUP BY 1)
SELECT sum(n)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_types,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           + 0.0 AS hapax_frac,
       round(max(n)::DOUBLE / sum(n), 6) + 0.0 AS top_token_share
FROM freq"""


def sql_pair_distance_histogram(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_pair_distance_histogram: brute-force
    Hamming pairs within the calibration radius, folded by distance."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH {cte_simhash(table)}
SELECT bit_count(xor(a.simhash, b.simhash))::INT AS distance,
       count(*)::BIGINT AS n_pairs
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
  AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
GROUP BY 1 ORDER BY 1"""


def sql_lang_top_terms() -> str:
    return """
WITH g AS (
    SELECT DISTINCT lang, doc_id, t.tok AS token
    FROM documents, unnest(list_filter(string_split_regex(text, '\\s+'),
                                       x -> x <> '')) AS t(tok)
),
freq AS (SELECT lang, token, count(*)::BIGINT AS doc_freq FROM g GROUP BY lang, token),
ranked AS (
    SELECT lang, token, doc_freq,
           row_number() OVER (PARTITION BY lang ORDER BY doc_freq DESC, token ASC) AS rank
    FROM freq
)
SELECT lang, token, doc_freq, rank::INT AS rank FROM ranked WHERE rank <= 10"""


def sql_langid_heuristic(markers: dict[str, list[str]]) -> str:
    legs = []
    for lang in sorted(markers):
        toks = ", ".join("'" + t.replace("'", "''") + "'" for t in markers[lang])
        legs.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_filter(tl, x -> x IN ({toks})))::BIGINT AS score FROM t"
        )
    union = " UNION ALL ".join(legs)
    return f"""
WITH t AS (
    SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM documents
),
scores AS ({union}),
ranked AS (
    SELECT doc_id, lang, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
    FROM scores
)
SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_guess, score
FROM ranked WHERE rn = 1"""


def sql_langid_confusion(markers: dict[str, list[str]]) -> str:
    """Oracle for plans/queries.q_langid_confusion: the langid arithmetic of
    sql_langid_heuristic joined back to the corpus labels, aggregated to the
    confusion matrix with per-label shares."""
    base = sql_langid_heuristic(markers)
    return f"""
WITH pred AS ({base}),
cells AS (
    SELECT d.lang, p.lang_guess, count(*)::BIGINT AS n_docs
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.lang_guess
),
tot AS (SELECT lang, sum(n_docs)::BIGINT AS t FROM cells GROUP BY lang)
SELECT c.lang, c.lang_guess, c.n_docs,
       round(c.n_docs::DOUBLE / t.t, 6) + 0.0 AS label_share,
       (c.lang = c.lang_guess) AS is_correct
FROM cells c JOIN tot t ON t.lang = c.lang
ORDER BY c.lang, c.lang_guess"""


def sql_doc_fingerprint(k_shingle: int = 5) -> str:
    return f"""
WITH {cte_shingles(k_shingle, 'documents')},
h AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS hv FROM shing)
SELECT doc_id, min(hv) AS min_shingle, count(*)::BIGINT AS n_distinct_shingles
FROM h GROUP BY doc_id"""


def _cte_emb(scale: int) -> str:
    return f"""
ev AS (
    SELECT vec_id, i, round(embedding[i]::DOUBLE * {scale})::BIGINT AS v
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS r(i)
),
norms AS (SELECT vec_id, sum(v * v)::BIGINT AS n2 FROM ev GROUP BY vec_id)"""


def sql_embedding_knn(scale: int, k: int = 3) -> str:
    return f"""
WITH {_cte_emb(scale)},
dots AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, sum(a.v * b.v)::BIGINT AS dot
    FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id <> b.vec_id
    GROUP BY a.vec_id, b.vec_id
),
scored AS (
    SELECT d.vec_id, d.neighbor_id,
           round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
    FROM dots d JOIN norms x ON d.vec_id = x.vec_id
                JOIN norms y ON d.neighbor_id = y.vec_id
),
ranked AS (
    SELECT vec_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT vec_id, neighbor_id, rank::INT AS rank, cosine FROM ranked WHERE rank <= {k}"""


def sql_embedding_near_pairs(scale: int, threshold: float) -> str:
    return f"""
WITH {_cte_emb(scale)},
dots AS (
    SELECT a.vec_id AS id_lo, b.vec_id AS id_hi, sum(a.v * b.v)::BIGINT AS dot
    FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
)
SELECT id_lo, id_hi, round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
FROM dots d JOIN norms x ON d.id_lo = x.vec_id JOIN norms y ON d.id_hi = y.vec_id
WHERE round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) >= {threshold}"""


def _cte_hyperplane_lsh(
    dim: int,
    scale: int,
    n_planes: int = 64,
    n_bands: int = 8,
    seed: int = 42,
) -> str:
    """CTEs ending in `hpairs(id_lo, id_hi)`: the banded hyperplane-LSH
    candidate pairs, recomputed exactly — the plane matrix is the same seeded
    fixed-point int64 constants the engine uses (operators/ann.hyperplanes_int),
    so signatures are bit-identical across engines."""
    from ..operators.ann import hyperplanes_int

    planes = hyperplanes_int(dim, n_planes, seed)
    vals = ", ".join(
        f"({p}, {j + 1}, {int(planes[p, j])}::BIGINT)"
        for p in range(n_planes)
        for j in range(dim)
    )
    bw = n_planes // n_bands
    return f"""
ev AS (
    -- eligibility gate: EXACTLY dim elements. The engine excludes
    -- wrong-dim vectors outright (the kernel would mask them to sig 0
    -- while a partial-dot SQL signature would be nonzero); len = dim
    -- here keeps the two element sets identical by construction.
    SELECT vec_id, i, round(embedding[i]::DOUBLE * {scale})::BIGINT AS v
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS r(i)
    WHERE len(embedding) = {dim}
),
norms AS (SELECT vec_id, sum(v * v)::BIGINT AS n2 FROM ev GROUP BY vec_id),
planes (p, j, c) AS (VALUES {vals}),
pdots AS (
    SELECT vec_id, p, sum(v * c)::BIGINT AS d
    FROM ev JOIN planes ON ev.i = planes.j GROUP BY vec_id, p
),
sigs AS (
    SELECT vec_id,
           sum(CASE WHEN d >= 0 THEN
                 CASE WHEN p = 63 THEN {INT64_MIN_SQL} ELSE (1::BIGINT << p) END
               ELSE 0 END)::BIGINT AS sig
    FROM pdots GROUP BY vec_id
),
bands AS (
    -- arithmetic >> then & mask == logical band extraction (mask kills the
    -- sign-extension bits); mirrors columns.band_key
    SELECT vec_id, b.b AS band_id, (sig >> (b.b * {bw})) & {(1 << bw) - 1} AS band_key
    FROM sigs, unnest(generate_series(0, {n_bands - 1})) AS b(b)
)"""


def sql_embedding_knn_ann(
    dim: int,
    scale: int,
    k: int = 3,
    hamming_radius: int = 28,
    n_bands: int = 8,
    seed: int = 42,
) -> str:
    """Oracle for the full ANN plan: hyperplane signatures -> banded
    candidates -> Hamming radius -> exact scaled-cosine top-k. Candidacy is
    part of the spec (a pair sharing no band is correctly absent), so the
    check is hash-exact, not recall-statistical."""
    return f"""
WITH {_cte_hyperplane_lsh(dim, scale, n_bands=n_bands, seed=seed)},
cand AS (
    SELECT a.vec_id AS id_lo, b.vec_id AS id_hi
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
hpairs AS (
    SELECT id_lo, id_hi FROM cand
    JOIN sigs sa ON sa.vec_id = cand.id_lo
    JOIN sigs sb ON sb.vec_id = cand.id_hi
    WHERE bit_count(xor(sa.sig, sb.sig)) <= {hamming_radius}
),
expanded AS (
    SELECT id_lo AS qid, id_hi AS nid FROM hpairs
    UNION ALL SELECT id_hi, id_lo FROM hpairs
),
cdots AS (
    SELECT q.qid, q.nid, sum(a.v * b.v)::BIGINT AS dot
    FROM expanded q
    JOIN ev a ON a.vec_id = q.qid
    JOIN ev b ON b.vec_id = q.nid AND b.i = a.i
    GROUP BY q.qid, q.nid
),
scored AS (
    SELECT d.qid, d.nid,
           round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
    FROM cdots d JOIN norms x ON d.qid = x.vec_id JOIN norms y ON d.nid = y.vec_id
),
ranked AS (
    SELECT qid, nid, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
    FROM scored
)
SELECT qid AS vec_id, nid AS neighbor_id, rank::INT AS rank, cosine
FROM ranked WHERE rank <= {k}"""


def sql_embedding_near_pairs_ann(
    dim: int,
    scale: int,
    threshold: float,
    hamming_radius: int = 28,
    n_bands: int = 8,
    seed: int = 42,
) -> str:
    """Oracle for the ANN-routed near-pairs scale path (operators/ann.ann_near_pairs)."""
    return f"""
WITH {_cte_hyperplane_lsh(dim, scale, n_bands=n_bands, seed=seed)},
cand AS (
    SELECT a.vec_id AS id_lo, b.vec_id AS id_hi
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
hpairs AS (
    SELECT id_lo, id_hi FROM cand
    JOIN sigs sa ON sa.vec_id = cand.id_lo
    JOIN sigs sb ON sb.vec_id = cand.id_hi
    WHERE bit_count(xor(sa.sig, sb.sig)) <= {hamming_radius}
),
cdots AS (
    SELECT q.id_lo, q.id_hi, sum(a.v * b.v)::BIGINT AS dot
    FROM hpairs q
    JOIN ev a ON a.vec_id = q.id_lo
    JOIN ev b ON b.vec_id = q.id_hi AND b.i = a.i
    GROUP BY q.id_lo, q.id_hi
)
SELECT d.id_lo, d.id_hi, round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
FROM cdots d JOIN norms x ON d.id_lo = x.vec_id JOIN norms y ON d.id_hi = y.vec_id
WHERE round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) >= {threshold}"""


def _cte_ivf(
    scale: int, n_cells: int, nprobe: int, hot_cap: int | None = None
) -> str:
    """CTEs ending in `cand(qid, nid)`: the IVF-flat quantizer replayed in
    SQL — md5-sampled centroid table, exact integer-scaled cell assignment,
    nprobe cell probing — so cell candidacy is part of the differential spec
    and checks over it are hash-exact (a neighbor in an unprobed cell is
    correctly absent from BOTH engines). `+ 0.0` normalizes a rounded -0.0
    so the two engines order the zero cosine identically (mirrors
    operators/ivf.ivf_topk). `hot_cap` mirrors the engine's S13 skew knob
    (operators/ivf._ivf_candidates): cells whose inverted list exceeds the
    cap are excluded from candidacy, expressed as a GROUP BY ... HAVING
    semi-join — so capped plans stay under the hash-exact differential
    contract instead of silently diverging."""
    members_leg = (
        "SELECT m.cell_id, m.nid FROM members_all m JOIN ("
        f"SELECT cell_id FROM members_all GROUP BY cell_id HAVING count(*) <= {hot_cap}"
        ") ok USING (cell_id)"
        if hot_cap is not None
        else "SELECT cell_id, nid FROM members_all"
    )
    return f"""{_cte_emb(scale)},
csample AS (
    -- sample AFTER dropping null/empty embeddings, mirroring the engine's
    -- vecs filter: such rows exist nowhere in either plan
    SELECT vec_id FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) > 0
    ORDER BY md5(vec_id::VARCHAR) ASC, vec_id ASC LIMIT {n_cells}
),
cents AS (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(vec_id::VARCHAR) ASC, vec_id ASC) - 1
               AS cell_id
    FROM csample
),
cvec AS (SELECT c.cell_id, e.i, e.v FROM cents c JOIN ev e USING (vec_id)),
cnorm AS (SELECT cell_id, sum(v * v)::BIGINT AS n2 FROM cvec GROUP BY cell_id),
adots AS (
    SELECT e.vec_id, c.cell_id, sum(e.v * c.v)::BIGINT AS dot
    FROM ev e JOIN cvec c ON c.i = e.i
    GROUP BY e.vec_id, c.cell_id
),
assign AS (
    SELECT a.vec_id, a.cell_id,
           round(dot / (sqrt(nv.n2) * sqrt(cn.n2)), 6) + 0.0 AS ccos
    FROM adots a
    JOIN norms nv ON nv.vec_id = a.vec_id
    JOIN cnorm cn ON cn.cell_id = a.cell_id
),
ranked_cells AS (
    SELECT vec_id, cell_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cell_id ASC) AS r
    FROM assign
),
members_all AS (SELECT cell_id, vec_id AS nid FROM ranked_cells WHERE r = 1),
members AS ({members_leg}),
probes  AS (SELECT cell_id, vec_id AS qid FROM ranked_cells WHERE r <= {nprobe}),
cand AS (
    SELECT p.qid, m.nid FROM probes p JOIN members m USING (cell_id)
    WHERE p.qid <> m.nid
)"""


def sql_embedding_knn_ivf(
    scale: int,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    hot_cap: int | None = None,
) -> str:
    """Oracle for the IVF-flat top-k plan (operators/ivf.ivf_topk); see
    _cte_ivf for the differential-spec contract."""
    return f"""
WITH {_cte_ivf(scale, n_cells, nprobe, hot_cap)},
cdots AS (
    SELECT q.qid, q.nid, sum(a.v * b.v)::BIGINT AS dot
    FROM cand q
    JOIN ev a ON a.vec_id = q.qid
    JOIN ev b ON b.vec_id = q.nid AND b.i = a.i
    GROUP BY q.qid, q.nid
),
scored AS (
    SELECT d.qid, d.nid, round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
    FROM cdots d JOIN norms x ON d.qid = x.vec_id JOIN norms y ON d.nid = y.vec_id
),
ranked AS (
    SELECT qid, nid, cosine,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cosine DESC, nid ASC) AS rank
    FROM scored
)
SELECT qid AS vec_id, nid AS neighbor_id, rank::INT AS rank, cosine
FROM ranked WHERE rank <= {k}"""


def sql_embedding_near_pairs_ivf(
    scale: int,
    threshold: float,
    n_cells: int = 16,
    nprobe: int = 4,
    hot_cap: int | None = None,
) -> str:
    """Oracle for the IVF-routed near-pairs plan (operators/ivf.
    ivf_near_pairs): directed probe candidates canonicalized to undirected
    pairs, exact cosine, threshold filter; see _cte_ivf for the
    differential-spec contract."""
    return f"""
WITH {_cte_ivf(scale, n_cells, nprobe, hot_cap)},
pairs AS (
    SELECT least(qid, nid) AS id_lo, greatest(qid, nid) AS id_hi
    FROM cand GROUP BY 1, 2
),
cdots AS (
    SELECT p.id_lo, p.id_hi, sum(a.v * b.v)::BIGINT AS dot
    FROM pairs p
    JOIN ev a ON a.vec_id = p.id_lo
    JOIN ev b ON b.vec_id = p.id_hi AND b.i = a.i
    GROUP BY p.id_lo, p.id_hi
)
SELECT d.id_lo, d.id_hi, round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
FROM cdots d JOIN norms x ON d.id_lo = x.vec_id JOIN norms y ON d.id_hi = y.vec_id
WHERE round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) >= {threshold}"""


def _recall_audit_mid(k: int) -> str:
    """Shared CTE text for the ANN recall audits: assumes `ev`, `norms` and
    a DIRECTED candidate CTE `dir_cand(qid, nid)` exist; defines the exact
    x-ranking and the candidate v-ranking, ending in the two k-set CTEs
    `ex` / `an`."""
    return f"""xdots AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           sum(a.v * b.v)::BIGINT AS dot
    FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id <> b.vec_id
    GROUP BY a.vec_id, b.vec_id
),
xscored AS (
    SELECT d.vec_id, d.neighbor_id,
           round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
    FROM xdots d JOIN norms x ON d.vec_id = x.vec_id
                 JOIN norms y ON d.neighbor_id = y.vec_id
),
xrank AS (
    SELECT vec_id, neighbor_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM xscored
),
ex AS (SELECT vec_id, neighbor_id FROM xrank WHERE rank <= {k}),
vdots AS (
    SELECT q.qid, q.nid, sum(a.v * b.v)::BIGINT AS dot
    FROM dir_cand q
    JOIN ev a ON a.vec_id = q.qid
    JOIN ev b ON b.vec_id = q.nid AND b.i = a.i
    GROUP BY q.qid, q.nid
),
vscored AS (
    SELECT d.qid, d.nid,
           round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) + 0.0 AS cosine
    FROM vdots d JOIN norms x ON d.qid = x.vec_id
                 JOIN norms y ON d.nid = y.vec_id
),
vrank AS (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cosine DESC, nid ASC) AS rank
    FROM vscored
),
an AS (SELECT qid AS vec_id, nid AS neighbor_id FROM vrank WHERE rank <= {k})"""


_RECALL_AUDIT_TAIL = """ecnt AS (SELECT vec_id, count(*)::BIGINT AS n_exact FROM ex GROUP BY vec_id),
acnt AS (SELECT vec_id, count(*)::BIGINT AS n_ann FROM an GROUP BY vec_id),
mcnt AS (
    SELECT e.vec_id, count(*)::BIGINT AS n_matched
    FROM ex e JOIN an a
      ON a.vec_id = e.vec_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.vec_id
)
SELECT e.vec_id, e.n_exact,
       coalesce(a.n_ann, 0)::BIGINT AS n_ann,
       coalesce(m.n_matched, 0)::BIGINT AS n_matched,
       round(coalesce(m.n_matched, 0)::DOUBLE / e.n_exact, 6) + 0.0 AS recall
FROM ecnt e LEFT JOIN acnt a USING (vec_id)
            LEFT JOIN mcnt m ON m.vec_id = e.vec_id
ORDER BY e.vec_id"""


def sql_ann_recall_audit(
    scale: int, k: int = 3, n_cells: int = 16, nprobe: int = 4
) -> str:
    """Oracle for plans/queries.q_ann_recall_audit: per-vector recall@k of
    the IVF top-k against the exact brute-force top-k. Reuses _cte_ivf for
    the candidacy spec (which brings ev/norms); the exact ranking, the
    candidate ranking, and the intersection tail are the shared
    _recall_audit_mid/_RECALL_AUDIT_TAIL text (one definition for both ANN
    families)."""
    return f"""
WITH {_cte_ivf(scale, n_cells, nprobe)},
dir_cand AS (SELECT qid, nid FROM cand),
{_recall_audit_mid(k)},
{_RECALL_AUDIT_TAIL}"""


def sql_lsh_recall_audit(
    dim: int,
    scale: int,
    k: int = 3,
    hamming_radius: int = 28,
    n_bands: int = 8,
    seed: int = 42,
) -> str:
    """Oracle for plans/queries.q_lsh_recall_audit: per-vector recall@k of
    the hyperplane-LSH top-k (banded candidates + Hamming radius, the
    sql_embedding_knn_ann candidacy spec) against the exact brute-force
    top-k; shared mid/tail with sql_ann_recall_audit."""
    return f"""
WITH {_cte_hyperplane_lsh(dim, scale, n_bands=n_bands, seed=seed)},
cand AS (
    SELECT a.vec_id AS id_lo, b.vec_id AS id_hi
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
hpairs AS (
    SELECT id_lo, id_hi FROM cand
    JOIN sigs sa ON sa.vec_id = cand.id_lo
    JOIN sigs sb ON sb.vec_id = cand.id_hi
    WHERE bit_count(xor(sa.sig, sb.sig)) <= {hamming_radius}
),
dir_cand AS (
    SELECT id_lo AS qid, id_hi AS nid FROM hpairs
    UNION ALL SELECT id_hi, id_lo FROM hpairs
),
{_recall_audit_mid(k)},
{_RECALL_AUDIT_TAIL}"""


def sql_embedding_dup_clusters(
    scale: int,
    threshold: float,
    n_cells: int = 16,
    nprobe: int = 4,
    hot_cap: int | None = None,
) -> str:
    """Oracle for the SemDeDup-style composition (plans/queries.
    q_embedding_dup_clusters): the IVF near-pair edge set (identical
    arithmetic to sql_embedding_near_pairs_ivf — candidacy is part of the
    differential spec) closed into connected components via a recursive CTE,
    exactly as sql_simhash_clusters does for Hamming space. Every vector
    with a non-null, non-empty embedding gets a cluster id; singletons keep
    their own id; cluster_id = min member id."""
    return f"""
WITH RECURSIVE {_cte_ivf(scale, n_cells, nprobe, hot_cap)},
upairs AS (
    SELECT least(qid, nid) AS ul, greatest(qid, nid) AS uh
    FROM cand GROUP BY 1, 2
),
cdots AS (
    SELECT p.ul, p.uh, sum(a.v * b.v)::BIGINT AS dot
    FROM upairs p
    JOIN ev a ON a.vec_id = p.ul
    JOIN ev b ON b.vec_id = p.uh AND b.i = a.i
    GROUP BY p.ul, p.uh
),
epairs AS (
    SELECT d.ul, d.uh
    FROM cdots d JOIN norms x ON d.ul = x.vec_id JOIN norms y ON d.uh = y.vec_id
    WHERE round(dot / (sqrt(x.n2) * sqrt(y.n2)), 6) >= {threshold}
),
ids AS (
    SELECT vec_id FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) > 0
),
sym AS (SELECT ul AS u, uh AS v FROM epairs UNION SELECT uh, ul FROM epairs),
reach (src, dst) AS (
    SELECT vec_id, vec_id FROM ids
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
)
SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src
ORDER BY vec_id"""


def sql_source_prefix_scan(prefix: str, k_shingle: int) -> str:
    return f"""
SELECT doc_id, source, md5(text) AS text_hash
FROM documents
WHERE source LIKE '{prefix}%'
  AND len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) >= {k_shingle}"""


def sql_masked_match_candidates(
    params: MinHashParams,
    k_shingle: int,
    n_bands: int,
    rows_per_band: int,
    positive: list[str],
    negative: list[str],
    keywords: list[str],
) -> str:
    base = sql_minhash_band_pairs(params, k_shingle, n_bands, rows_per_band)
    pos = " OR ".join(f"c_source LIKE '{p}%'" for p in positive) or "TRUE"
    neg = " AND ".join(f"c_source NOT LIKE '{p}%'" for p in negative) or "TRUE"
    kw = " AND ".join(f"NOT contains(c_source, '{k}')" for k in keywords) or "TRUE"
    return f"""
WITH pairs AS ({base}),
sym AS (
    SELECT id_lo AS q_id, id_hi AS c_id FROM pairs
    UNION ALL SELECT id_hi, id_lo FROM pairs
),
j AS (
    SELECT s.q_id, s.c_id, a.source AS q_source, b.source AS c_source
    FROM sym s JOIN documents a ON a.doc_id = s.q_id
               JOIN documents b ON b.doc_id = s.c_id
    WHERE a.source <> b.source
)
SELECT q_id, c_id, q_source, c_source FROM j
WHERE ({pos}) AND {neg} AND {kw}"""


def _cte_site_match_counts(radius: int, blacklist=(0,), quality_theta: bool = False) -> str:
    """CTEs ending in `mc(q_site, c_site, n_matched_docs)` — the A6 site-level
    match aggregation (engine/report.site_match_counts twin): brute-force
    SimHash radius pairs -> symmetric cross-source doc pairs ->
    distinct-query-doc counts per source pair. quality_theta adds the P8
    candidate-not-smaller-than-query filter."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    theta = "AND mc2.n_tokens >= mq.n_tokens" if quality_theta else ""
    return f"""{cte_simhash()},
meta AS (
    SELECT doc_id,
           source AS site,
           len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT
               AS n_tokens
    FROM documents
),
pairs AS (
    SELECT a.doc_id AS id_lo, b.doc_id AS id_hi
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
sym AS (
    SELECT id_lo AS q_id, id_hi AS c_id FROM pairs
    UNION ALL SELECT id_hi, id_lo FROM pairs
),
dp AS (
    SELECT s.q_id, mq.site AS q_site, mc2.site AS c_site
    FROM sym s
    JOIN meta mq ON s.q_id = mq.doc_id
    JOIN meta mc2 ON s.c_id = mc2.doc_id
    WHERE mq.site <> mc2.site {theta}
),
mc AS (
    SELECT q_site, c_site, count(DISTINCT q_id)::BIGINT AS n_matched_docs
    FROM dp GROUP BY q_site, c_site
)"""


def sql_best_matching_source(radius: int, blacklist=(0,)) -> str:
    """Container-level A6+R1 twin of engine/report.{site_match_counts,
    best_matching_site}: match counts -> best candidate per source (most
    matched docs, ties to the larger candidate site by total tokens, then
    lexicographic)."""
    return f"""
WITH {_cte_site_match_counts(radius, blacklist)},
site_size AS (
    SELECT site, sum(n_tokens)::BIGINT AS site_tokens FROM meta GROUP BY site
),
ranked AS (
    SELECT mc.q_site, mc.c_site AS best_site, mc.n_matched_docs, ss.site_tokens,
           row_number() OVER (
               PARTITION BY mc.q_site
               ORDER BY mc.n_matched_docs DESC, ss.site_tokens DESC, mc.c_site ASC
           ) AS rn
    FROM mc JOIN site_size ss ON mc.c_site = ss.site
)
SELECT q_site, best_site, n_matched_docs, site_tokens
FROM ranked WHERE rn = 1 ORDER BY q_site"""


def sql_similar_sources_truncated(radius: int, blacklist=(0,)) -> str:
    """A8 mean-threshold truncation twin (engine/report.significantly_similar_sites):
    keep (q_source, c_source) rows with n_matched_docs >= per-q_source mean
    and n_matched_docs > 1."""
    return f"""
WITH {_cte_site_match_counts(radius, blacklist)},
withmean AS (
    SELECT q_site, c_site, n_matched_docs,
           avg(n_matched_docs) OVER (PARTITION BY q_site) AS m
    FROM mc
)
SELECT q_site AS q_source, c_site AS c_source, n_matched_docs
FROM withmean
WHERE n_matched_docs >= m AND n_matched_docs > 1
ORDER BY q_source, c_source"""


def sql_quality_match_counts(radius: int, blacklist=(0,)) -> str:
    """P8 quality-theta match counts twin (site_match_counts(quality_theta=True)):
    candidate docs smaller than the query doc do not count."""
    return f"""
WITH {_cte_site_match_counts(radius, blacklist, quality_theta=True)}
SELECT q_site AS q_source, c_site AS c_source, n_matched_docs
FROM mc ORDER BY q_source, c_source"""


def sql_source_uniqueness(radius: int, blacklist=(0,)) -> str:
    """C2/A2 uniqueness twin (engine/report.site_uniqueness): a source is
    unique iff it appears in no cross-source match-count row."""
    return f"""
WITH {_cte_site_match_counts(radius, blacklist)}
SELECT d.source AS source,
       (mc.q_site IS NULL) AS is_unique
FROM (SELECT DISTINCT source FROM documents) d
LEFT JOIN (SELECT DISTINCT q_site FROM mc) mc ON d.source = mc.q_site
ORDER BY source"""


def sql_user_sessions(gap_sec: int = 1800) -> str:
    return f"""
WITH w AS (
    SELECT user_id, event_id,
           -- floor, not ::BIGINT alone: the cast ROUNDS fractional seconds
           -- and the Spark side (epoch_seconds_tz_free) floors, so a
           -- half-second fraction at a gap boundary could flip the verdict
           floor(epoch(ts))::BIGINT AS es,
           lag(floor(epoch(ts))::BIGINT) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
)
SELECT user_id,
       sum(CASE WHEN prev IS NULL OR es - prev > {gap_sec} THEN 1 ELSE 0 END)::BIGINT
           AS n_sessions,
       count(*)::BIGINT AS n_events
FROM w GROUP BY user_id"""


def sql_stream_sessions(gap_sec: int = 1800) -> str:
    """Oracle for plans/queries.q_stream_sessions_replay: the per-event
    session assignment as a running max over gap-rule start markers — the
    same gap rule sql_user_sessions aggregates. The streaming operator's
    output is a pure function of the input, so the batch window IS its
    spec (the start-TIME key, not a dense index, is what makes state
    expiry output-neutral — see streaming/sessionize_stream.py).

    Event time is FLOORED to the second (the replay's landing zone holds
    timestamp_seconds(floor-epoch) instants): epoch(ts)::BIGINT would
    ROUND the parquet micros and sit one second ahead of the engine on
    half-and-up fractions, so the floor is explicit, and the lag window
    orders by the floored second + event_id exactly like the kernel."""
    return f"""
WITH w AS (
    SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS es,
           lag(floor(epoch(ts))::BIGINT) OVER (
               PARTITION BY user_id
               ORDER BY floor(epoch(ts))::BIGINT, event_id) AS prev
    FROM events
)
SELECT user_id, event_id,
       max(CASE WHEN prev IS NULL OR es - prev > {gap_sec} THEN es END)
           OVER (PARTITION BY user_id ORDER BY es, event_id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS session_start_sec
FROM w ORDER BY user_id, event_id"""


def sql_lineitem_pricing_summary() -> str:
    """Oracle for plans/queries.q_lineitem_pricing_summary: the same
    integer-scaled Q1 arithmetic (cents / basis points summed as BIGINT,
    one rounded division per output)."""
    return """
WITH s AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
           CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS disc_price_c,
           CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                AS BIGINT) AS charge_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
),
a AS (
    SELECT l_returnflag, l_linestatus,
           sum(qty_c)::BIGINT AS sq, sum(price_c)::BIGINT AS sp,
           sum(disc_price_c)::BIGINT AS sdp, sum(charge_c)::BIGINT AS sc,
           sum(disc_bp)::BIGINT AS sd, count(*)::BIGINT AS count_order
    FROM s GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       round(sq::DOUBLE / 100.0, 6) + 0.0 AS sum_qty,
       round(sp::DOUBLE / 100.0, 6) + 0.0 AS sum_base_price,
       round(sdp::DOUBLE / 100.0, 6) + 0.0 AS sum_disc_price,
       round(sc::DOUBLE / 100.0, 6) + 0.0 AS sum_charge,
       round(sq::DOUBLE / (count_order * 100), 6) + 0.0 AS avg_qty,
       round(sp::DOUBLE / (count_order * 100), 6) + 0.0 AS avg_price,
       round(sd::DOUBLE / (count_order * 10000), 6) + 0.0 AS avg_disc,
       count_order
FROM a ORDER BY l_returnflag, l_linestatus"""


def sql_nation_revenue() -> str:
    return """
SELECT n_name, year(o_orderdate)::INT AS year,
       count(*)::BIGINT AS n_items,
       count(DISTINCT o_orderkey)::BIGINT AS n_orders,
       sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty,
       round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT) / 100.0, 2)
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, year"""


def sql_orders_by_priority_month() -> str:
    return """
SELECT o_orderpriority,
       (year(o_orderdate) * 100 + month(o_orderdate))::INT AS ym,
       count(*)::BIGINT AS n_orders,
       count(DISTINCT o_custkey)::BIGINT AS n_customers
FROM orders GROUP BY o_orderpriority, ym"""


def sql_media_decode_dims() -> str:
    """Arithmetic twin of q_media_decode_dims: the synthesized payloads'
    decoded dims are pure functions of doc_id (fixtures/synth.media_dims and
    friends), so the oracle predicts every cell of the REAL decode path —
    PPM / WAV PCM / AVI DIB parsers, mapInPandas plumbing and all — with no
    codec on the DuckDB side."""
    return """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS media_type,
       (CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 8 + doc_id % 8 END)::INT AS width,
       (CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 8 + doc_id % 5 END)::INT AS height,
       (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 64 + (doc_id % 100) * 16
           ELSE 1 + doc_id % 4 END)::INT AS n_frames,
       TRUE AS ok
FROM documents"""


def sql_media_near_dup_pairs(dup_stride: int = 3) -> str:
    """Arithmetic twin of q_media_near_dup_pairs: the planted-duplicate pair
    set. Exactness argument in the query docstring (>=10-bit non-planted
    margin vs radius 4)."""
    return f"""
SELECT (doc_id - {dup_stride})::BIGINT AS id_lo, doc_id::BIGINT AS id_hi
FROM documents
WHERE doc_id % 10 = 7 AND doc_id >= {dup_stride}"""


def sql_media_resized_dims() -> str:
    """Arithmetic twin of q_media_resized_dims (resize to 10x9 / 4000 Hz).
    Audio: n = 64 + (doc_id % 100) * 16 at 8000 Hz resamples to n/2; below
    the 64-bin energy grid (doc_id % 100 < 4) the decode quarantines —
    features null, n_frames at the schema default 1."""
    return """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS media_type,
       (CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 10 END)::INT AS width,
       (CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 9 END)::INT AS height,
       (CASE doc_id % 3
            WHEN 0 THEN 1
            WHEN 1 THEN CASE WHEN doc_id % 100 >= 4
                             THEN 32 + (doc_id % 100) * 8 ELSE 1 END
            ELSE 1 + doc_id % 4 END)::INT AS n_frames,
       CASE WHEN doc_id % 3 = 1 THEN doc_id % 100 >= 4 ELSE TRUE END AS ok
FROM documents"""


def sql_media_frame_sample(every_n: int = 2) -> str:
    """Arithmetic twin of q_media_frame_sample: video rows (doc_id % 3 = 2)
    have n_frames = 1 + doc_id % 4; sampled indices are the stride-every_n
    series below n_frames."""
    return f"""
SELECT doc_id, unnest(range(0, 1 + doc_id % 4, {every_n}))::INT AS frame_idx
FROM documents
WHERE doc_id % 3 = 2"""


def sql_catalog_merge_roundtrip() -> str:
    """Set-algebra twin of q_catalog_merge_roundtrip: apply the same update /
    insert / delete arithmetic to documents directly — the catalog's
    append + bucketed merge + delete must land on exactly this state."""
    return """
WITH base AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
           length(text)::BIGINT AS n_chars
    FROM documents
), ins AS (
    SELECT doc_id + 100000 AS doc_id, 'new' AS lang,
           (doc_id % 997)::BIGINT AS n_chars
    FROM documents WHERE doc_id % 50 = 0
), merged AS (
    SELECT * FROM base UNION ALL SELECT * FROM ins
)
SELECT doc_id, lang, n_chars FROM merged WHERE doc_id % 13 != 3"""


def sql_html_extract_roundtrip() -> str:
    """Arithmetic twin of q_html_extract_roundtrip: the render->extract
    roundtrip is byte-exact by the fixture invariant, so extracted length is
    length(text) and every row's flag is TRUE."""
    return """
SELECT doc_id, length(text)::BIGINT AS n_chars_extracted, TRUE AS roundtrip_ok
FROM documents"""


def sql_mime_fixup(variants: list[str]) -> str:
    """SQL twin of functions/junk.fix_mime over the same doc_id-cycled
    variant list: strip parameters, trim, lowercase, unify aliases."""
    arr = ", ".join("'" + v.replace("'", "''") + "'" for v in variants)
    return f"""
WITH raw AS (
    SELECT doc_id,
           ([{arr}])[(doc_id % {len(variants)})::INT + 1] AS raw_mime
    FROM documents
), norm AS (
    SELECT doc_id, raw_mime,
           lower(trim(regexp_replace(raw_mime, ';.*$', ''))) AS m
    FROM raw
)
SELECT doc_id, raw_mime,
       CASE m WHEN 'application/xhtml+xml' THEN 'text/html'
              WHEN 'text/xhtml' THEN 'text/html'
              WHEN 'application/cdfv2-corrupt' THEN 'application/cdfv2'
              ELSE m END AS mime
FROM norm"""


def sql_incremental_ingest_roundtrip() -> str:
    """Set-algebra twin of q_incremental_ingest_roundtrip: drop the vanished
    urls, append ' changed' (one extra token) where doc_id % 9 == 0, count
    whitespace tokens."""
    return r"""
WITH t AS (
    SELECT 'http://' || source || '/p' || doc_id::VARCHAR AS url,
           CASE WHEN doc_id % 9 = 0 THEN text || ' changed' ELSE text END AS tx
    FROM documents WHERE doc_id % 11 != 5
)
SELECT url,
       len(list_filter(string_split_regex(tx, '\s+'), x -> x <> ''))::BIGINT
           AS n_tokens
FROM t"""


def sql_junk_flags() -> str:
    """Arithmetic twin of q_junk_flags: junk iff one of the planted
    conditions holds (path, error boilerplate, blank)."""
    return """
SELECT doc_id,
       (doc_id % 17 IN (0, 3) OR doc_id % 23 = 0 OR doc_id % 29 = 11)
           AS is_junk
FROM documents"""


def _quality_m_cte(stopwords: list[str]) -> str:
    """Shared t/m CTE pair for the quality-arithmetic oracles
    (sql_text_quality, sql_domain_quota_topk) — queries.py _quality_parts
    twin: whitespace tokenization with empties dropped, same stopword list,
    same [^\\w\\s] punctuation class."""
    arr = ", ".join("'" + s + "'" for s in stopwords)
    return rf"""t AS (
    SELECT doc_id, source, text,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tl
    FROM documents
), m AS (
    SELECT doc_id, source,
           length(text)::BIGINT AS n_chars,
           len(tl)::BIGINT AS n_tokens,
           len(list_filter(tl, x -> list_contains([{arr}], x))) AS n_stop,
           (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
               AS n_punct,
           len(list_distinct(tl)) AS n_distinct
    FROM t
)"""


def sql_text_quality(
    stopwords: list[str],
    min_tokens: int,
    max_stop_ratio: float,
    min_distinct_ratio: float,
) -> str:
    """DuckDB twin of q_text_quality: same tokenization (whitespace split,
    empties dropped), same stopword list, same [^\\w\\s] punctuation class,
    same rounding and gates."""
    return rf"""
WITH {_quality_m_cte(stopwords)}
SELECT doc_id, n_chars, n_tokens,
       round(n_stop / greatest(n_tokens, 1), 6) AS stop_ratio,
       round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
       (n_tokens >= {min_tokens}
        AND round(n_stop / greatest(n_tokens, 1), 6) <= {max_stop_ratio}
        AND round(n_distinct / greatest(n_tokens, 1), 6)
            >= {min_distinct_ratio}) AS passes_quality
FROM m"""


def sql_source_quality_rollup(
    stopwords: list[str],
    min_tokens: int,
    max_stop_ratio: float,
    min_distinct_ratio: float,
    min_pass_frac: float,
    max_dup_frac: float,
) -> str:
    """Oracle for plans/queries.q_source_quality_rollup: per-source pass /
    exact-dup fractions over the shared _quality_m_cte arithmetic and the
    md5 text hash, folded to the keep verdict on rounded-6 fractions."""
    return rf"""
WITH {_quality_m_cte(stopwords)},
hd AS (SELECT doc_id, source, md5(text) AS h FROM documents),
hdf AS (SELECT h, count(*)::BIGINT AS n_same FROM hd GROUP BY h),
q AS (
    SELECT doc_id, source,
           (n_tokens >= {min_tokens}
            AND round(n_stop / greatest(n_tokens, 1), 6) <= {max_stop_ratio}
            AND round(n_distinct / greatest(n_tokens, 1), 6)
                >= {min_distinct_ratio}) AS p
    FROM m
),
j AS (
    SELECT q.source,
           CASE WHEN q.p THEN 1 ELSE 0 END AS p,
           CASE WHEN hdf.n_same >= 2 THEN 1 ELSE 0 END AS isdup
    FROM q JOIN hd ON hd.doc_id = q.doc_id JOIN hdf ON hdf.h = hd.h
),
a AS (
    SELECT source, count(*)::BIGINT AS n_docs, sum(p)::BIGINT AS n_pass,
           sum(isdup)::BIGINT AS n_dup
    FROM j GROUP BY source
)
SELECT source, n_docs, n_pass, n_dup,
       round(n_pass::DOUBLE / n_docs, 6) + 0.0 AS pass_frac,
       round(n_dup::DOUBLE / n_docs, 6) + 0.0 AS dup_frac,
       (round(n_pass::DOUBLE / n_docs, 6) + 0.0 >= {min_pass_frac}
        AND round(n_dup::DOUBLE / n_docs, 6) + 0.0 <= {max_dup_frac})
           AS keep_flag
FROM a ORDER BY source"""


def sql_domain_quota_topk(
    stopwords: list[str],
    min_tokens: int,
    max_stop_ratio: float,
    min_distinct_ratio: float,
    k: int,
) -> str:
    """DuckDB twin of q_domain_quota_topk: same quality arithmetic
    (_quality_m_cte), row_number per source over (passes_quality DESC,
    n_tokens DESC, doc_id), quota filter rank <= k."""
    return rf"""
WITH {_quality_m_cte(stopwords)},
q AS (
    SELECT source, doc_id, n_tokens,
           (n_tokens >= {min_tokens}
            AND round(n_stop / greatest(n_tokens, 1), 6) <= {max_stop_ratio}
            AND round(n_distinct / greatest(n_tokens, 1), 6)
                >= {min_distinct_ratio}) AS passes_quality
    FROM m
),
w AS (
    SELECT source, doc_id, n_tokens, passes_quality,
           row_number() OVER (
               PARTITION BY source
               ORDER BY passes_quality DESC, n_tokens DESC, doc_id
           ) AS quota_rank
    FROM q
)
SELECT source, doc_id, n_tokens, passes_quality, quota_rank
FROM w WHERE quota_rank <= {k} ORDER BY source, quota_rank"""


def sql_token_entropy(q_buckets: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_token_entropy: quantized-entropy + TTR via
    the same embedded LP_MICRO VALUES table as the charlm oracles — neither
    engine takes a log, all per-doc totals are exact int64 sums."""
    from ..functions.charlm import lp_values_sql

    return f"""
WITH lp(p_q, lp_micro) AS (VALUES {lp_values_sql()}),
{cte_tokens(table)},
c AS (SELECT doc_id, tok, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2),
n AS (
    SELECT doc_id, sum(cnt)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types
    FROM c GROUP BY 1
),
j AS (
    SELECT c.doc_id, cnt, n_tokens, n_types,
           greatest(1, (cnt * {q_buckets}) // n_tokens) AS p_q
    FROM c JOIN n USING (doc_id)
)
SELECT doc_id, max(n_tokens)::BIGINT AS n_tokens,
       max(n_types)::BIGINT AS n_types,
       round(max(n_types)::DOUBLE / max(n_tokens), 6) + 0.0 AS ttr,
       ((-sum(cnt * lp_micro)) // max(n_tokens))::BIGINT AS entropy_micro
FROM j JOIN lp USING (p_q)
GROUP BY doc_id ORDER BY doc_id"""


def sql_gram_novelty_by_batch(
    k_shingle: int, batch: int, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_gram_novelty_by_batch: distinct (batch,
    gram) set over the k-token shingles, first-seen batch per gram, folded
    to per-batch totals/novel counts. Groups by the gram STRING where the
    engine groups by md5(gram) — the independent-formulation discipline of
    sql_dup_gram_stats."""
    return f"""
WITH {cte_shingles(k_shingle, table)},
occ AS (SELECT DISTINCT doc_id // {batch} AS batch_id, s FROM shing),
first AS (SELECT s, min(batch_id) AS first_batch FROM occ GROUP BY s)
SELECT batch_id, count(*)::BIGINT AS n_grams,
       sum(CASE WHEN first_batch = batch_id THEN 1 ELSE 0 END)::BIGINT
           AS n_novel,
       round(sum(CASE WHEN first_batch = batch_id THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) + 0.0 AS novelty_ratio
FROM occ JOIN first USING (s)
GROUP BY batch_id ORDER BY batch_id"""


def sql_multi_signal_clusters(
    radius: int,
    params: MinHashParams,
    k_shingle: int,
    n_bands: int,
    rows_per_band: int,
    table: str = "documents",
    blacklist=(0,),
) -> str:
    """Oracle for plans/queries.q_multi_signal_clusters: exact + SimHash +
    MinHash-band edges unioned, closed via the recursive-CTE reach (the
    sql_simhash_clusters shape). The MinHash leg re-derives its shingles
    under 5-prefixed CTE names (toklist5/shing5) because cte_simhash already
    owns the k=3 `shing` name."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    vals = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(zip(params.a, params.b))
    )
    return f"""
WITH RECURSIVE {cte_simhash(table)},
ex AS (SELECT doc_id, md5(text) AS text_hash FROM {table}),
toklist5 AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
shing5 AS (
    SELECT doc_id, array_to_string(tl[i:i+{k_shingle - 1}], ' ') AS s
    FROM toklist5, unnest(generate_series(1, len(tl) - {k_shingle - 1})) AS r(i)
),
sh_h5 AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing5),
params (i, a, b) AS (VALUES {vals}),
mh AS (
    SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
    FROM sh_h5 CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
    SELECT doc_id, i // {rows_per_band} AS band_id,
           string_agg(v, ',' ORDER BY i) AS band_key
    FROM mh WHERE i < {n_bands * rows_per_band}
    GROUP BY doc_id, i // {rows_per_band}
),
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
    UNION
    SELECT x.doc_id, y.doc_id
    FROM ex x JOIN ex y ON x.doc_id < y.doc_id AND x.text_hash = y.text_hash
    UNION
    SELECT DISTINCT a.doc_id, b.doc_id
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach (src, dst) AS (
    SELECT doc_id, doc_id FROM {table}
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src ORDER BY doc_id"""


def sql_dedup_ablation(
    radius: int,
    params: MinHashParams,
    k_shingle: int,
    n_bands: int,
    rows_per_band: int,
    table: str = "documents",
    blacklist=(0,),
) -> str:
    """Oracle for plans/queries.q_dedup_ablation: the three cumulative edge
    sets (exact / +simhash / +minhash-band) each closed with its own
    recursive reach, folded to cluster counts and removal fractions. Shares
    the sql_multi_signal_clusters leg arithmetic (5-prefixed minhash CTE
    names for the same k=3/k=5 `shing` collision reason)."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    vals = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(zip(params.a, params.b))
    )

    def cfg(name: str, reach: str) -> str:
        return f"""
SELECT '{name}' AS signals,
       count(DISTINCT cluster_id)::BIGINT AS n_clusters,
       ((SELECT count(*) FROM {table}) - count(DISTINCT cluster_id))::BIGINT
           AS n_removed,
       round(((SELECT count(*) FROM {table})
              - count(DISTINCT cluster_id))::DOUBLE
             / (SELECT count(*) FROM {table}), 6) + 0.0 AS removal_frac
FROM (SELECT src, min(dst) AS cluster_id FROM {reach} GROUP BY src)"""

    return f"""
WITH RECURSIVE {cte_simhash(table)},
ex AS (SELECT doc_id, md5(text) AS text_hash FROM {table}),
p_ex AS (
    SELECT x.doc_id AS u, y.doc_id AS v
    FROM ex x JOIN ex y ON x.doc_id < y.doc_id AND x.text_hash = y.text_hash
),
p_sh AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
toklist5 AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
shing5 AS (
    SELECT doc_id, array_to_string(tl[i:i+{k_shingle - 1}], ' ') AS s
    FROM toklist5, unnest(generate_series(1, len(tl) - {k_shingle - 1})) AS r(i)
),
sh_h5 AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing5),
params (i, a, b) AS (VALUES {vals}),
mh AS (
    SELECT doc_id, i, min((a * h + b) % {MINHASH_PRIME}) AS v
    FROM sh_h5 CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
    SELECT doc_id, i // {rows_per_band} AS band_id,
           string_agg(v, ',' ORDER BY i) AS band_key
    FROM mh WHERE i < {n_bands * rows_per_band}
    GROUP BY doc_id, i // {rows_per_band}
),
p_mh AS (
    SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
e1 AS (SELECT u, v FROM p_ex UNION SELECT v, u FROM p_ex),
e2 AS (
    SELECT u, v FROM e1
    UNION SELECT u, v FROM p_sh UNION SELECT v, u FROM p_sh
),
e3 AS (
    SELECT u, v FROM e2
    UNION SELECT u, v FROM p_mh UNION SELECT v, u FROM p_mh
),
r1 (src, dst) AS (
    SELECT doc_id, doc_id FROM {table}
    UNION SELECT r.src, s.v FROM r1 r JOIN e1 s ON r.dst = s.u
),
r2 (src, dst) AS (
    SELECT doc_id, doc_id FROM {table}
    UNION SELECT r.src, s.v FROM r2 r JOIN e2 s ON r.dst = s.u
),
r3 (src, dst) AS (
    SELECT doc_id, doc_id FROM {table}
    UNION SELECT r.src, s.v FROM r3 r JOIN e3 s ON r.dst = s.u
)
{cfg('1_exact', 'r1')}
UNION ALL {cfg('2_exact+simhash', 'r2')}
UNION ALL {cfg('3_exact+simhash+minhash', 'r3')}
ORDER BY signals"""


def sql_ivf_cell_stats(scale: int, n_cells: int = 16) -> str:
    """Oracle for plans/queries.q_ivf_cell_stats: the _cte_ivf quantizer
    replay's members_all inverted lists folded to per-cell population
    stats (cand/probes CTEs present but unused — lazily skipped)."""
    return f"""
WITH {_cte_ivf(scale, n_cells, 1)}
SELECT cell_id, count(*)::BIGINT AS n_members,
       min(nid)::BIGINT AS min_id, max(nid)::BIGINT AS max_id
FROM members_all GROUP BY 1 ORDER BY 1"""


def sql_anchor_text_profile(
    n_terms: int, n_domains: int = 20, table: str = "documents"
) -> str:
    """Oracle for plans/queries.q_anchor_text_profile: byte-identical
    arithmetic anchor plant, DuckDB's own regexp extraction, and the argmax
    as a row_number window (independent formulation of the engine's
    max(struct) argmax)."""
    anchors = []
    for j in range(3):
        anchors.append(
            f"CASE WHEN doc_id % 4 > {j} THEN "
            f"'<a href=\"http://site' || ((doc_id * 7 + {j} * 13) % {n_domains}) "
            f"|| '.example.com/p/' || doc_id || '\">t' "
            f"|| ((doc_id + {j} * 17) % {n_terms}) || '</a>' ELSE '' END"
        )
    pat = '<a href="http://([a-z0-9.]+)/[^"]*">(t[0-9]+)</a>'
    return f"""
WITH pages AS (
    SELECT doc_id,
           {anchors[0]} || '<p>' || text || '</p>' || {anchors[1]} || {anchors[2]}
               AS html
    FROM {table}
),
tags AS (
    SELECT t.tag FROM pages,
         unnest(regexp_extract_all(html, '{pat}', 0)) AS t(tag)
),
pairs AS (
    SELECT regexp_extract(tag, '{pat}', 1) AS dst_domain,
           regexp_extract(tag, '{pat}', 2) AS term
    FROM tags
),
tc AS (
    SELECT dst_domain, term, count(*)::BIGINT AS cnt
    FROM pairs GROUP BY 1, 2
),
rk AS (
    SELECT dst_domain, term, cnt,
           row_number() OVER (
               PARTITION BY dst_domain
               ORDER BY cnt DESC, replace(term, 't', '')::BIGINT ASC
           ) AS r
    FROM tc
),
agg AS (
    SELECT dst_domain, sum(cnt)::BIGINT AS n_inlinks,
           count(*)::BIGINT AS n_unique_terms
    FROM tc GROUP BY 1
)
SELECT a.dst_domain, a.n_inlinks, a.n_unique_terms,
       r.term AS top_term, r.cnt AS top_term_count
FROM agg a JOIN rk r ON a.dst_domain = r.dst_domain AND r.r = 1
ORDER BY 1"""


def _cte_shing5(k_shingle: int, table: str = "documents") -> str:
    """5-prefixed k-token shingle-set CTEs (toklist5/shing5/sh_h5) for
    oracles that ALSO include cte_simhash (which owns the k=3 `shing`
    name): ends in sh_h5(doc_id, h) — the distinct shingle-hash set."""
    return f"""toklist5 AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
    FROM {table}
),
shing5 AS (
    SELECT doc_id, array_to_string(tl[i:i+{k_shingle - 1}], ' ') AS s
    FROM toklist5, unnest(generate_series(1, len(tl) - {k_shingle - 1})) AS r(i)
),
sh_h5 AS (SELECT DISTINCT doc_id, {sql_shingle_hash32('s')} AS h FROM shing5)"""


def sql_simhash_pair_precision(
    radius: int,
    k_shingle: int,
    tau: float,
    table: str = "documents",
    blacklist=(0,),
) -> str:
    """Oracle for plans/queries.q_simhash_pair_precision: radius pairs with
    distance, exact shingle-set Jaccard re-verification, and the TP verdict
    at tau over the round6-normalized value (same comparison operand as the
    engine)."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH {cte_simhash(table)},
{_cte_shing5(k_shingle, table)},
pairs AS (
    SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
           bit_count(xor(a.simhash, b.simhash))::INT AS distance
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
szs AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh_h5 GROUP BY doc_id),
inter AS (
    SELECT p.id_lo, p.id_hi, count(*)::BIGINT AS n_int
    FROM pairs p
    JOIN sh_h5 a ON a.doc_id = p.id_lo
    JOIN sh_h5 b ON b.doc_id = p.id_hi AND b.h = a.h
    GROUP BY p.id_lo, p.id_hi
),
ej AS (
    SELECT p.id_lo, p.id_hi, p.distance,
           round(coalesce(i.n_int, 0)::DOUBLE
                 / (sa.n + sb.n - coalesce(i.n_int, 0)), 6) + 0.0
               AS exact_jaccard
    FROM pairs p
    LEFT JOIN inter i ON i.id_lo = p.id_lo AND i.id_hi = p.id_hi
    JOIN szs sa ON sa.doc_id = p.id_lo
    JOIN szs sb ON sb.doc_id = p.id_hi
)
SELECT id_lo, id_hi, distance, exact_jaccard,
       exact_jaccard >= {tau} AS is_tp
FROM ej ORDER BY id_lo, id_hi"""


def sql_domain_dup_affinity(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_domain_dup_affinity: radius pairs split
    intra-/cross-source with counts and corpus-of-pairs fractions."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH {cte_simhash(table)},
pairs AS (
    SELECT a.doc_id AS id_lo, b.doc_id AS id_hi
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
v AS (
    SELECT CASE WHEN da.source = db.source THEN 'intra_source'
                ELSE 'cross_source' END AS scope
    FROM pairs p
    JOIN {table} da ON da.doc_id = p.id_lo
    JOIN {table} db ON db.doc_id = p.id_hi
)
SELECT scope, count(*)::BIGINT AS n_pairs,
       round(count(*)::DOUBLE / sum(count(*)) OVER (), 6) + 0.0 AS frac
FROM v GROUP BY 1 ORDER BY 1"""


def sql_cluster_diameter_stats(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_cluster_diameter_stats: the recursive-CTE
    cluster closure of sql_simhash_clusters, multi-member clusters only,
    with the max pairwise Hamming distance (diameter) and chained flag."""
    bl = ", ".join(str(b) for b in blacklist) or "NULL"
    return f"""
WITH RECURSIVE {cte_simhash(table)},
pairs AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
      AND a.simhash NOT IN ({bl}) AND b.simhash NOT IN ({bl})
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach (src, dst) AS (
    SELECT doc_id, doc_id FROM sh
    UNION
    SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
),
clusters AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
mem AS (
    SELECT c.cluster_id, c.doc_id, s.simhash
    FROM clusters c JOIN sh s USING (doc_id)
),
w AS (
    SELECT a.cluster_id, a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS dist
    FROM mem a JOIN mem b
      ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id
)
SELECT cluster_id, (count(DISTINCT id_a) + 1)::BIGINT AS n_members,
       max(dist)::BIGINT AS diameter,
       max(dist) > {radius} AS chained
FROM w GROUP BY 1 ORDER BY 1"""


def sql_train_split_leakage(
    radius: int, split_mod: int, train_hi: int, table: str = "documents",
    blacklist=(0,),
) -> str:
    """Oracle for plans/queries.q_train_split_leakage: brute-force radius
    pairs classified by the md5(doc_id)-bucket train/valid/test membership
    of their endpoints (the shared sql_md5_prefix_mod hash discipline),
    folded to per-split-combination counts with a cross_split flag and
    pair share. The pair set nests the gated sql_simhash_radius_pairs
    oracle verbatim so the leakage surface cannot drift from the pair
    surface it classifies."""
    return f"""
WITH sp AS (
    SELECT doc_id,
           CASE WHEN b < {train_hi} THEN 'train'
                WHEN b = {train_hi} THEN 'valid'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, {sql_md5_prefix_mod('doc_id::VARCHAR', split_mod)} AS b
        FROM {table}
    )
),
p AS (
    SELECT id_lo, id_hi
    FROM ({sql_simhash_radius_pairs(radius, table, blacklist)})
),
c AS (
    SELECT least(x.split, y.split) AS split_a,
           greatest(x.split, y.split) AS split_b
    FROM p JOIN sp x ON p.id_lo = x.doc_id
           JOIN sp y ON p.id_hi = y.doc_id
),
a AS (
    SELECT split_a, split_b, count(*)::BIGINT AS n_pairs
    FROM c GROUP BY 1, 2
)
SELECT split_a, split_b, n_pairs,
       split_a <> split_b AS cross_split,
       round(n_pairs::DOUBLE / sum(n_pairs) OVER (), 6) + 0.0 AS frac
FROM a ORDER BY split_a, split_b"""


def sql_dsir_weights(
    n_buckets: int, table: str = "documents", target: str = "lang = 'en'"
) -> str:
    """Oracle for plans/queries.q_dsir_weights — see functions/dsir.py for
    the no-engine-takes-a-log exactness argument. The quantized log table
    is the SAME Python-computed constant list the engine broadcasts
    (charlm.LP_MICRO) embedded as VALUES; bucket assignment is the md5
    hex-prefix hash; every division has a non-negative numerator so
    DuckDB's flooring // matches Spark's truncating div."""
    from ..functions.charlm import CHARLM_Q, lp_values_sql

    q = CHARLM_Q
    return rf"""
WITH lp(p_q, lp_micro) AS (VALUES {lp_values_sql()}),
tok AS (
    SELECT d.doc_id, {target} AS is_t,
           {sql_md5_prefix_mod('t.tok', n_buckets)} AS b
    FROM {table} d,
         unnest(list_filter(string_split_regex(d.text, '\s+'),
                            x -> x <> '')) AS t(tok)
),
db AS (
    SELECT doc_id, is_t, b, count(*)::BIGINT AS n
    FROM tok GROUP BY 1, 2, 3
),
bc AS (
    SELECT b, sum(n)::BIGINT AS c_r,
           sum(CASE WHEN is_t THEN n ELSE 0 END)::BIGINT AS c_t
    FROM db GROUP BY b
),
tot AS (SELECT sum(c_r)::BIGINT AS t_r, sum(c_t)::BIGINT AS t_t FROM bc),
pq AS (
    -- coalesce before the clamp: an empty target slice makes t_t = 0 and
    -- 0 // 0 NULL, which greatest/least would SKIP (null-ignoring),
    -- quantizing to the MAX level instead of the epsilon floor p_q = 1
    -- (same guard as functions/dsir.dsir_weights)
    SELECT bc.b,
           greatest(1, least({q}, coalesce((bc.c_t * {q}) // tot.t_t, 0)))
               AS pq_t,
           greatest(1, least({q}, coalesce((bc.c_r * {q}) // tot.t_r, 0)))
               AS pq_r
    FROM bc CROSS JOIN tot
),
lr AS (
    SELECT pq.b, lt.lp_micro - lr2.lp_micro AS lr_micro
    FROM pq JOIN lp lt ON lt.p_q = pq.pq_t
            JOIN lp lr2 ON lr2.p_q = pq.pq_r
)
SELECT db.doc_id, sum(db.n)::BIGINT AS n_tok,
       sum(db.n * lr.lr_micro)::BIGINT AS dsir_micro
FROM db JOIN lr ON db.b = lr.b
GROUP BY db.doc_id ORDER BY doc_id"""


def sql_token_yield_funnel(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_token_yield_funnel: the shared
    _cte_keep_list verdict joined to per-doc token counts, folded to the
    3-stage token-retention funnel (raw -> after exact -> after near)."""
    return rf"""
WITH RECURSIVE {_cte_keep_list(radius, table, blacklist)},
nt AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'),
                           x -> x <> ''))::BIGINT AS n_tok
    FROM {table}
),
j AS (SELECT k.reason, n.n_tok FROM kl k JOIN nt n ON k.doc_id = n.doc_id),
a AS (
    SELECT count(*)::BIGINT AS d0, sum(n_tok)::BIGINT AS t0,
           sum(CASE WHEN reason <> 'exact_dup' THEN 1 ELSE 0 END)::BIGINT AS d1,
           sum(CASE WHEN reason <> 'exact_dup' THEN n_tok ELSE 0 END)::BIGINT AS t1,
           sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END)::BIGINT AS d2,
           sum(CASE WHEN reason = 'kept' THEN n_tok ELSE 0 END)::BIGINT AS t2
    FROM j
)
SELECT '0_raw' AS stage, d0 AS n_docs, t0 AS n_tokens,
       round(t0::DOUBLE / t0, 6) + 0.0 AS token_yield FROM a
UNION ALL
SELECT '1_after_exact', d1, t1, round(t1::DOUBLE / t0, 6) + 0.0 FROM a
UNION ALL
SELECT '2_after_near', d2, t2, round(t2::DOUBLE / t0, 6) + 0.0 FROM a
ORDER BY stage"""


def sql_cluster_best_rep(
    radius: int,
    stopwords: list[str],
    min_tokens: int,
    max_stop_ratio: float,
    min_distinct_ratio: float,
    table: str = "documents",
    blacklist=(0,),
) -> str:
    """Oracle for plans/queries.q_cluster_best_rep: the shared
    _cte_keep_list closure joined to the shared _quality_m_cte arithmetic;
    per multi-member cluster, row_number over (passes DESC, n_tokens DESC,
    doc_id) picks the representative."""
    return rf"""
WITH RECURSIVE {_cte_keep_list(radius, table, blacklist)},
{_quality_m_cte(stopwords)},
q AS (
    SELECT doc_id, n_tokens,
           (n_tokens >= {min_tokens}
            AND round(n_stop / greatest(n_tokens, 1), 6) <= {max_stop_ratio}
            AND round(n_distinct / greatest(n_tokens, 1), 6)
                >= {min_distinct_ratio}) AS passes_quality
    FROM m
),
mem AS (
    SELECT k.cluster_id, k.doc_id, q.n_tokens, q.passes_quality
    FROM kl k JOIN q ON k.doc_id = q.doc_id
),
sz AS (
    SELECT cluster_id, count(*)::BIGINT AS n_members
    FROM mem GROUP BY 1 HAVING count(*) >= 2
),
r AS (
    SELECT mem.cluster_id, mem.doc_id, mem.n_tokens, mem.passes_quality,
           sz.n_members,
           row_number() OVER (
               PARTITION BY mem.cluster_id
               ORDER BY mem.passes_quality DESC, mem.n_tokens DESC, mem.doc_id
           ) AS rn
    FROM mem JOIN sz ON mem.cluster_id = sz.cluster_id
)
SELECT cluster_id, doc_id AS rep_doc_id, n_members,
       n_tokens AS rep_n_tokens, passes_quality AS rep_passes_quality,
       doc_id <> cluster_id AS differs_from_min_id
FROM r WHERE rn = 1 ORDER BY cluster_id"""


def sql_signal_agreement(
    radius: int,
    params: MinHashParams,
    k_shingle: int,
    n_bands: int,
    rows_per_band: int,
    table: str = "documents",
    blacklist=(0,),
) -> str:
    """Oracle for plans/queries.q_signal_agreement: the exact / SimHash /
    MinHash pair sets (the latter two reuse the gated oracles as nested
    subqueries — DuckDB allows WITH inside a CTE body), folded to a
    membership bitmask and crossed with the 3-row family table."""
    shp = sql_simhash_radius_pairs(radius, table, blacklist)
    mhp = sql_minhash_band_pairs(params, k_shingle, n_bands, rows_per_band, table)
    return f"""
WITH exh AS (SELECT doc_id, md5(text) AS th FROM {table}),
ex AS (
    SELECT x.doc_id AS id_lo, y.doc_id AS id_hi
    FROM exh x JOIN exh y ON x.doc_id < y.doc_id AND x.th = y.th
),
shp AS (SELECT id_lo, id_hi FROM ({shp})),
mhp AS (SELECT id_lo, id_hi FROM ({mhp})),
tagged AS (
    SELECT id_lo, id_hi, 1 AS m FROM ex
    UNION ALL SELECT id_lo, id_hi, 2 FROM shp
    UNION ALL SELECT id_lo, id_hi, 4 FROM mhp
),
msk AS (
    SELECT id_lo, id_hi, sum(m)::BIGINT AS mask FROM tagged GROUP BY 1, 2
),
mc AS (SELECT mask, count(*)::BIGINT AS n FROM msk GROUP BY 1),
fams (fam_a, fam_b, bit_a, bit_b) AS (
    VALUES ('exact', 'minhash', 1, 4),
           ('exact', 'simhash', 1, 2),
           ('minhash', 'simhash', 4, 2)
),
agg AS (
    SELECT fam_a, fam_b,
           sum(CASE WHEN (mask & bit_a) <> 0 THEN n ELSE 0 END)::BIGINT
               AS n_pairs_a,
           sum(CASE WHEN (mask & bit_b) <> 0 THEN n ELSE 0 END)::BIGINT
               AS n_pairs_b,
           sum(CASE WHEN (mask & bit_a) <> 0 AND (mask & bit_b) <> 0
                    THEN n ELSE 0 END)::BIGINT AS n_common
    FROM fams CROSS JOIN mc GROUP BY 1, 2
)
SELECT fam_a, fam_b, n_pairs_a, n_pairs_b, n_common,
       CASE WHEN n_pairs_a + n_pairs_b - n_common = 0 THEN 0.0
            ELSE round(n_common::DOUBLE / (n_pairs_a + n_pairs_b - n_common),
                       6) + 0.0 END AS edge_jaccard
FROM agg ORDER BY fam_a, fam_b"""


def sql_source_dedup_savings(
    radius: int, table: str = "documents", blacklist=(0,)
) -> str:
    """Oracle for plans/queries.q_source_dedup_savings: the shared
    _cte_keep_list verdict joined to (source, token count), folded per
    source with the token savings fraction."""
    return rf"""
WITH RECURSIVE {_cte_keep_list(radius, table, blacklist)},
nt AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(text, '\s+'),
                           x -> x <> ''))::BIGINT AS n_tok
    FROM {table}
),
j AS (
    SELECT n.source, k.reason <> 'kept' AS removed, n.n_tok
    FROM kl k JOIN nt n ON k.doc_id = n.doc_id
),
a AS (
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN removed THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           sum(n_tok)::BIGINT AS n_tokens,
           sum(CASE WHEN removed THEN n_tok ELSE 0 END)::BIGINT
               AS tokens_removed
    FROM j GROUP BY source
)
SELECT source, n_docs, n_removed, n_tokens, tokens_removed,
       round(tokens_removed::DOUBLE / greatest(n_tokens, 1), 6) + 0.0
           AS savings_frac
FROM a ORDER BY source"""


def sql_kmv_cardinality(k: int, k_shingle: int, table: str = "documents") -> str:
    """Oracle for plans/queries.q_kmv_cardinality: same shingling
    (cte_shingles), same unsigned 32-bit hash (sql_shingle_hash32), same
    row_number k-minimum stage and estimator arithmetic — the double
    division of exact integers is IEEE-identical across engines."""
    m = float(4294967296)
    return f"""
WITH {cte_shingles(k_shingle, table)},
src AS (
    SELECT DISTINCT d.source, {sql_shingle_hash32('sh.s')} AS h
    FROM shing sh JOIN {table} d ON sh.doc_id = d.doc_id
),
ex AS (SELECT source, count(*)::BIGINT AS exact_distinct FROM src GROUP BY source),
rk AS (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM src
),
ks AS (
    SELECT source, count(*)::BIGINT AS n_min, max(h)::BIGINT AS h_k
    FROM rk WHERE rn <= {k} GROUP BY source
),
j AS (
    SELECT e.source, e.exact_distinct,
           CASE WHEN ks.n_min < {k} THEN e.exact_distinct::DOUBLE
                ELSE ({k} - 1) * {m} / greatest(ks.h_k, 1) END AS est
    FROM ex e JOIN ks ON e.source = ks.source
)
SELECT source, exact_distinct,
       round(est, 6) + 0.0 AS kmv_estimate,
       round(abs(est - exact_distinct) / exact_distinct, 6) + 0.0 AS rel_error
FROM j ORDER BY source"""


def sql_stream_embedding_near_pairs(
    dim: int,
    scale: int,
    radius: int,
    horizon_sec: int,
    seed: int = 42,
) -> str:
    """Oracle for plans/queries.q_stream_embedding_near_dup_replay: brute
    force over the SQL-recomputed hyperplane signatures (the sigs CTE of
    _cte_hyperplane_lsh — bit-identical fixed-point constants), Hamming
    <= radius, event-time delta <= horizon (vec_id * 61 s). Valid because
    the stream runs n_bands > radius: pigeonhole makes the banded state
    operator's recall exact, so candidacy does not enter the spec — the
    CTE's bands output is deliberately unused, hence no n_bands
    parameter here (it cannot affect the result)."""
    return f"""
WITH {_cte_hyperplane_lsh(dim, scale, seed=seed)}
SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
       bit_count(xor(a.sig, b.sig))::INT AS distance,
       (greatest(a.vec_id, b.vec_id) * 61)::BIGINT AS pair_ts_sec
FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.sig, b.sig)) <= {radius}
  AND abs(a.vec_id - b.vec_id) * 61 <= {horizon_sec}
ORDER BY id_lo, id_hi"""


def sql_incremental_embedding_near_pairs(
    dim: int,
    scale: int,
    radius: int,
    new_mod: int,
    seed: int = 42,
) -> str:
    """Oracle for plans/queries.q_incremental_embedding_near_pairs: the
    full brute-force hyperplane-signature radius-pair set restricted to
    pairs with at least one side in the new batch (vec_id % new_mod == 0)
    — the engine's two banded legs must together reproduce exactly this
    restriction (pigeonhole recall 1.0 at n_bands > radius). Brute force
    reads only the sigs CTE, so no n_bands parameter (it cannot affect
    the result)."""
    return f"""
WITH {_cte_hyperplane_lsh(dim, scale, seed=seed)}
SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
       bit_count(xor(a.sig, b.sig))::INT AS distance
FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.sig, b.sig)) <= {radius}
  AND (a.vec_id % {new_mod} = 0 OR b.vec_id % {new_mod} = 0)
ORDER BY id_lo, id_hi"""
