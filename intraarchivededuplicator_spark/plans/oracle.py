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
