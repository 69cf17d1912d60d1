"""norm_dedup_key: stacked corners through BOTH regex engines, and the
planted grouping semantics of the gated query."""

import duckdb
from pyspark.sql import functions as F

from intraarchivededuplicator_spark.functions.weblines import norm_dedup_key
from intraarchivededuplicator_spark.plans import oracle as o
from intraarchivededuplicator_spark.plans import queries as q

SF = "/root/testdata/sf0.001"

NORM_CASES = [
    # (raw, normalized)
    ("Foo, BAR!  baz", "foo bar baz"),
    ("price 42 eur", "price 0 eur"),           # digit run -> one '0'
    ("v1.2.3-beta_4", "v0 0 0 beta 0"),        # punct splits, runs mask
    ("  lots   of   space  ", "lots of space"),
    ("!!!", ""),                               # punctuation-only -> empty
    ("", ""),
    ("MiXeD CaSe", "mixed case"),
    ("keep 中文 letters", "keep 中文 letters"),  # non-ASCII survives the class
    ("a~b`c[d]e{f}g", "a b c d e f g"),        # class range edges
]


def test_norm_chain_both_engines(spark):
    d = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(NORM_CASES)],
        "i long, raw string",
    ).select("i", norm_dedup_key(F.col("raw")).alias("n"))
    got = {r["i"]: r["n"] for r in d.collect()}
    for i, (raw, want) in enumerate(NORM_CASES):
        assert got[i] == want, (raw, got[i])

    # lift the oracle's norm expression over a VALUES table
    sql = o.sql_dedup_key_normalize()
    expr = sql.split("md5(", 2)[2].split(") AS norm_hash")[0]
    vals = ", ".join(
        "(%d, '%s')" % (i, raw.replace("'", "''"))
        for i, (raw, _) in enumerate(NORM_CASES)
    )
    lifted = (
        f"WITH r(i, raw) AS (VALUES {vals}) "
        f"SELECT i, {expr} AS n FROM r ORDER BY i"
    )
    for i, n in duckdb.connect(":memory:").execute(lifted).fetchall():
        assert n == NORM_CASES[i][1], (NORM_CASES[i][0], n)


def test_planted_grouping(spark):
    """Each run of 4 ids must split into exactly the planted groups:
    {b, b+1} (case/punct variant collapses) and {b+2, b+3} (digit-masked
    pair), except where two base docs share identical text corpus-wide."""
    rows = q.q_dedup_key_normalize(spark, SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    groups = {}
    for r in rows:
        groups.setdefault(r["norm_hash"], []).append(r["doc_id"])
    n_pair_01 = n_pair_23 = 0
    for b in range(0, len(rows), 4):
        r0, r1, r2, r3 = (by_id[b + i] for i in range(4))
        # raw hashes all distinct (the variants really differ pre-norm)
        assert len({r0["raw_hash"], r1["raw_hash"], r2["raw_hash"],
                    r3["raw_hash"]}) == 4
        assert r0["norm_hash"] == r1["norm_hash"]
        assert r2["norm_hash"] == r3["norm_hash"]
        assert r0["norm_hash"] != r2["norm_hash"]
        # group_min_id is the min over the whole corpus group
        assert r0["group_min_id"] == min(groups[r0["norm_hash"]])
        assert r2["group_min_id"] == min(groups[r2["norm_hash"]])
        n_pair_01 += 1
        n_pair_23 += 1
    assert n_pair_01 and n_pair_23
