"""Pin the two queries() entries the round-4 driver left outside its gate.

`orders_by_priority_month` and `nation_revenue` have always had oracle_sql()
entries, but the driver gated 50 of the 52 exposed queries (its own
selection), so their correctness never appeared in CORRECTNESS_r*.json
(VERDICT r4 "What's wrong" #4). This test replays the driver's
transport-strict compare (tools/check_oracles.normalize_df: columns sorted
by name, cells stringified, dtype-kind check) for exactly those two, at the
same sf0.01 the driver uses — so the gate-vs-surface delta is pinned locally
whatever subset the driver picks.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracles import SF_DIR, TABLES, normalize_df  # noqa: E402

LEFTOVERS = ["orders_by_priority_month", "nation_revenue"]


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
@pytest.mark.parametrize("name", LEFTOVERS)
def test_leftover_query_matches_oracle(spark, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql()[name]

    spdf = fn(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    opdf = con.sql(sql).df()

    scols, skinds, srows = normalize_df(spdf)
    ocols, okinds, orows = normalize_df(opdf)
    assert scols == ocols
    assert len(srows) == len(orows) and len(srows) > 0
    for c in scols:
        assert not (
            {"int", "float"} == {skinds[c], okinds[c]}
        ), f"transport dtype mismatch on {c}"
    assert srows == orows
