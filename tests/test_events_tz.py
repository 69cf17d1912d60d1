"""Session-environment-proofing for the event-time queries.

The driver executes queries() under ITS OWN SparkSession — timezone and
parquet NTZ-inference settings included. Rounds 1-2 had `events_hourly_rate`
byte-identical to its oracle under a UTC session yet red under the driver's,
so these tests deliberately run the query under hostile session settings
(non-UTC TZ x NTZ-inference on/off) and assert the output still matches the
DuckDB oracle exactly.
"""

import duckdb
import pytest

from intraarchivededuplicator_spark.plans import oracle as O
from intraarchivededuplicator_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    rows = [tuple(r) for r in con.sql(sql).fetchall()]
    con.close()
    return _norm(rows)


def _norm(rows):
    out = [
        tuple(round(v, 9) if isinstance(v, float) else v for v in r) for r in rows
    ]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.fixture
def hostile_session(spark, request):
    tz, ntz = request.param
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.session.timeZone", tz)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz)
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old_tz)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old_ntz)


HOSTILE = [
    ("America/New_York", "true"),   # negative-offset TZ, NTZ read (Spark 4 default)
    ("America/New_York", "false"),  # same TZ, naive micros read as instants
    ("Asia/Kolkata", "true"),       # half-hour-offset TZ
    ("Asia/Kolkata", "false"),
]


@pytest.mark.parametrize("hostile_session", HOSTILE, indirect=True)
def test_events_hourly_rate_tz_proof(hostile_session):
    got = _norm([tuple(r) for r in Q.q_events_hourly_rate(hostile_session, SF).collect()])
    want = _oracle(O.sql_events_hourly_rate())
    assert got == want


@pytest.mark.parametrize("hostile_session", HOSTILE[:2], indirect=True)
def test_user_sessions_tz_proof(hostile_session):
    got = _norm([tuple(r) for r in Q.q_user_sessions(hostile_session, SF).collect()])
    want = _oracle(O.sql_user_sessions())
    assert got == want
