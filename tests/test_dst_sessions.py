"""DST-boundary pin for the timestamp window ops (VERDICT r4 #6).

The events parquet carries TIMESTAMP_NTZ (tz-free wall-clock) values.
Any op that converts them through the *session* timezone
(``unix_timestamp``) silently diverges from DuckDB's tz-free
``epoch()`` across a DST transition: spring-forward makes a 90-minute
NTZ gap look like 30 wall minutes (session splits that shouldn't),
fall-back makes a 30-minute NTZ gap look like 90 (splits that should
merge) — and 01:30 exists TWICE on fall-back night.  The fixed ops
(events_user_sessions, events_asof_attribution) compute gaps with
``timestampdiff`` from a fixed NTZ epoch, so this suite asserts
Spark == DuckDB row-for-row under a non-UTC session timezone whose
sessions straddle both 2024 US transitions.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest

TZ = "America/New_York"


@pytest.fixture()
def ny_session_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", TZ)
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


@pytest.fixture(scope="module")
def dst_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dstevents"))
    T = datetime.datetime
    rows = [
        # --- spring forward: 2024-03-10 02:00 EST -> 03:00 EDT ---
        # user 1: NTZ gaps of exactly 29 min around the jump — ONE
        # session on the NTZ clock.  (Wall-clock EST/EDT would see the
        # 01:45->03:10 step as 25 min too, but unix_timestamp's
        # session-tz conversion makes upstream 30-min comparisons
        # disagree with DuckDB for gaps that cross 02:00.)
        (100, T(2024, 3, 9, 23, 50, 0), 1, "click", 1.00, "{}"),
        (101, T(2024, 3, 10, 0, 19, 0), 1, "purchase", 2.50, "{}"),
        (102, T(2024, 3, 10, 0, 48, 0), 1, "click", 1.25, "{}"),
        (103, T(2024, 3, 10, 1, 17, 0), 1, "click", 0.75, "{}"),
        (104, T(2024, 3, 10, 1, 46, 0), 1, "purchase", 3.00, "{}"),
        # 02:15 does NOT exist in America/New_York on this night —
        # a session-tz conversion has to invent an interpretation;
        # NTZ arithmetic does not.
        (105, T(2024, 3, 10, 2, 15, 0), 1, "click", 1.00, "{}"),
        (106, T(2024, 3, 10, 2, 44, 0), 1, "purchase", 2.00, "{}"),
        # user 2: NTZ gap of 31 min crossing the jump — a NEW session
        # on the NTZ clock even though the WALL gap in EDT differs.
        (200, T(2024, 3, 10, 1, 45, 0), 2, "click", 1.00, "{}"),
        (201, T(2024, 3, 10, 2, 16, 0), 2, "purchase", 2.00, "{}"),
        # --- fall back: 2024-11-03 02:00 EDT -> 01:00 EST ---
        # user 3: 01:30 happens twice in wall time; NTZ sees a plain
        # 29-min then 31-min progression (one split, after 01:59).
        (300, T(2024, 11, 3, 1, 1, 0), 3, "click", 1.00, "{}"),
        (301, T(2024, 11, 3, 1, 30, 0), 3, "purchase", 2.00, "{}"),
        (302, T(2024, 11, 3, 1, 59, 0), 3, "click", 1.50, "{}"),
        (303, T(2024, 11, 3, 2, 30, 0), 3, "purchase", 2.25, "{}"),
        # user 4: exact 30-min boundary gaps (not > 1800s: same
        # session) placed right across the fall-back hour
        (400, T(2024, 11, 3, 0, 30, 0), 4, "click", 1.00, "{}"),
        (401, T(2024, 11, 3, 1, 0, 0), 4, "purchase", 2.00, "{}"),
        (402, T(2024, 11, 3, 1, 30, 0), 4, "click", 1.00, "{}"),
        (403, T(2024, 11, 3, 2, 0, 0), 4, "purchase", 2.00, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


def _oracle(sql: str, d: str):
    con = duckdb.connect()
    con.execute(f"SET TimeZone = '{TZ}'")
    # Spark writes a directory of part files — point DuckDB at the glob
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(d, 'events.parquet', '*.parquet')}'"
    )
    res = con.execute(sql)
    cols = [c[0] for c in res.description]
    return cols, sorted(map(tuple, res.fetchall()))


def test_sessions_match_duckdb_across_dst(spark, dst_dir, ny_session_tz):
    from docwire_spark.ops.relational import (
        EVENTS_SESSIONS_SQL, events_user_sessions,
    )

    df = events_user_sessions(spark, dst_dir)
    got = sorted(map(tuple, df.collect()))
    ocols, orows = _oracle(EVENTS_SESSIONS_SQL, dst_dir)
    assert df.columns == ocols
    assert got == orows
    by_user = {r[0]: r for r in got}
    # user 1: one NTZ session of 7 events (every gap 29 min)
    assert by_user[1][1:3] == (1, 7)
    # user 2: 31-min gap across spring-forward -> two sessions
    assert by_user[2][1] == 2
    # user 3: split only at the 31-min gap after 01:59 -> two sessions
    assert by_user[3][1] == 2
    # user 4: exact 30-min gaps never split (rule is > 1800 s)
    assert by_user[4][1:3] == (1, 4)


def test_asof_matches_duckdb_across_dst(spark, dst_dir, ny_session_tz):
    from docwire_spark.ops.relational import (
        EVENTS_ASOF_SQL, events_asof_attribution,
    )

    df = events_asof_attribution(spark, dst_dir)
    got = sorted(map(tuple, df.collect()))
    ocols, orows = _oracle(EVENTS_ASOF_SQL, dst_dir)
    assert df.columns == ocols
    assert got == orows
    gaps = {r[0]: r for r in got}
    # user 1's 02:44 purchase attributes to the 02:15 click with a
    # tz-free 29-min gap — even though 02:15 never existed on the
    # New York wall clock that night
    assert gaps[106][5] == 29 * 60 * 1_000_000
