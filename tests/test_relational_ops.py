"""Edge-case tests for asof_join / range_self_join / sessionize."""

from __future__ import annotations

import datetime as dt

from vector_db_light_spark.operators.relational import (
    asof_join,
    range_self_join,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_inclusive_boundary(spark):
    left = spark.createDataFrame(
        [(1, ts(10), 100), (1, ts(5), 101), (1, ts(0), 102), (2, ts(1), 103)],
        "k bigint, lts timestamp_ntz, lid bigint",
    )
    right = spark.createDataFrame(
        [(1, ts(0), 7), (1, ts(10), 8), (2, ts(2), 9)],
        "k bigint, rts timestamp_ntz, val bigint",
    )
    out = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, "k", "k", "lts", "rts", payload=["val"]
        ).collect()
    }
    # lid=100 at t10 matches val=8 (inclusive: right at same ts wins)
    # lid=101 at t5 matches val=7; lid=102 at t0 matches val=7 (inclusive)
    # lid=103 (k=2, t1) has no right row at-or-before -> dropped
    assert out == {100: 8, 101: 7, 102: 7}

    out_excl = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, "k", "k", "lts", "rts", payload=["val"], inclusive=False
        ).collect()
    }
    # exclusive: t10 now matches the earlier right row (t0); t0 matches nothing
    assert out_excl == {100: 7, 101: 7}


def test_asof_ties_on_right_are_deterministic(spark):
    left = spark.createDataFrame([(1, ts(5), 1)], "k bigint, lts timestamp_ntz, lid bigint")
    right = spark.createDataFrame(
        [(1, ts(0), 10), (1, ts(0), 20)], "k bigint, rts timestamp_ntz, val bigint"
    )
    rows = asof_join(left, right, "k", "k", "lts", "rts", payload=["val"]).collect()
    assert [r["val"] for r in rows] == [20]  # max payload wins the tie


def test_range_self_join_boundaries(spark):
    df = spark.createDataFrame(
        [(1, ts(0), 0), (1, ts(5), 1), (1, ts(10), 2), (1, ts(16), 3), (2, ts(1), 4)],
        "k bigint, t timestamp_ntz, id bigint",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in range_self_join(df, "k", "t", 300, "id").collect()
    }
    # gap 5 min inclusive upper bound: (0,1), (1,2) qualify; 2->3 is 6 min; no
    # cross-key pairs; no self/reverse pairs.
    assert pairs == {(0, 1), (1, 2)}


def test_sessionize_gap_boundary(spark):
    df = spark.createDataFrame(
        [(1, ts(0), 0), (1, ts(30), 1), (1, ts(61), 2), (2, ts(0), 3)],
        "user bigint, t timestamp_ntz, id bigint",
    )
    out = {
        r["id"]: r["session_id"]
        for r in sessionize(df, "user", "t", 30 * 60).collect()
    }
    # exactly 30 min -> same session; 31 min -> new session; per-user restart
    assert out == {0: 1, 1: 1, 2: 2, 3: 1}
