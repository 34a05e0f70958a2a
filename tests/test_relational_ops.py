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


def test_scd2_merge_chained_versions(spark):
    """scd2_merge applied twice: change, delete, re-add and no-op keys all
    produce the textbook history — closed rows accumulate untouched, and
    exactly one open row exists per live key."""
    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.incremental import scd2_merge

    OPEN = 99_999
    v1 = spark.createDataFrame(
        [(1, 100, 1, OPEN, 1), (2, 200, 1, OPEN, 1), (3, 300, 1, OPEN, 1)],
        "k bigint, bal bigint, valid_from bigint, valid_to bigint, is_current int",
    )
    # v2: key 1 changes, key 2 deleted, key 4 added, key 3 unchanged
    s2 = spark.createDataFrame(
        [(1, 111), (3, 300), (4, 400)], "k bigint, bal bigint"
    )
    d2 = scd2_merge(v1, s2, "k", ["bal"], version=2, open_version=OPEN)
    # v3: key 2 re-added, key 4 changes
    s3 = spark.createDataFrame(
        [(1, 111), (2, 222), (3, 300), (4, 444)], "k bigint, bal bigint"
    )
    d3 = scd2_merge(d2, s3, "k", ["bal"], version=3, open_version=OPEN)
    rows = {
        (r["k"], r["valid_from"]): (r["bal"], r["valid_to"], r["is_current"])
        for r in d3.collect()
    }
    assert rows == {
        (1, 1): (100, 2, 0),
        (1, 2): (111, OPEN, 1),
        (2, 1): (200, 2, 0),
        (2, 3): (222, OPEN, 1),
        (3, 1): (300, OPEN, 1),
        (4, 2): (400, 3, 0),
        (4, 3): (444, OPEN, 1),
    }
    open_per_key = (
        d3.filter(F.col("valid_to") == OPEN).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_per_key)


def test_key_skew_stats_hand_case(spark):
    """Gini/top-share verified by hand: key a x6, b x2, c x1, d x1."""
    from vector_db_light_spark.operators.relational import key_skew_stats

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_stats(df, "k", "t.k").collect()[0]
    assert (r["key_name"], r["n_rows"], r["n_keys"]) == ("t.k", 10, 4)
    assert r["top1_share_u6"] == 600_000
    assert r["top10_share_u6"] == 1_000_000  # only 4 keys
    # counts ascending: c=1,1,2,6 -> sum(i*c) = 1+2+6+24 = 33
    # gini = (2*33 - 5*10) / (4*10) = 16/40 = 0.4
    assert r["gini_u6"] == 400_000

    # uniform distribution -> gini 0
    u = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    assert key_skew_stats(u, "k", "u.k").collect()[0]["gini_u6"] == 0


def test_multi_touch_attribution_invariants(spark):
    """Hand-verified credits + the conservation invariant: every purchase
    distributes exactly 1e6 micro-units under BOTH models."""
    import datetime as dt

    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.relational import (
        multi_touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, mins, user, typ, k=None):
        props = f'{{"k": {k}}}' if k is not None else "{}"
        return (eid, t0 + dt.timedelta(minutes=mins), user, typ, props)

    rows = [
        # user 1: three touches then a purchase -> n=3 U-shape 40/20/40
        ev(1, 0, 1, "click", 7),
        ev(2, 10, 1, "view", 8),
        ev(3, 20, 1, "click", 9),
        ev(4, 30, 1, "purchase"),
        # user 2: one touch -> 100%
        ev(10, 0, 2, "view", 7),
        ev(11, 5, 2, "purchase"),
        # user 3: touch OUTSIDE the window -> unattributed purchase
        ev(20, 0, 3, "click", 7),
        ev(21, 60 * 30, 3, "purchase"),
        # user 4: touch AFTER the purchase -> no credit
        ev(30, 10, 4, "purchase"),
        ev(31, 20, 4, "click", 7),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, props string"
    )
    got = {
        r["item"]: (r["n_touches"], r["linear_u6"], r["ushape_u6"])
        for r in multi_touch_attribution(df).collect()
    }
    # user 1 linear: 333333, 333333, 333334 (remainder to last);
    # U-shape n=3: first 400000, middle 200000, last 400000
    assert got[7] == (2, 333_333 + 1_000_000, 400_000 + 1_000_000)
    assert got[8] == (1, 333_333, 200_000)
    assert got[9] == (1, 333_334, 400_000)
    # conservation: 2 attributed purchases x 1e6 under both models
    assert sum(v[1] for v in got.values()) == 2_000_000
    assert sum(v[2] for v in got.values()) == 2_000_000
