"""applyInPandasWithState across micro-batches + bucketed co-located joins."""

from __future__ import annotations

import datetime as dt
import shutil

import pyspark.sql.functions as F
import pytest


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    ).write.mode("append").parquet(path)


def test_stateful_running_user_stats(spark, tmp_path):
    from vector_db_light_spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1)

    _write_events(spark, src, [(0, t0, 1, 10.0), (1, t0, 1, 5.0), (2, t0, 2, 1.0)])
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()

        def latest():
            # update-mode memory sink appends each emitted update; current
            # state per user = the row with the largest n_events
            rows = spark.sql("SELECT * FROM stateful_t").collect()
            state = {}
            for r in rows:
                cur = state.get(r["user_id"])
                if cur is None or r["n_events"] > cur[0]:
                    state[r["user_id"]] = (r["n_events"], r["total_value"])
            return state

        got1 = latest()
        assert got1[1] == (2, 15.0) and got1[2] == (1, 1.0)

        # second micro-batch: state must CARRY OVER (user 1 accumulates,
        # user 3 appears, user 2 untouched)
        _write_events(spark, src, [(3, t0 + dt.timedelta(hours=1), 1, 2.5),
                                   (4, t0 + dt.timedelta(hours=1), 3, 7.0)])
        q.processAllAvailable()
        got2 = latest()
        assert got2[1] == (3, 17.5)  # 2+1 events, 15.0+2.5
        assert got2[3] == (1, 7.0)
        assert got2[2] == (1, 1.0)   # unchanged
    finally:
        q.stop()


def test_stateful_running_user_stats_tws(spark, tmp_path):
    """Same per-user running stats on Spark 4's transformWithStateInPandas
    (ValueState + StatefulProcessor lifecycle): state must carry across
    micro-batches exactly like the applyInPandasWithState variant."""
    from vector_db_light_spark.streaming.stateful import (
        _tws_available,
        running_user_stats_tws,
    )

    if running_user_stats_tws is None or not _tws_available():
        import pytest

        pytest.skip(
            "transformWithStateInPandas needs pyspark>=4 and protobuf "
            "(google.protobuf absent in this container)"
        )

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1)
    _write_events(spark, src, [(0, t0, 1, 10.0), (1, t0, 1, 5.0), (2, t0, 2, 1.0)])
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    # transformWithState supports only the RocksDB state store (SPARK-49564)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = running_user_stats_tws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    try:
        q.processAllAvailable()

        def latest():
            rows = spark.sql("SELECT * FROM stateful_tws").collect()
            state = {}
            for r in rows:
                cur = state.get(r["user_id"])
                if cur is None or r["n_events"] > cur[0]:
                    state[r["user_id"]] = (r["n_events"], r["total_value"])
            return state

        got1 = latest()
        assert got1[1] == (2, 15.0) and got1[2] == (1, 1.0)

        _write_events(spark, src, [(3, t0 + dt.timedelta(hours=1), 1, 2.5),
                                   (4, t0 + dt.timedelta(hours=1), 3, 7.0)])
        q.processAllAvailable()
        got2 = latest()
        assert got2[1] == (3, 17.5)
        assert got2[3] == (1, 7.0)
        assert got2[2] == (1, 1.0)
    finally:
        q.stop()
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the Exchange — the
    co-located join strategy for repeated big-big joins at scale."""
    from conftest import SF_ORACLE

    from vector_db_light_spark.plans.explain import explain_string

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    joined = bl.join(
        bo.hint("merge"), bl["l_orderkey"] == bo["o_orderkey"]
    ).groupBy("o_orderstatus").count()
    plan = explain_string(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # sanity: same result as the unbucketed join
    plain = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).groupBy(
        "o_orderstatus"
    ).count()
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_closed_sessions_emit_on_event_time_timeout(spark, tmp_path):
    """EventTimeTimeout pattern: a session row is emitted only after the
    WATERMARK passes last_event + gap — quiet keys close, active keys
    stay open, and closed state is removed (bounded by open sessions)."""
    from vector_db_light_spark.streaming.stateful import closed_sessions

    src = str(tmp_path / "sess_src")

    def write(rows):
        spark.createDataFrame(
            rows, "user_id bigint, ts string, value double"
        ).write.mode("append").parquet(src)

    # user 1: two events 5 min apart (one session); user 2: one event
    write(
        [
            (1, "2026-01-01 00:00:00", 1.0),
            (1, "2026-01-01 00:05:00", 1.0),
            (2, "2026-01-01 00:06:00", 1.0),
        ]
    )
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = closed_sessions(stream, gap="10 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert (
            spark.sql("SELECT count(*) c FROM closed_sess").collect()[0]["c"] == 0
        )

        # much later activity from user 2 pushes the watermark far past
        # user 1's (last + gap) -> user 1's session closes; user 2's new
        # session stays open
        write([(2, "2026-01-01 02:00:00", 1.0)])
        q.processAllAvailable()
        # one more batch so the updated watermark's timeout sweep runs
        write([(2, "2026-01-01 02:00:01", 1.0)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM closed_sess ORDER BY user_id, session_start_us"
        ).collect()
        closed = {(r["user_id"], r["n_events"]) for r in rows}
        assert (1, 2) in closed
        # user 1's bounds are its two event times
        u1 = [r for r in rows if r["user_id"] == 1][0]
        assert u1["session_end_us"] - u1["session_start_us"] == 5 * 60 * 1_000_000
    finally:
        q.stop()
