"""Unit tests for vocabulary stats, per-key quota capping, and the
trailing RANGE-frame window."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_light_spark.operators.sampling import cap_per_key
from vector_db_light_spark.operators.text_search import vocabulary
from vector_db_light_spark.plans.explain import explain_string


def test_vocabulary_tf_df_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple"),
        ],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in vocabulary(docs).collect()}
    assert (rows["apple"]["tf"], rows["apple"]["df"]) == (3, 2)
    assert (rows["banana"]["tf"], rows["banana"]["df"]) == (2, 2)
    assert (rows["cherry"]["tf"], rows["cherry"]["df"]) == (1, 1)


def test_vocabulary_top_k_order_is_total(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "b c")], "doc_id long, text string"
    )
    top = vocabulary(docs, top_k=2).collect()
    # all three terms have tf=2, df=2 -> alphabetical tie-break
    assert [r["term"] for r in top] == ["a", "b"]


def test_cap_per_key_caps_and_is_partition_independent(spark):
    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = {r["doc_id"] for r in cap_per_key(df, "source", 5).collect()}
    kept2 = {
        r["doc_id"]
        for r in cap_per_key(df.repartition(7, "doc_id"), "source", 5).collect()
    }
    assert kept1 == kept2  # md5 order, not partition order
    by_src = (
        cap_per_key(df, "source", 5)
        .groupBy("source")
        .count()
        .collect()
    )
    assert {r["source"]: r["count"] for r in by_src} == {"big": 5, "small": 5}


def test_cap_per_key_plan_has_window_group_limit(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    plan = explain_string(cap_per_key(df, "source", 5))
    assert "WindowGroupLimit" in plan, plan


def test_trailing_range_frame_hand_computed(spark):
    from pyspark.sql import Window

    daily = spark.createDataFrame(
        [(0, 100), (1, 200), (8, 50), (9, 25)], "day_num int, cents long"
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    got = {
        r["day_num"]: (r["s"], r["n"])
        for r in daily.select(
            "day_num",
            F.sum("cents").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
        ).collect()
    }
    # day 8 reaches back to day 2 -> only itself; day 9 sees days 3..9
    assert got[0] == (100, 1)
    assert got[1] == (300, 2)
    assert got[8] == (50, 1)
    assert got[9] == (75, 2)
