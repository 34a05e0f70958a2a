"""Physical-plan shape assertions — the properties that keep these operators
viable at 100 TB (SURVEY.md §4): top-k short-circuit, broadcast lookup
joins, filter pushdown, column pruning."""

from __future__ import annotations

from conftest import SF_ORACLE

from vector_db_light_spark.functions.vector import default_query_vector
from vector_db_light_spark.operators.knn import knn, search
from vector_db_light_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    explain_string,
)

Q = default_query_vector()


def test_knn_plans_take_ordered_not_global_sort(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = knn(emb, Q, k=6)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_search_lookup_join_is_broadcast(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    df = search(emb, docs, Q, k=6, score_threshold=0.0)
    plan = explain_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan  # k rows must never shuffle the corpus


def test_filter_pushdown_reaches_parquet_scan(spark):
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = explain_string(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = explain_string(df)
    # ReadSchema must carry only the projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_knn_scan_reads_only_needed_columns(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = knn(emb, Q, k=6)
    plan = explain_string(df)
    assert "label" not in plan.split("ReadSchema:")[-1]
