"""Oracle-parity + semantics tests for the retrieval surface (SURVEY.md §2.2-2.6)."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE, SF_SMOKE, assert_oracle_match
from vector_db_light_spark.registry import ORACLES


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    """Every hash-checkable query matches its DuckDB oracle at sf0.01 —
    the same gate the driver runs."""
    assert_oracle_match(spark, duck, name)


def test_knn_returns_k_rows(spark):
    from vector_db_light_spark.functions.vector import default_query_vector
    from vector_db_light_spark.operators.knn import knn

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    res = knn(emb, default_query_vector(), k=6).collect()
    assert len(res) == 6
    sims = [r["similarity"] for r in res]
    assert sims == sorted(sims, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in sims)


def test_search_empty_term_is_noop(spark):
    from vector_db_light_spark.functions.vector import default_query_vector
    from vector_db_light_spark.operators.knn import search

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    q = default_query_vector()
    base = search(emb, docs, q, k=10, score_threshold=0.0, search_term="")
    assert base.count() == 10


def test_search_threshold_can_empty(spark):
    from vector_db_light_spark.functions.vector import default_query_vector
    from vector_db_light_spark.operators.knn import search

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    q = default_query_vector()
    assert search(emb, docs, q, k=5, score_threshold=1.01).count() == 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 14
