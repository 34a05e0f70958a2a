"""Lloyd's k-means trainer (operators/clustering.py): convergence
monotonicity, determinism, full coverage, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_db_light_spark.operators import clustering as C
from vector_db_light_spark.registry import load


def _emb(spark):
    return load(spark, SF_SMOKE, "embeddings")


def _inertia(assigned) -> int:
    # exact micro-unit inertia (the same encoding the oracle checks)
    return assigned.select(
        F.sum(F.round(F.col("distance") * F.lit(1e6), 0).cast("long")).alias("i")
    ).collect()[0]["i"]


def test_inertia_monotone_and_total_coverage(spark):
    emb = _emb(spark)
    n_rows = emb.count()
    prev = None
    std = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    cents = C.kmeans_init(std, k=4)
    for _ in range(3):
        assigned = C.kmeans_assign(std, cents)
        # every row is assigned exactly once
        assert assigned.count() == n_rows
        cur = _inertia(assigned)
        if prev is not None:
            # Lloyd's never increases inertia; fixed-point quantization of
            # the centroids (1e-6/element) cannot flip that at this scale
            assert cur <= prev
        prev = cur
        cents = C.kmeans_update(assigned, dim=64)
    assert cents.count() <= 4


def test_kmeans_deterministic(spark):
    emb = _emb(spark)
    a1, c1 = C.kmeans_train(emb, k=3, iters=2, dim=64)
    a2, c2 = C.kmeans_train(emb, k=3, iters=2, dim=64)
    r1 = sorted(map(tuple, c1.select("cluster_id", "n").collect()))
    r2 = sorted(map(tuple, c2.select("cluster_id", "n").collect()))
    assert r1 == r2
    i1, i2 = _inertia(a1), _inertia(a2)
    assert i1 == i2


def test_assign_plan_broadcasts_centroids(spark):
    """The k-row centroid side must reach the corpus as a broadcast nested
    loop — never a shuffle/SortMergeJoin — so each Lloyd round adds zero
    exchanges on the corpus side before the argmin."""
    emb = _emb(spark)
    std = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    assigned = C.kmeans_assign(std, C.kmeans_init(std, k=4))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_random_projection_preserves_distances(spark):
    """JL guarantee, measured: 64->16 Rademacher projection keeps pairwise
    L2 distances within loose relative distortion on the deterministic
    fixture (test-only driver-side math over a small sample)."""
    import numpy as np

    from vector_db_light_spark.operators.similarity import random_projection

    emb = load(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") < 30)
    rows = (
        random_projection(emb, 64, 16)
        .select("vec_id", "embedding", "proj")
        .orderBy("vec_id")
        .collect()
    )
    orig = np.array([r["embedding"] for r in rows], dtype=np.float64)
    proj = np.array([r["proj"] for r in rows], dtype=np.float64)
    dists_o, dists_p = [], []
    for i in range(0, len(rows) - 1, 2):
        dists_o.append(np.linalg.norm(orig[i] - orig[i + 1]))
        dists_p.append(np.linalg.norm(proj[i] - proj[i + 1]))
    rel = np.abs(np.array(dists_p) / np.array(dists_o) - 1.0)
    assert rel.mean() < 0.35
    assert rel.max() < 1.0
