"""Distributed Lloyd's k-means — the trainer the IVF tier reads its
clusters from.

The IVF index (`operators/similarity.py::ivf_search`,
`api.py::build_ivf_index`) partitions the corpus by a cluster label and
prunes unprobed partitions at scan time; the reference builds its flat
index without training (``/root/reference/vector_db_creator.py:205-235``
stores raw vectors), so the label has so far come from the fixture (or
pyspark.ml offline). This module supplies the missing trainer as a native
DataFrame loop — no pyspark.ml dependency, fully deterministic, and
therefore oracle-checkable end to end.

Determinism design (the hard part — float means are order-dependent):

* **Init** — the k seed rows with the smallest ``(md5(id), id)``: a
  deterministic, data-independent "random" draw both engines can replay.
* **Update** — centroids are computed in FIXED-POINT: each element is
  scaled to integer micro-units per row (``round((x + 2.0) * 1e6)`` —
  exact for ``|x| < 2``; embeddings are unit-norm so elements are in
  [-1, 1]), summed as BIGINT (exact, order-independent), divided with
  integer ``div``, and mapped back to a double. Every engine that follows
  this recipe produces BIT-IDENTICAL centroids — unlike a rounded float
  ``avg()``, there is no summation-order exposure at all. The 1e-6
  centroid quantization is far below clustering resolution.
* **Assign** — squared-L2 via the left-to-right double fold
  (``functions/vector.py`` order contract) against exact centroids;
  argmin with ``(distance, cluster_id)`` tie-break.

Scale shape (per iteration, corpus of N rows, k centroids):

* centroids are ALWAYS broadcast (k rows) — the cross join is a
  broadcast nested loop, never a shuffle;
* the argmin is the WindowGroupLimit top-1 shape (`batch_knn` precedent):
  each input partition pre-reduces its kN candidate rows to N before the
  single exchange on id;
* the update is a map-side partial BIGINT sum — the exchange moves
  k x partitions rows, not N.

At 100 TB you train on a sample (``corpus.sample(...)`` upstream — Lloyd's
converges on a few million rows regardless of corpus size; standard IVF
practice) and run ONE `kmeans_assign` pass over the full corpus to label
it; the per-iteration cost above then applies to the sample only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vector as V

# Fixed-point scale: 1e6 units, +2.0 offset keeps scaled values positive so
# integer `div` (trunc) == floor on both engines.
_SCALE = 1_000_000
_OFFSET = 2.0


def _u6(col):
    """Exact micro-unit encoding of an embedding element (|x| < 2)."""
    return F.round((col + F.lit(_OFFSET)) * F.lit(float(_SCALE)), 0).cast("long")


def kmeans_init(emb: DataFrame, k: int, id_col: str = "_id", vector_col: str = "_v") -> DataFrame:
    """Deterministic seeds: the k rows with the smallest (md5(id), id).

    Returns (cluster_id, centroid) with cluster_id in md5 order — a k-row
    DataFrame, always broadcast by callers.
    """
    h = F.md5(F.col(id_col).cast("string")).alias("_h")
    seeds = emb.select(F.col(id_col), F.col(vector_col), h).orderBy("_h", id_col).limit(k)
    w = Window.orderBy("_h", id_col)  # k rows: single-partition window is fine
    return seeds.select(
        (F.row_number().over(w) - F.lit(1)).alias("cluster_id"),
        F.col(vector_col).alias("centroid"),
    )


def kmeans_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "_id",
    vector_col: str = "_v",
    dim: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment: all input columns + (cluster_id,
    distance).

    Broadcast cross join + WindowGroupLimit top-1; ties broken by the
    smaller cluster_id so the argmin is total on both engines. Works with
    any comparable cluster_id type (ints from the trainer, the api layer's
    'kNNN' partition strings) and float or double vectors (the distance
    fold casts).
    """
    e = emb.alias("_e")
    c = centroids.alias("_c")
    # with dim known the distance unrolls into a codegen-able chain built
    # as one F.expr string (see functions/vector.py) — same fold order
    d = V.sum_of_squares_distance(
        f"_e.{vector_col}", "_c.centroid", dim=dim
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        F.col("_e.*"),
        F.col("_c.cluster_id").alias("cluster_id"),
        d.alias("distance"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("cluster_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def kmeans_assign_topn(
    emb: DataFrame,
    centroids: DataFrame,
    n: int = 2,
    id_col: str = "_id",
    vector_col: str = "_v",
    dim: int | None = None,
) -> DataFrame:
    """Top-``n`` nearest-centroid assignments per row (+ ``probe_rank``
    1..n) — the IVF probe set on the DATA side: a row participates in its
    ``n`` nearest cells. Same deterministic scoring/tie-break as
    :func:`kmeans_assign` (that function is the n=1 special case); used
    by the kmeans-blocked k-NN graph's probed variant, where the src side
    probes 2 cells exactly like a query probes nprobe partitions."""
    e = emb.alias("_e")
    c = centroids.alias("_c")
    d = V.sum_of_squares_distance(
        f"_e.{vector_col}", "_c.centroid", dim=dim
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        F.col("_e.*"),
        F.col("_c.cluster_id").alias("cluster_id"),
        d.alias("distance"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("cluster_id").asc()
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n)
    )


def kmeans_update(
    assigned: DataFrame, dim: int, vector_col: str = "_v"
) -> DataFrame:
    """Fixed-point centroid update: exact BIGINT element sums, integer div,
    map back to doubles. Bit-identical on any engine that follows the same
    integer recipe (module docstring). Empty clusters drop out (both
    engines drop them identically — assignment is deterministic)."""
    sums = [
        F.sum(_u6(F.col(vector_col)[i].cast("double"))).alias(f"_s{i}")
        for i in range(dim)
    ]
    agg = assigned.groupBy("cluster_id").agg(F.count("*").alias("n"), *sums)
    els = [
        (
            (F.expr(f"_s{i} div n") - F.lit(_OFFSET * _SCALE)).cast("double")
            / F.lit(float(_SCALE))
        ).alias(f"_c{i}")
        for i in range(dim)
    ]
    per_el = agg.select("cluster_id", "n", *els)
    return per_el.select(
        "cluster_id",
        "n",
        F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("centroid"),
    )


def kmeans_train(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` Lloyd rounds; returns (assigned, centroids) — the final
    assignment (with distances to the PRE-update centroids of the last
    round, i.e. the classic inertia decomposition) and the POST-update
    centroid table (cluster_id, n, centroid).

    The whole loop is ONE lazy plan (no driver materialization; `iters` is
    small by construction — Lloyd's is run for a fixed budget here, not to
    convergence, because convergence testing needs a driver-side reduce
    per round; callers who want it can loop `kmeans_assign`/`kmeans_update`
    themselves and inspect `n`/inertia per round).
    """
    emb = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vector_col).cast("array<double>").alias("_v"),
    )
    cents = kmeans_init(emb, k)
    assigned = None
    for _ in range(iters):
        assigned = kmeans_assign(emb, cents, dim=dim)
        cents = kmeans_update(assigned, dim)
    return assigned, cents
