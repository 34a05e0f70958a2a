#!/usr/bin/env python
"""Three-stage ANN funnel measurement (r13, VERDICT r12 #6): IVF cluster
prune -> sign-sketch Hamming shortlist WITHIN probed clusters -> exact
rerank, vs each two-stage path at matched exact-dot budget. Prints the
SCALE.md table. Budget counts corpus-vector exact dots only (centroid
dots are a dim-scale constant excluded on every path, matching the r12
graph-expansion experiment's accounting).

Usage: python tools/funnel_experiment.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_light_spark.operators import clustering as C  # noqa: E402
from vector_db_light_spark.operators import similarity as S  # noqa: E402
from vector_db_light_spark.operators.similarity import (  # noqa: E402
    sign_words_expr,
)
from vector_db_light_spark.session import get_spark  # noqa: E402

N_Q, K, KM_K, DIM = 20, 5, 10, 64


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").localCheckpoint(
        eager=True
    )
    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    truth = (
        S.batch_knn(emb, queries, dim=DIM, k=K)
        .select("query_id", F.col("vec_id").alias("t_vid"))
        .localCheckpoint(eager=True)
    )
    total = N_Q * K

    # corpus sketches + kmeans labels, shared by all paths
    sk = emb.select(
        "vec_id",
        "embedding",
        *[
            w.cast("bigint").alias(f"w{j}")
            for j, w in enumerate(sign_words_expr("embedding", DIM))
        ],
    )
    cents = C.kmeans_train(emb, k=KM_K, iters=2, dim=DIM)[1].select(
        "cluster_id", "centroid"
    )
    labeled = (
        C.kmeans_assign(sk, cents, id_col="vec_id", vector_col="embedding")
        .select("vec_id", "embedding", "cluster_id", "w0", "w1")
        .localCheckpoint(eager=True)
    )
    # query sketch words (broadcastable 20-row frame)
    qsk = queries.select(
        "query_id",
        "query_vec",
        *[
            w.cast("bigint").alias(f"q{j}")
            for j, w in enumerate(sign_words_expr("query_vec", DIM))
        ],
    ).localCheckpoint(eager=True)

    from pyspark.sql.window import Window

    hd = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("q0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("q1")))
    ).cast("bigint")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_hd").asc(), F.col("vec_id").asc()
    )

    def recall_and_budget(cand):
        """cand: (query_id, vec_id, query_vec, embedding) candidate rows
        to exact-rerank. Returns (recall, avg_dots)."""
        n_dots = cand.count()
        # exact rerank inline: dot + rank
        dot = F.expr(
            " + ".join(
                f"(cast(query_vec[{i}] as double) *"
                f" cast(embedding[{i}] as double))"
                for i in range(DIM)
            )
        )
        wr = Window.partitionBy("query_id").orderBy(
            F.col("_d").asc(), F.col("vec_id").asc()
        )
        top = (
            cand.withColumn("_d", (F.lit(1.0) - dot))
            .withColumn("_rk", F.row_number().over(wr))
            .filter(F.col("_rk") <= K)
            .select("query_id", "vec_id")
        )
        hits = top.join(
            truth,
            (top.query_id == truth.query_id) & (top.vec_id == truth.t_vid),
            "left_semi",
        ).count()
        return hits / total, n_dots / N_Q

    rows = []
    # path A: two-stage Hamming over the FULL corpus
    for sl in (10, 25, 50):
        cand = (
            labeled.crossJoin(F.broadcast(qsk))
            .withColumn("_hd", hd)
            .withColumn("_hrk", F.row_number().over(wq))
            .filter(F.col("_hrk") <= sl)
            .select("query_id", "vec_id", "query_vec", "embedding")
        )
        r, b = recall_and_budget(cand)
        rows.append((f"hamming-full shortlist={sl}", b, r))

    # path B: two-stage IVF exact (probe p clusters, exact-score all)
    cdot = F.expr(
        " + ".join(
            f"(cast(query_vec[{i}] as double) * cast(centroid[{i}] as double))"
            for i in range(DIM)
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("_cd").asc(), F.col("cluster_id").asc()
    )
    probes_all = (
        qsk.crossJoin(F.broadcast(cents))
        .withColumn("_cd", F.lit(1.0) - cdot)
        .withColumn("_crk", F.row_number().over(wc))
        .select("query_id", "query_vec", "q0", "q1", "cluster_id", "_crk")
        .localCheckpoint(eager=True)
    )
    for p in (1, 2, 3):
        probed = probes_all.filter(F.col("_crk") <= p)
        cand = labeled.join(
            F.broadcast(probed), "cluster_id"
        ).select("query_id", "vec_id", "query_vec", "embedding")
        r, b = recall_and_budget(cand)
        rows.append((f"ivf-exact nprobe={p}", b, r))

    # path C: three-stage — probe p clusters, Hamming shortlist within,
    # exact rerank
    for p in (2, 3):
        for sl in (10, 25, 50):
            probed = probes_all.filter(F.col("_crk") <= p)
            pool = labeled.join(F.broadcast(probed), "cluster_id")
            cand = (
                pool.withColumn("_hd", hd)
                .withColumn("_hrk", F.row_number().over(wq))
                .filter(F.col("_hrk") <= sl)
                .select("query_id", "vec_id", "query_vec", "embedding")
            )
            r, b = recall_and_budget(cand)
            rows.append((f"funnel nprobe={p} shortlist={sl}", b, r))

    print(f"\n{'path':36s} {'dots/q':>8s} {'recall@5':>9s}")
    for name, b, r in rows:
        print(f"{name:36s} {b:8.1f} {r:9.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
