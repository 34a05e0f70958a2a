"""Distributed linear-classifier training, oracle-exact: the batch
perceptron over INTEGER features.

Training-data pipelines do not just filter with hand rules — they train
quality classifiers (fastText-style) on labeled samples and score the
corpus with them. The trainable core of that loop is expressible in
Spark's aggregation model: a batch perceptron round is

    misclassified_i :  y_i * (w . x_i + b) <= 0
    w' = w + SUM over misclassified of y_i * x_i
    b' = b + SUM over misclassified of y_i

— one corpus scan + one tiny aggregate per round, with the 1-row weight
table broadcast back into the next round's scan (the same shape as
PageRank's dangling-mass aggregate). With integer features and labels in
{-1, +1}, EVERY quantity is a BIGINT: no learning-rate float, no
summation-order exposure, bit-identical across engines and partitionings
(the kmeans/pagerank fixed-point discipline applied to model training).
Novikoff's theorem guarantees convergence when the labels are linearly
separable in the features — which a planted linear rule makes true by
construction in the registered query, so the per-round misclassification
count demonstrably falls.

Scale shape per round (N rows, d features): one scan computing d+1
conditional sums (map-side combine collapses it to one number per
partition per feature) + a 1-row broadcast. At 100 TB: d is small
(dozens), rounds are few — wall-clock is `rounds` corpus scans; train on
a sample (classifier quality saturates long before the corpus does) and
score the full corpus once with the final broadcast weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def perceptron_round(
    feats: DataFrame,
    weights: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
) -> DataFrame:
    """One batch-perceptron update. ``weights`` is a 1-row frame with
    columns w0..w{d-1}, b; returns the updated 1-row frame plus ``n_mis``
    (misclassified count BEFORE the update — the round's error)."""
    d = len(feature_cols)
    scored = feats.crossJoin(F.broadcast(weights))  # 1-row weight side
    margin = F.col("b")
    for j, c in enumerate(feature_cols):
        margin = margin + F.col(f"w{j}") * F.col(c)
    mis = (F.col(label_col) * margin) <= 0
    upd = [
        F.sum(F.when(mis, F.col(label_col) * F.col(c)).otherwise(F.lit(0)))
        .cast("long")
        .alias(f"_g{j}")
        for j, c in enumerate(feature_cols)
    ]
    agg = scored.groupBy(*[F.col(f"w{j}") for j in range(d)], F.col("b")).agg(
        F.sum(F.when(mis, 1).otherwise(0)).cast("long").alias("n_mis"),
        F.sum(F.when(mis, F.col(label_col)).otherwise(F.lit(0)))
        .cast("long")
        .alias("_gb"),
        *upd,
    )
    return agg.select(
        *[
            (F.col(f"w{j}") + F.col(f"_g{j}")).cast("long").alias(f"w{j}")
            for j in range(d)
        ],
        (F.col("b") + F.col("_gb")).cast("long").alias("b"),
        "n_mis",
    )


def perceptron_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 3,
) -> DataFrame:
    """Run ``iters`` batch-perceptron rounds from zero weights; returns one
    row per round: (round, n_mis, w0..w{d-1}, b) with the POST-update
    weights and the PRE-update misclassification count — the training
    curve itself is the oracle-checkable artifact. Each round's 1-row
    weight table is ``localCheckpoint``ed (house rule for iterative
    algorithms): the next round's scan must not replay this round's."""
    d = len(feature_cols)
    spark = feats.sparkSession
    weights = spark.createDataFrame(
        [tuple([0] * (d + 1))],
        ", ".join([f"w{j} BIGINT" for j in range(d)] + ["b BIGINT"]),
    )
    rounds = []
    for t in range(1, iters + 1):
        updated = perceptron_round(
            feats, weights, feature_cols, label_col
        ).localCheckpoint(eager=True)
        rounds.append(
            updated.select(
                F.lit(t).cast("int").alias("round"),
                "n_mis",
                *[F.col(f"w{j}") for j in range(d)],
                "b",
            )
        )
        weights = updated.drop("n_mis")
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


def linear_score(
    df: DataFrame,
    weights: list[int],
    bias: int,
    feature_cols: list[str],
) -> DataFrame:
    """Score rows with literal trained weights: margin column (BIGINT) +
    predicted label. The 100 TB serving path — one narrow no-shuffle map
    over the corpus with the model as plan literals."""
    margin = F.lit(int(bias)).cast("long")
    for w, c in zip(weights, feature_cols):
        margin = margin + F.lit(int(w)).cast("long") * F.col(c)
    return df.select(
        "*",
        margin.alias("margin"),
        F.when(margin > 0, 1).otherwise(-1).cast("int").alias("pred"),
    )
