"""Integer batch-perceptron training (operators/classifier.py): exactness,
convergence on separable data, partition-independence, and the literal-
weight scoring path."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_light_spark.operators.classifier import (
    linear_score,
    perceptron_train,
)


def _toy(spark):
    # y = +1 iff x0 >= x1 (strictly separable via w=(2,-2), b=1)
    rows = [
        (1, 3, 1, 1), (2, 5, 2, 1), (3, 0, 4, -1), (4, 1, 6, -1),
        (5, 2, 2, 1), (6, 0, 1, -1), (7, 4, 0, 1), (8, 1, 3, -1),
    ]
    return spark.createDataFrame(rows, "id int, x0 bigint, x1 bigint, y bigint")


def test_perceptron_converges_and_is_partition_independent(spark):
    df = _toy(spark)
    curve = {
        r["round"]: r
        for r in perceptron_train(df, ["x0", "x1"], "y", iters=6).collect()
    }
    n_mis = [curve[t]["n_mis"] for t in sorted(curve)]
    assert n_mis[0] == 8  # zero weights misclassify everything (margin 0)
    assert 0 in n_mis  # separable toy set is fully learned
    # integer arithmetic: identical curve under any partitioning
    curve2 = {
        r["round"]: r
        for r in perceptron_train(
            df.repartition(7), ["x0", "x1"], "y", iters=6
        ).collect()
    }
    for t in curve:
        assert tuple(curve[t]) == tuple(curve2[t])


def test_perceptron_round_matches_hand_update(spark):
    # one row, one round: w=(0,), b=0 -> margin 0 -> misclassified ->
    # w' = y*x = -3, b' = y = -1
    df = spark.createDataFrame([(1, 3, -1)], "id int, x0 bigint, y bigint")
    r = perceptron_train(df, ["x0"], "y", iters=1).collect()[0]
    assert (r["round"], r["n_mis"], r["w0"], r["b"]) == (1, 1, -3, -1)


def test_linear_score_literal_weights(spark):
    df = _toy(spark)
    scored = linear_score(df, [2, -2], 1, ["x0", "x1"])
    rows = scored.collect()
    assert all(r["pred"] == r["y"] for r in rows)  # the planted separator
    assert all(r["margin"] == 2 * r["x0"] - 2 * r["x1"] + 1 for r in rows)
    # pred is derived from margin sign with 0 -> -1
    z = linear_score(
        spark.createDataFrame([(1, 0, 0)], "id int, x0 bigint, x1 bigint"),
        [1, 1], 0, ["x0", "x1"],
    ).collect()[0]
    assert z["margin"] == 0 and z["pred"] == -1
