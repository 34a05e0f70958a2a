"""Per-query construct-vs-execute timing probe (optimization round 15).

For each query: time the Python-side construction (includes Py4J plan
building AND any eager localCheckpoint materializations) separately from
the noop-sink execution, N times, and print per-phase minima. This splits
"where does the bench second go" into the two halves the optimization
guide treats differently (plan/build cost vs computation).

Usage: python tools/opt_probe.py [-n N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vdl-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-ups (same as bench.py)
    QUERIES["knn_cosine_topk"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    for name in args:
        spark.sparkContext.setJobDescription(f"opt-probe: {name}")
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()  # untimed warm-up
        cons, runs = [], []
        for _ in range(n):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            cons.append(round(t1 - t0, 3))
            runs.append(round(t2 - t1, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "construct_min": min(cons),
                    "exec_min": min(runs),
                    "construct_all": cons,
                    "exec_all": runs,
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
