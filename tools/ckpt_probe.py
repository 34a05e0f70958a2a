"""Time every localCheckpoint materialization inside a query's
construction, attributing each to its caller site.

Usage: python tools/ckpt_probe.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    # Spark 4: the concrete class (method lookup lands there, not on the
    # pyspark.sql.DataFrame ABC)
    from pyspark.sql.classic.dataframe import DataFrame

    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vdl-ckpt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["knn_cosine_topk"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    orig = DataFrame.localCheckpoint
    log: list[tuple[str, float]] = []

    def timed(self, eager=True):
        caller = next(
            (
                f"{os.path.basename(fr.filename)}:{fr.lineno}"
                for fr in reversed(traceback.extract_stack())
                if "vector_db_light_spark" in fr.filename
            ),
            "?",
        )
        t0 = time.time()
        out = orig(self, eager)
        log.append((caller, round(time.time() - t0, 3)))
        return out

    DataFrame.localCheckpoint = timed
    try:
        for name in sys.argv[1:]:
            for run in range(2):
                log.clear()
                t0 = time.time()
                df = QUERIES[name](spark, sf_dir)
                t1 = time.time()
                df.write.mode("overwrite").format("noop").save()
                t2 = time.time()
                ck = sum(s for _, s in log)
                print(
                    f"{name} run{run}: construct {t1 - t0:.2f}s"
                    f" (checkpoints {ck:.2f}s) exec {t2 - t1:.2f}s"
                )
                for caller, sec in log:
                    print(f"    {caller}: {sec:.3f}s")
    finally:
        DataFrame.localCheckpoint = orig
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
