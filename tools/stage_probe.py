"""Break a query's noop execution into per-stage wall/metrics via the
Spark UI REST API (run with SPARK_GRAFT_UI=true).

Usage: SPARK_GRAFT_UI=true python tools/stage_probe.py <query>
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    name = sys.argv[1]
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vdl-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["knn_cosine_topk"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    # warm-up full run
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    df = QUERIES[name](spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before_jobs = set(tracker.getJobIdsForGroup(None) or [])
    sc.setJobDescription(f"stage-probe exec: {name}")
    df.write.mode("overwrite").format("noop").save()

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    rows = []
    for s in stages:
        rows.append(
            (
                s["stageId"],
                s.get("submissionTime", ""),
                round(s.get("executorRunTime", 0) / 1000.0, 2),
                s.get("numCompleteTasks", s.get("numTasks", 0)),
                round(s.get("inputBytes", 0) / 1e6, 1),
                round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    rows.sort(key=lambda x: x[0])
    print("stageId | submitted | execRunSec | tasks | inMB | shRdMB | shWrMB | desc")
    for row in rows[-60:]:
        print(" | ".join(str(x) for x in row))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
