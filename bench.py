"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}.

Each query is materialized through the noop sink (full execution, no
driver-side row transfer), after a warm-up that triggers JVM/codegen init.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference retrieval path
    "search_pipeline",
    "knn_batch_topk",
    "ann_ivf_pruned",
    # relational / analytics
    "pricing_summary",
    "shipping_priority",
    "acctbal_rollup",
    "sessionize_events",
    "tumbling_hourly_events",
    "asof_event_order",
    # ingest / chunk / embed pipeline
    "chunk_fixed_stride",
    "embed_hashed_features",
    "index_build_pipeline",
    # LLM-data-pipeline extensions
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    spark = get_spark(app_name="vdl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer caches
    QUERIES["knn_cosine_topk"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    out = {
        "metric": f"total wall-clock of {len(HEADLINE)} headline queries (noop sink)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
