"""Whole-stage-codegen compile probe (VERDICT r15 #2): execute one
registered query through the noop sink and report whether any stage hit
janino's `Code grows beyond 64 KB` compile fallback, plus min-of-N wall.

The fallback is logged by the JVM (CodeGenerator WARN with the janino
stack) on this process' stderr — this tool captures it via a log4j
appender-free trick: run the query, then scan the unified Spark log this
process wrote. Simplest reliable form: the CALLER redirects stderr and
greps it; this tool just prints the timing JSON on stdout.

Usage: python tools/codegen_probe.py <query> [sf_dir] 2> /tmp/cg.err
       grep -c 'grows beyond 64 KB' /tmp/cg.err
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    spark = get_spark(app_name="vdl-codegen-probe")
    spark.sparkContext.setLogLevel("WARN")

    def run_once() -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.time() - t0, 3)

    run_once()  # warm-up (codegen compile happens here -> stderr)
    ts = [run_once() for _ in range(3)]
    print(json.dumps({"query": name, "sf_dir": sf_dir, "min_sec": min(ts),
                      "runs": ts}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
