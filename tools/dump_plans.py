"""Dump .explain('formatted') for registered queries (plans/rN evidence).

Usage: python tools/dump_plans.py out_dir query [query ...]
Writes <out_dir>/<query>.txt per query at sf0.01 (override with
$SPARK_GRAFT_SF_DIR). The r16 plan files were produced with this flow
(before-variants via `git stash` of the touched module).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, names = sys.argv[1], sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from vector_db_light_spark.plans.explain import explain_string
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    spark = get_spark(app_name="vdl-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(explain_string(df, mode="formatted"))
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
