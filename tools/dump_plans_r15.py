"""Dump .explain("formatted") for headline queries into plans/r15/.

Usage: python tools/dump_plans_r15.py before|after [query ...]
Defaults to the bench HEADLINE set. Writes plans/r15/<query>_<tag>.txt.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(HERE, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="vdl-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — one failure must not stop the dump
            txt = f"ERROR constructing {name}: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
