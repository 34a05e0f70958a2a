"""The real driver builds its OWN SparkSession (none of session.py's
configs) and may import __spark_entry__ from any cwd. Executor python
workers then must import vector_db_light_spark themselves (mapInPandas
closures pickle by module reference) — which only worked by accident when
the launching process's cwd was the repo root. registry._ship_package
(addPyFile of a package zip, the same mechanism that ships the package to
a real cluster) makes it cwd-independent; this test runs the probe in a
subprocess with cwd=/ and a vanilla session so the accident can't come
back."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import importlib.util, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("vanilla").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, {repo!r})
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r}
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
# embed_hashed_features is the canonical mapInPandas (module-referencing
# closure) query; sf0.001 keeps the probe fast
n = mod.queries()["embed_hashed_features"](spark, {sf!r}).count()
assert n > 0, n
print("VANILLA_PROBE_OK", n)
"""


def test_entry_contract_survives_foreign_cwd_vanilla_session():
    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
    code = _PROBE.format(
        repo=REPO, entry=os.path.join(REPO, "__spark_entry__.py"), sf=sf
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/",
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0 and "VANILLA_PROBE_OK" in proc.stdout, (
        proc.stdout[-2000:] + "\n" + proc.stderr[-2000:]
    )
