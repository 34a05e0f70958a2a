"""Registry CORE: the QUERIES/ORACLES dicts, the @register decorator and
the table loaders — WITHOUT the population side effect.

Query modules import from here so that importing any single query module
directly (e.g. a test reaching for a fixture helper) never triggers the
full-registry population mid-import: ``registry._populate`` re-entering a
partially-initialized module used to see none of its registrations and
crash ``_reorder`` with 'PRIORITY names not registered' (review r8,
reproduced standalone). ``registry.py`` layers population + window
ordering on top and remains the public entry point.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable, with its
    DuckDB oracle SQL (None => driver runs a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Inferred parquet schemas per path: schema inference opens footers and
# lists the directory at every spark.read.parquet — ~60-100 ms per table
# per QUERY CONSTRUCTION, which at sub-second bench medians was ~20% of
# several headline queries (measured round 8: construct 0.17-0.25 s of
# ~0.75 s totals). The fixture schemas are immutable within a process, so
# infer once and replay with an explicit .schema() afterwards. On a real
# cluster the same trick is standard practice for hot query services
# (schema registry instead of per-query footer reads).
_SCHEMA_CACHE: dict[str, object] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    cached = _SCHEMA_CACHE.get(path)
    if cached is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(cached).parquet(path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ship_package(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on EXECUTOR python workers regardless of
    the driver process's cwd. mapInPandas/applyInPandas closures pickle by
    module reference, so workers must import ``vector_db_light_spark``
    themselves; that works by accident when the launching process's cwd is
    the repo root (cwd lands on the worker path) and breaks from any other
    cwd. ``addPyFile`` of a package zip is the standard fix — identical to
    how the package ships to a real 1000-executor cluster. Idempotent per
    SparkContext; ~100 ms once per session, nothing per query."""
    sc = spark.sparkContext
    if getattr(sc, "_vdl_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"vdl_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        pkg_dir = os.path.join(pkg_root, "vector_db_light_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, pkg_root))
    sc.addPyFile(zip_path)
    sc._vdl_pkg_shipped = True


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, hash-spread on doc_id (plans/spread.py): the table is
    small enough to arrive as 1-3 input splits, which would serialize the
    tokenize/regex/embed stages every text pipeline stacks on top. Use for
    per-row-CPU-heavy pipelines; plain ``load`` for scan-bound ones."""
    from .plans.spread import spread

    return spread(load(spark, sf_dir, "documents"), "doc_id")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive events loader. Fixtures have shipped ``ts`` two ways:

    * TIMESTAMP(NANOS) — Spark's vectorized reader rejects it, so with
      ``nanosAsLong`` the column reads back as BIGINT nanos; rebuild a
      TIMESTAMP_NTZ via ``timestamp_micros(ts div 1000)`` (values are exact
      microseconds, so the conversion is lossless).
    * plain ``timestamp[us]`` (current fixtures) — just cast to
      TIMESTAMP_NTZ.

    Branching on the *observed* logical type (not the fixture vintage) keeps
    both generations working. Session tz is pinned to UTC so any
    instant->wall-clock cast is tz-independent, matching DuckDB's naive
    timestamp semantics."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = _read_parquet(spark, f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        ts_col = F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    else:
        ts_col = F.col("ts").cast("timestamp_ntz")
    return raw.withColumn("ts", ts_col)


