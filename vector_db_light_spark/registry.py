"""Central registry binding every operator to (spark_query, duckdb_oracle).

``__spark_entry__.py`` re-exports this registry; keeping both halves of each
pair side by side guarantees the driver's queries()/oracle_sql() keys and
output column names stay in lockstep (the driver hash-compares values after
sorting columns by name).

Oracle-parity rules used throughout:
  * dot products: left-to-right double fold on both sides (bit-identical);
  * aggregate SUM/AVG over doubles: rounded (summation order differs);
  * only portable hash functions (md5) — Spark xxhash64 != DuckDB hash.
"""

from __future__ import annotations

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    rejects; read nanos as long and rebuild a TIMESTAMP_NTZ (values are exact
    microseconds, so the ns->us conversion is lossless). Session tz is pinned
    to UTC for the instant->wall-clock cast so results are tz-independent,
    matching DuckDB's naive TIMESTAMP_NS semantics."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )


# Importing the query modules populates the registry.
def _populate() -> None:
    from .queries import (  # noqa: F401
        retrieval,
        chunking,
        relational,
        dedup,
        similarity,
        textstats,
        pipeline,
        search_text,
        analytics,
        subqueries,
        reshape,
    )


_populate()
