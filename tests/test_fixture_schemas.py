"""Fixture-schema contract: every table loaded via ``registry.load`` must
expose the LOGICAL schema the query surface is written against.

Round 4 lost 7 driver queries, 12 tests, and the whole bench to a silent
fixture regeneration (events.ts switched TIMESTAMP(NANOS) -> timestamp[us])
that the old loader couldn't absorb. This test turns any future physical
regeneration that breaks the logical contract into ONE clear failure naming
the table and column, instead of a dozen scattered AnalysisExceptions.

The contract is intentionally about the post-``load`` logical types (what
queries consume), not the parquet physical types (free to change as long as
``load`` adapts — see registry.load_events).
"""

from __future__ import annotations

import pytest

from vector_db_light_spark.registry import load

from conftest import SF_SMOKE

# table -> {column: expected Spark simpleString type}
LOGICAL_CONTRACT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",  # load_events guarantees this regardless of
        # the parquet physical type (BIGINT nanos or timestamp[us])
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", sorted(LOGICAL_CONTRACT))
def test_logical_schema_contract(spark, table):
    df = load(spark, SF_SMOKE, table)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for col, want in LOGICAL_CONTRACT[table].items():
        got = actual.get(col)
        if got is None:
            problems.append(f"{table}.{col}: MISSING (fixture regenerated?)")
        elif got != want:
            problems.append(f"{table}.{col}: expected {want}, got {got}")
    assert not problems, (
        "fixture logical-schema contract broken — a fixture regeneration "
        "likely changed physical types and registry.load did not adapt:\n  "
        + "\n  ".join(problems)
    )


def test_events_loader_absorbs_physical_variants(spark, tmp_path):
    """load_events must normalize BOTH physical vintages of events.ts to
    TIMESTAMP_NTZ with identical values: BIGINT nanoseconds (the original
    TIMESTAMP(NANOS) fixtures read under nanosAsLong) and plain
    timestamp[us] (current fixtures)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vector_db_light_spark.registry import load_events

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    base = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "view"],
        "value": [1.0, 2.0],
        "props": ["{}", "{}"],
    }

    us_dir = tmp_path / "us"
    us_dir.mkdir()
    pq.write_table(
        pa.table({**base, "ts": pa.array(micros, type=pa.timestamp("us"))}),
        str(us_dir / "events.parquet"),
    )

    ns_dir = tmp_path / "ns"
    ns_dir.mkdir()
    pq.write_table(
        pa.table(
            {**base, "ts": pa.array([m * 1000 for m in micros], type=pa.int64())}
        ),
        str(ns_dir / "events.parquet"),
    )

    got_us = load_events(spark, str(us_dir))
    got_ns = load_events(spark, str(ns_dir))
    assert got_us.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    assert got_ns.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    rows_us = {r["event_id"]: r["ts"] for r in got_us.collect()}
    rows_ns = {r["event_id"]: r["ts"] for r in got_ns.collect()}
    assert rows_us == rows_ns


def test_bench_baseline_artifact_is_loadable():
    """bench.py's regression guard silently degrades to unguarded when
    BENCH_BASELINE.json is missing/stale — make that state loud instead:
    the artifact must parse, match bench's sf, carry a canary, and cover
    every headline query."""
    import importlib
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_BASELINE.json")) as f:
        data = json.load(f)
    bench = importlib.import_module("bench")
    assert float(data["sf"]) == 0.1
    assert data.get("canary_sec"), "canary required for load-normalization"
    missing = [q for q in bench.HEADLINE if q not in data["queries"]]
    assert not missing, f"baseline missing headline queries: {missing}"
    baseline, canary = bench._load_baseline(0.1)
    assert canary and baseline, "bench._load_baseline must resolve the artifact"


def test_priority_window_is_exactly_50_registered_names():
    """The driver records CORRECTNESS for the FIRST 50 registered queries;
    registry.PRIORITY pins that window. Guard the invariants a rotation
    edit could silently break: exactly 50 names, every one registered
    with an oracle, and registration order actually starts with them."""
    from vector_db_light_spark.registry import ORACLES, PRIORITY, QUERIES

    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50
    assert list(QUERIES)[:50] == list(PRIORITY)
    missing_oracles = [n for n in PRIORITY if n not in ORACLES]
    assert not missing_oracles


def test_mechanical_window_derivation_invariants():
    """gen_coverage.next_window (VERDICT r11 #10) is the authority for
    registry.PRIORITY: exactly WINDOW_SIZE names, anchors first, every
    never-externally-passed ORACLE query (newcomer) present, CHANGED
    queries ahead of the longest-unrefreshed tail, and the committed
    PRIORITY matches the derivation verbatim."""
    import importlib
    import os
    import sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "tools"))
    gc = importlib.import_module("gen_coverage")
    from vector_db_light_spark.registry import ORACLES, PRIORITY, QUERIES

    window = gc.next_window()
    assert len(window) == gc.WINDOW_SIZE == 50
    assert list(PRIORITY) == window, (
        "registry.PRIORITY drifted from the mechanical derivation — "
        "run `python tools/gen_coverage.py --window` and paste"
    )
    for i, a in enumerate(gc.WINDOW_ANCHORS):
        assert window[i] == a
    latest = gc._last_pass_round(gc.WINDOW_DERIVED_AT)
    newcomers = {
        n for n in QUERIES if n in ORACLES and n not in latest
    }
    assert newcomers <= set(window), "a newcomer missed the window"
    # newcomers and CHANGED rows precede every mechanically-rotated row
    tail_rounds = [
        latest[n]
        for n in window
        if n in latest
        and n not in gc.WINDOW_ANCHORS
        and n not in gc.CHANGED_THIS_ROUND
    ]
    assert tail_rounds == sorted(tail_rounds), (
        "regression-guard slots must be oldest-external-pass-first"
    )
