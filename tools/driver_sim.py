"""Simulate the driver's verify: smoke entry(), then run every queries()
entry at sf0.01 side-by-side with its oracle_sql() in DuckDB and report
row-count / schema / order-insensitive value match per query.

Usage: python tools/driver_sim.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(v):
    if isinstance(v, np.ndarray):
        return tuple(canon(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, float) and v != v:
        return "NaN"
    return v


def rows_canon(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False)),
        key=repr,
    )


def driver_hash(df):
    """Mimic the driver's dtype-sensitive canonicalize+hash: sort columns by
    name, pandas sort_values over all columns (TypeError on list/array cells,
    like the driver's round-1 citations_agg crash), then hash raw column
    bytes including the dtype string — so datetime64[ns]-vs-[us], int64-vs-
    object and NULL-ordering differences FAIL here like they do under the
    real driver, instead of slipping through a repr-level compare."""
    import hashlib

    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for c in cols:
        col = df[c]
        # Round-1 ground truth for the real driver's hasher: datetime64 unit
        # differences are tolerated (tumbling_hourly_events green with ns-vs-
        # us) and so are integer widths (acctbal_rollup green with int32-vs-
        # int64), but int-vs-float is NOT (sessionize_events red via DuckDB's
        # HUGEINT window sum -> float64). Normalize unit/width, keep kind.
        if str(col.dtype).startswith("datetime64"):
            col = col.astype("datetime64[ns]")
        elif col.dtype.kind in "iu":
            col = col.astype("int64")
        h.update(str(col.dtype).encode())
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import __spark_entry__ as e
    from vector_db_light_spark.session import get_spark

    spark = get_spark(app_name="driver-sim")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time() - t0:.1f}s  OK")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = [n for n in qs if args.only is None or n in args.only.split(",")]
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"pass  {name}: rows-only check, {len(sdf)} rows ({dt:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        try:
            shash, ohash = driver_hash(sdf), driver_hash(odf)
        except TypeError as ex:
            print(f"FAIL  {name}: driver canonicalizer would ERROR: {ex}")
            n_fail += 1
            continue
        if shash == ohash:
            print(f"PASS  {name}: {len(sdf)} rows hash-match ({dt:.1f}s)")
            n_pass += 1
            continue
        n_fail += 1
        srows, orows = rows_canon(sdf), rows_canon(odf)
        bad = next((i for i, (a, b) in enumerate(zip(srows, orows)) if a != b), None)
        if bad is not None:
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark : {srows[bad]}")
            print(f"      oracle: {orows[bad]}")
        else:
            sd = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
            od = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
            print(f"FAIL  {name}: values repr-match but driver hash differs (dtype-level)")
            print(f"      spark dtypes : {sd}")
            print(f"      oracle dtypes: {od}")
    spark.stop()

    # COVERAGE.md drift gate (VERDICT r6 #2): the query index must match
    # the live registry — regenerating must be a no-op. Runs BEFORE the
    # summary line so the printed totals agree with the exit status
    # (ADVICE r7: a coverage-only failure used to print '... 0 fail').
    import gen_coverage

    n_total = len(names)
    if args.only is None:
        n_total += 1  # the coverage gate is one more checked item
        if gen_coverage.main_check() != 0:
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_total} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
