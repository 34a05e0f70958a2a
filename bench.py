"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "canary_sec": N, "sf": N}.

Each query is materialized through the noop sink (full execution, no
driver-side row transfer), after a warm-up that triggers JVM/codegen init.
Every timing is the MIN of $SPARK_GRAFT_BENCH_RUNS runs (default 5) — the
steady-state floor; timing noise is additive so the min has far lower
variance than the median (see the inline note), and BENCH_BASELINE.json
records the same statistic, so the comparison is same-shape and single-run
noise cannot masquerade as a regression. The calibration canary stays a
MEDIAN of its samples: it measures ambient load, not a floor.

Calibration canary: a fixed parquet scan+aggregate whose plan never changes
(no code in this repo can alter it) is timed in the SAME run — interleaved
before and after the guarded queries — and emitted as ``canary_sec``. The
canary makes the recorded artifact adjudicable: machine load inflates the
canary and the queries alike, so a reader (or the guard below) compares
canary-normalized ratios instead of raw wall-clock across runs taken under
different load.

Regression guard: each query is compared against the recorded baseline
(BENCH_BASELINE.json — per-query min-of-N floors recorded under the same
statistic over >=3 fresh-process runs, with the baseline canary stored;
falls back to BENCH_r01.json with no canary). Ratios are
divided by ``canary_now / canary_baseline`` (clamped >= 1), so a loaded
machine does not read as a regression while a genuine uniform slowdown
(bad session conf etc.) still trips it — unlike median-self-normalization,
the canary cannot be dragged by the guarded set. A query is a regression
when it is BOTH >2x its load-normalized baseline AND >0.5s over it
(absolute slack + one retry filter out timing noise on sub-second queries).
Regressions are listed on stderr and flip the exit code to 1 — the JSON
line on stdout is printed either way.

Isolated-probe mode (VERDICT r14 #3): ``python bench.py --only <query>``
runs ONE query in this fresh process — the standard warm-ups, an untimed
per-query warm-up run, then min-of-5 — and prints a one-line JSON with the
canary-normalized ratio vs the recorded baseline. Use it to adjudicate
full-set excursions: heavy queries' JVM session state (codegen caches, GC
pressure, shuffle files) inflates small queries sharing the process by
~15-20% and the canary cannot see it (it tracks machine load, not session
history), so a sub-second query reading 1.5-1.9x in a full-set run
routinely probes at or under baseline alone — see BASELINE.md "Session
state and isolated probes".
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
    # round-9 additions (baseline entries recorded at round 9 — see
    # BENCH_BASELINE.json metric note)
    "pack_training_sequences",
    "covisitation_topk",
    "classifier_curation_pipeline",
    "media_curation_pipeline",
    # round-10 additions
    "bm25_wand_topk",
    "kn_fluency_score",
    # round-11 additions: index-backed serving (the persisted-artifact
    # lever; its one-time index build runs in the per-query untimed
    # warm-up, like ann_ivf_pruned's centroid artifact) and the
    # dedup+fluency+langid curation capstone
    "bm25_index_wand_topk",
    "curation_mix_manifest",
    # round-12 additions: the 1-bit ANN serving tier (integer coarse pass
    # + shortlist rerank) and the all-integer Gopher rule battery
    "knn_hamming_topk",
    "gopher_quality_battery",
    # round-13 additions: the production tokenizer capstone (sampled
    # trainer -> frozen 64-merge artifact -> rank-based vocab-factored
    # apply -> bin packing; artifact builds in the untimed warm-up, like
    # ann_ivf_pruned's centroids) and the perceptual video tier
    # (demux -> PNG decode -> per-frame dHash -> key-set Jaccard)
    "tokenize_pack_pipeline",
    "video_dhash_neardup",
    # round-14 addition: the ten-stage LLM corpus megapipeline capstone
    # (PII scrub -> C4 -> Gopher -> exact+near dedup -> decontam ->
    # CCNet-approx buckets -> temperature mixing -> frozen-BPE tokenize
    # -> bin packing); the BPE merge artifact builds in the untimed
    # warm-up like tokenize_pack_pipeline's
    "llm_corpus_pipeline",
]


def main() -> int:
    only: str | None = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        only = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vector_db_light_spark.registry import QUERIES
    from vector_db_light_spark.session import get_spark

    if only is not None and only not in QUERIES:
        print(f"unknown query: {only}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="vdl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer caches. A failing warm-up must
    # not abort the bench — the query's own timed run records the error.
    try:
        QUERIES["knn_cosine_topk"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
        print(f"WARMUP-ERR  knn_cosine_topk: {_errmsg(exc)}", file=sys.stderr)
    # index-build warm-up: ann_ivf_pruned serves from a persisted centroid
    # artifact built once per corpus (constructing the query builds and
    # memoizes it). Index build cost is index_build_pipeline's metric;
    # ann_ivf_pruned's is steady-state serving latency against the built
    # index, so the build runs outside the timed region.
    try:
        QUERIES["ann_ivf_pruned"](spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"WARMUP-ERR  ann_ivf_pruned: {_errmsg(exc)}", file=sys.stderr)
    # Python-worker-pool warm-up: the first Arrow/Pandas stage of a session
    # pays one python worker spawn per core (~2s at 32 cores), which is
    # session setup like JVM init, not query cost — prime it with a no-op
    # mapInPandas so the embed queries measure steady-state throughput.
    try:
        spark.range(64).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).write.mode("overwrite").format("noop").save()
    except Exception as exc:  # noqa: BLE001
        print(f"WARMUP-ERR  python-workers: {_errmsg(exc)}", file=sys.stderr)

    def run_once(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    # One UNTIMED warm-up run, then MIN-of-N (default 5): the first run
    # of a query pays codegen compile + shuffle-file/footer cache misses
    # that are session state, not query cost. The per-query statistic is
    # the minimum, not the median (changed round 10): timing noise on
    # sub-second queries — GC pauses, JIT deopt storms, machine load — is
    # strictly ADDITIVE, so the median still scattered ±25-40% run-to-run
    # (observed as recurring phantom 1.2-1.4x ratios on unchanged plans
    # across r7-r10), while the min estimates the query's steady-state
    # floor with far lower variance. A genuine regression (plan change,
    # extra shuffle) shifts the whole distribution INCLUDING the min, so
    # the 2x gate loses no sensitivity. BENCH_BASELINE is recorded under
    # the same statistic (tools/record_baseline.py), keeping the
    # comparison same-shape.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

    def run_min(name: str) -> float:
        run_once(name)  # untimed warm-up (discarded)
        return min(run_once(name) for _ in range(n_runs))

    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    if only is not None:
        # Isolated probe: one query, fresh process, no session history.
        canary_samples = [_canary_once(spark, sf_dir) for _ in range(2)]
        t = run_min(only)
        canary_samples += [_canary_once(spark, sf_dir) for _ in range(2)]
        canary = round(sorted(canary_samples)[len(canary_samples) // 2], 3)
        baseline, base_canary = _load_baseline(sf)
        out = {
            "query": only,
            "sec": t,
            "canary_sec": canary,
            "sf": sf,
            "mode": f"isolated probe, min of {n_runs} after untimed warm-up",
        }
        base_t = baseline.get(only)
        if base_t and base_canary:
            norm = max(1.0, canary / base_canary)
            out["baseline_sec"] = base_t
            out["baseline_canary_sec"] = base_canary
            out["load_norm"] = round(norm, 3)
            out["normalized_ratio"] = round(t / (norm * base_t), 3)
        else:
            out["baseline_sec"] = None  # not a baseline query — raw time only
        print(json.dumps(out))
        spark.stop()
        return 0

    canary_samples = [_canary_once(spark, sf_dir) for _ in range(2)]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(HEADLINE):
        try:
            timings[name] = run_min(name)
        except Exception as exc:  # noqa: BLE001 — one red query must not
            # erase the whole round's bench record (BENCH_r04 parsed:null).
            errors[name] = _errmsg(exc)
        if i == len(HEADLINE) // 2:  # mid-run sample: load can shift mid-bench
            canary_samples.append(_canary_once(spark, sf_dir))
    canary_samples += [_canary_once(spark, sf_dir) for _ in range(2)]
    canary = round(sorted(canary_samples)[len(canary_samples) // 2], 3)

    # Per-query regression guard vs the recorded baseline at the same sf,
    # load-normalized by the canary (see module docstring).
    baseline, base_canary = _load_baseline(sf)
    norm = max(1.0, canary / base_canary) if base_canary else 1.0
    regressions: list[str] = []
    for name, base_t in baseline.items():
        t = timings.get(name)
        if t is None or not _is_regression(t, base_t, norm):
            continue
        try:
            timings[name] = t = min(t, run_once(name))  # one retry: drop noise
        except Exception as exc:  # noqa: BLE001
            errors[name] = _errmsg(exc)
        if _is_regression(t, base_t, norm):
            regressions.append(
                f"{name}: {t:.3f}s vs baseline {base_t:.3f}s "
                f"(>{2 * norm:.2f}x with load-normalization {norm:.2f})"
            )

    out = {
        "metric": (
            f"total wall-clock of {len(HEADLINE)} headline queries (noop "
            f"sink), per-query min of {n_runs} in-process runs after an "
            f"untimed warm-up run"
        ),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "canary_sec": canary,
        "sf": sf,
    }
    # Machine-state-independent comparison (VERDICT r7 #1): record the
    # baseline canary, the load-normalization factor, and the normalized
    # per-query/total ratios IN the artifact, so the gate comparison does
    # not depend on the reader re-deriving them from two files.
    if baseline and base_canary:
        covered = [n for n in timings if n in baseline and baseline[n] > 0]
        base_total = sum(baseline[n] for n in covered)
        out["baseline_canary_sec"] = base_canary
        out["load_norm"] = round(norm, 3)
        out["vs_baseline_normalized"] = {
            n: round(timings[n] / (norm * baseline[n]), 2) for n in covered
        }
        if base_total:
            total_now = sum(timings[n] for n in covered)
            out["total_ratio_raw"] = round(total_now / base_total, 3)
            out["total_ratio_normalized"] = round(
                total_now / (norm * base_total), 3
            )
    if errors:
        out["err"] = errors
    print(json.dumps(out))
    for name, msg in errors.items():
        print(f"QUERY-ERR  {name}: {msg}", file=sys.stderr)
    for line in regressions:
        print(f"REGRESSION  {line}", file=sys.stderr)
    spark.stop()
    return 1 if regressions or errors else 0


def _errmsg(exc: Exception) -> str:
    first_line = (str(exc).splitlines() or [""])[0]
    return f"{type(exc).__name__}: {first_line[:200]}"


def _canary_once(spark, sf_dir: str) -> float:
    """One calibration sample: scan lineitem and aggregate two columns.
    The plan (parquet scan -> partial agg -> single-row final agg) is fixed
    for all time — it exercises IO, whole-stage codegen, and task dispatch,
    the same resources machine load steals from the guarded queries."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
        F.sum("l_quantity"), F.avg("l_extendedprice")
    ).collect()
    return time.time() - t0


def _load_baseline(sf: float) -> tuple[dict[str, float], float | None]:
    """(per-query baseline seconds, baseline canary seconds or None).
    Prefers BENCH_BASELINE.json (min-of-N floors, best of >=3 fresh-process
    runs, canary included);
    falls back to the round-1 driver record, which has no canary."""
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in ("BENCH_BASELINE.json", "BENCH_r01.json"):
        try:
            with open(os.path.join(here, fname)) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        data = data.get("parsed", data)  # driver records wrap the JSON line
        if float(data.get("sf", -1)) != sf:
            continue
        # Long-horizon anchor gate (VERDICT r10 #5): a baseline re-record
        # resets the per-round 2x bar, so the recorded artifact carries its
        # own drift ratio against the ORIGINAL v1 baseline's common query
        # subset — and bench REFUSES to compare against a baseline that has
        # silently absorbed >=1.5x cumulative drift.
        anchor = data.get("v1_anchor")
        if anchor and float(anchor.get("ratio", 0.0)) >= 1.5:
            print(
                f"BASELINE-DRIFT: {fname} v1-anchor ratio "
                f"{anchor['ratio']}x >= 1.5x — the baseline has absorbed "
                "cumulative drift; investigate before re-recording",
                file=sys.stderr,
            )
            raise SystemExit(1)
        queries = {k: float(v) for k, v in data.get("queries", {}).items()}
        canary = data.get("canary_sec")
        return queries, (float(canary) if canary else None)
    return {}, None


def _is_regression(t: float, base_t: float, norm: float = 1.0) -> bool:
    return t > 2.0 * norm * base_t and t - base_t > 0.5


if __name__ == "__main__":
    sys.exit(main())
