#!/usr/bin/env python
"""Regenerate COVERAGE.md's 'Full registered-query index' section from
the live registry, so the index can never drift from the code (VERDICT r6
what's-wrong #2). Annotations live in ANNOTATIONS below — edit them here,
never in COVERAGE.md.

Usage:
  python tools/gen_coverage.py           # rewrite the section in place
  python tools/gen_coverage.py --check   # exit 1 if COVERAGE.md is stale
  python tools/gen_coverage.py --window  # print the NEXT rotation window
                                         # (mechanical, VERDICT r11 #10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = "## Full registered-query index (authoritative, auto-generated)"

# One-line notes shown next to a query entry (optional).
ANNOTATIONS: dict[str, str] = {
    "ann_ivf_filtered": "metadata predicate PRE-filtered into the same probed scan (no post-top-k k-starvation)",
    "ann_ivf_kmeans_recall": "trained-IVF recall@5 0.51 vs 0.35 label-IVF",
    "ann_ivfpq_recall": "IVF cluster prune x PQ/ADC stacked, recall@5",
    "ann_lsh_ndcg": "rank-discounted quality, literal discounts, no engine log()",
    "ann_pq_recall": "batch ADC recall@5 vs exact batch kNN",
    "ann_pq_rerank_recall": "ADC top-50 shortlist + exact re-rank, recall ~0.93",
    "ann_pq_trained_recall": "per-subspace fixed-point Lloyd codebooks vs literal: recall@5 0.275 -> 0.425 on corpus queries; oracle replays the training",
    "approx_distinct_users": "HLL++ sketch verified within 10% of hash-checked exact counts (~5-sigma at rsd=0.02)",
    "approx_price_quantiles": "GK percentile sketch verified within 5% of hash-checked exact",
    "bigram_coverage_score": "corpus-bigram fluency proxy, exact-int ratio",
    "bloom_prefilter_decontam": "64Kbit broadcast Bloom vs exact gram join, no-false-negative pinned",
    "bpe_pair_counts": "BPE inner-loop pair frequencies, top-20 merges",
    "bpe_tokenize_counts": "apply learned merges corpus-wide; per-doc token budget",
    "bpe_train_merges": "N-merge iterative BPE trainer, unrolled-CTE oracle (kmeans_lloyd pattern)",
    "bpe_sample_train_merges": "production-shape trainer: md5 half-sample + single-job driver-side Sennrich loop, 16 merges; oracle replays sample + 16 materialized rounds",
    "bpe_tokenize_from_artifact": "tokenize from the FROZEN persisted merge table; oracle retrains — frozen serving == train-then-tokenize",
    "corpus_curation_pipeline": "capstone: dedup -> quality -> substring decontam -> sample in one DAG",
    "covisitation_topk": "session co-occurrence top-k per item; bounded pair fan-out, WindowGroupLimit per anchor",
    "cross_nation_volume": "Q7 shape, exact BIGINT-cents volume",
    "cc_luhn_detection": "ISO 7812 Luhn checksum as an unrolled integer lambda; candidates vs validated cards per doc",
    "classifier_curation_pipeline": "train (7 integer rounds) -> broadcast-score the corpus -> survivor split vs planted truth, one DAG",
    "ccnet_perplexity_buckets": "CCNet LM bucketing: KN-fluency rank terciles head/middle/tail + per-bucket md5 sampling (166/75/23 kept of 500)",
    "c4_line_filter_battery": "C4 line-level cleaning (terminal punct, >=5-word lines, javascript/lorem/brace) with a planted violator per rule",
    "pii_scrub_battery": "PII detect + redact (emails/phones/IPv4), scrubbed bytes md5-pinned on both engines; 0 false positives on clean docs",
    "scrub_filter_pipeline": "PII scrub THEN C4 line filter on the redacted text — the production order, composition hash-pinned (a redacted [email] counts as a word downstream)",
    "ccnet_perplexity_buckets_approx": "tercile cut from a 3/4-md5-sample's exact ranks, assignment = broadcast compare; 96.0% bucket agreement vs exact rank cut, agree flag in-row",
    "curation_gopher_ccnet": "Gopher battery then CCNet buckets on survivors, LM trained post-filter; 500 -> 307 -> 169 kept",
    "cohort_retention_daily": "first-active-day cohorts x day offset; integer day buckets, exact-operand retention division",
    "gopher_quality_battery": "Gopher doc+line rule battery (7 rules incl. r13 bullet/ellipsis line rules), all-integer permille thresholds, planted violator per rule (kept 283 of 500)",
    "cusum_drift_detection": "one-sided CUSUM drift monitor via the prefix-sum closed form, all-BIGINT; planted +200 shift: 22/22 detected, 0/128 FP",
    "customer_order_histogram": "Q13 shape: left join w/ join-side predicate + double aggregation",
    "dedup_clusters_star": "large-star/small-star CC, same recursive-CTE oracle",
    "dedup_lsh_quality": "band recall 0.988 / precision 0.977 vs exact all-pairs Jaccard truth",
    "dedup_containment_pairs": "directional containment, subset detection",
    "dedup_incremental_lsh": "new batch vs indexed corpus, new x existing band join only",
    "dedup_incremental_substring": "batch grams semi-join the persistent corpus gram table",
    "dedup_keep_best": "longest-member canonical pick per dup cluster",
    "dedup_semantic_prune": "SemDeDup cluster-blocked one-hop prune",
    "dedup_substring_spans": "exact-substring duplicate spans, content-defined sampling",
    "disjunctive_revenue": "Q19 shape: OR-of-ANDs through the dim join",
    "dq_constraint_report": "4-constraint DQ suite, FK anti-join",
    "event_transition_matrix": "first-order Markov transitions per user sequence; id-tiebroken lag window",
    "kn_bigram_stats": "Kneser-Ney count tables (bigram/left-total/continuation/fan-out), all exact integers",
    "embed_random_projection": "JL 64->16 Rademacher projection, bit-exact folds",
    "events_resample_hourly": "gap-filled dense hour x type grid, BIGINT cents",
    "events_robust_outliers": "3-MAD rule, median/MAD by exact rank selection",
    "ewma_per_user": "recurrence as bit-identical time-ordered fold",
    "forecast_revenue_q6": "Q6 scan-bound predicate-pushdown shape, BIGINT cents",
    "fuzzy_incremental_pairs": "daily batch vs persisted positional gram/length index (prefix-filtered probes), new x corpus join only; quadratic truth oracle",
    "fuzzy_join_titles": "edit-distance<=2 entity resolution; exact one-sided prefix filter (10x at sf0.1) vs a blocking-free O(n^2) truth oracle",
    "heavy_hitters_cms": "count-min estimates vs exact, bound pinned TRUE",
    "idle_customer_balance": "Q22 shape: scalar AVG + NOT EXISTS anti",
    "audio_fingerprint_neardup": "31-bit energy-delta fingerprint over really-decoded PCM, 11/10/10 band join + r14 per-band df cap, Hamming<=2; 375/375 planted pairs, 0 noise; decode-once lead() pass",
    "video_dhash_neardup": "perceptual video near-dup: demux -> PNG-decode -> 9x8 dHash per frame -> key-set Jaccard; 121/121 re-encoded cuts at Jaccard 1000, 0 noise; r14 titlecard cut + stopword-key mask (9.9x sf1 blowup absorbed)",
    "audio_offset_fingerprint_neardup": "fingerprints at 2 time offsets: 125/125 prepended-intro pairs at Hamming 0 (prefix tier finds none); silence-prefix degeneracy measured; r14 decode-once lead() rewrite halved both scales",
    "audio_offset_incremental": "batch twin of streaming audio admission: (audio, offset) band index, new x existing only; 63x3 variants rejected (prepended only via offset-16), 62 novels admitted",
    "llm_corpus_pipeline": "r14 capstone: PII scrub -> C4 -> Gopher -> exact+near dedup -> decontam -> CCNet-approx buckets -> temperature mixing -> frozen-BPE tokenize -> 512-token bins; 622 rows -> 78 kept / 9 bins, every stage drops a planted class; oracle replays all ten stages",
    "video_frameset_neardup": "video near-dup by really-demuxed shared frames: exact integer Jaccard, candidates from the frame-hash join; 275 planted pairs, 0 noise; r14 constant titlecard cut masked by the stopword-frame cap",
    "image_dhash_incremental": "perceptual admission: batch bands semi-join the index (new x existing only), mask-aware-quadratic-truth-pinned; 126 dups rejected, 62 novels + 63 featureless solids admitted (r14 stopword-band policy)",
    "image_dhash_neardup": "dHash over really-decoded 9x8 thumbnails, 4x16-bit band join, exact Hamming<=3 verify; 375/375 planted pairs, 0 noise; r14 solid class + per-band df cap (78.3M -> 101k sf1 candidates)",
    "incremental_agg_state": "two-batch monoid merge hash-matches the single-pass answer",
    "ingest_parse_documents": "DuckDB rebuilds the materialized ingest dir arithmetically",
    "kmeans_lloyd": "2-round Lloyd's, fixed-point centroids, exact inertia",
    "knn_ivfpq_residual_topk": "residual IVFPQ: per-probe LUTs, codes-only scan",
    "knn_pq_adc_topk": "PQ encode + ADC top-k, codes-only scan",
    "knn_pq_filtered_topk": "metadata predicate filters the codes scan BEFORE ADC ranking (ann_ivf_filtered strategy on the PQ artifact)",
    "large_volume_orders": "Q18 shape: HAVING pre-aggregate joined back",
    "line_dedup_boilerplate": "CCNet/RefinedWeb line-level boilerplate removal; also stage 0 of corpus_curation_pipeline",
    "line_dedup_incremental": "batch cleaned against CUMULATIVE line-df state (monoid merge); per-batch counts would admit the headers",
    "lonely_late_suppliers": "Q21 shape, de-correlated EXISTS/NOT EXISTS",
    "lpa_communities": "deterministic sync LPA (mode-of-neighbors, smallest-label ties); dense regions stay separate where CC floods",
    "multimodal_audio_features": "REAL stdlib WAV PCM decode -> exact integer windowed energy; oracle recomputes every sample",
    "multimodal_frame_sample": "video->frames fan-out via REAL ISO BMFF demux (stts/stsc/stsz/stco); codec payloads stay opaque",
    "multimodal_frame_dedup": "cross-video exact frame dedup over really demuxed samples; shuffle carries (hash, doc_id) only",
    "multimodal_audio_loudest_window": "per-doc peak-energy window over really decoded PCM, deterministic tie-break",
    "multimodal_incremental_frame_dedup": "batch twin of streaming media curation: new x existing frame-key join only, overlap-vs-any-single-doc admission",
    "tokenize_pack_pipeline": "two-artifact capstone on a 64-MERGE vocabulary (r13): sampled trainer -> frozen merges -> rank-based mapInPandas apply -> 512-token bins; oracle retrains (64 materialized rounds) + vocab-factored apply",
    "triangle_count_parts": "degree-oriented triangle counting (Schank/Wagner) on the co-purchase graph; hub-safe wedge join",
    "kcore_peel_trajectory": "iterative 3-core peel, per-round checkpoint, all-integer trajectory vs MATERIALIZED unrolled-CTE oracle",
    "butterfly_supplier_pairs": "bipartite 2x2-biclique counting, wedges pivoted on the low-degree side",
    "butterfly_sampled_quality": "deterministic hash-sampled butterfly estimator vs exact count (14% rel err at 1/4 sample on fixture)",
    "triangle_delta_incremental": "incremental triangle maintenance anchored on new edges (|delta| x degree work); oracle filters the full enumeration",
    "graph_cohesion_summary": "one-row nodes/edges/wedges/triangles profile; integer columns, coefficient reader-side",
    "media_curation_pipeline": "multimodal capstone: real-decode floors -> frame dedup -> per-type survivor stats in one DAG",
    "collocations_pmi": "log-free PMI collocation ranking via exact integer micro-unit score (monotone in PMI)",
    "multimodal_resize": "REAL stdlib PNG + baseline-JPEG decode + integer nearest resize; oracle recomputes every output pixel",
    "null_safe_join_counts": "<=> vs IS NOT DISTINCT FROM",
    "pagerank_directed_dangling": "directed c->s graph, per-round dangling-mass D div N redistribution, mass-conservation pinned",
    "pagerank_suppliers": "2-round integer-exact PageRank, top-20 suppliers",
    "pagerank_weighted_suppliers": "rank splits (rank*w) div W_out by distinct-order edge weights; 3:1 hand split pinned",
    "pack_training_sequences": "concat-and-chunk 256-token bins; scalable two-level prefix sum == the oracle's global-order cumsum",
    "perceptron_quality_train": "all-integer batch perceptron learns a planted stopword-density rule to ZERO errors in 7 rounds; whole training curve hash-exact",
    "phrase_search_positions": "positional-index chain join == direct position scan; work bounded by posting lists",
    "proximity_search_near": "NEAR/slop either-order proximity over the positional index; per-doc |pa|x|pb| fan-out",
    "priority_top_orders_csv": "ordered string_agg vs array_join(array_sort(collect_list))",
    "q17_small_quantity_revenue": "TPC-H Q17: correlated scalar avg per part, exact BIGINT cents",
    "q20_excess_suppliers": "TPC-H Q20: nested semi-join chain, pre-aggregated HAVING",
    "q4_priority_count": "TPC-H Q4: EXISTS decorrelation + outer date-window pushdown",
    "bm25_wand_topk": "WAND/max-score pruned BM25: oracle fully scores, Spark scores only θ-survivors — hash match proves the prune lossless",
    "kn_fluency_score": "integer micro-unit KN bigram fluency vs a planted OOV-corrupted twin; pooled-median threshold separates the classes 100%/0% at sf0.01",
    "triplet_semihard_mining": "contrastive-training triplets: nearest positive, hardest negative, FaceNet semi-hard band; bit-exact dots, sentineled empty band",
    "dedup_cdc_chunks": "content-defined chunking (storage-tier dedup): prefix-trimmed near copies re-sync at the next boundary (ratio ~0.69) while exact copies dedup 1.0",
    "key_skew_diagnostics": "pre-shuffle skew profile per fact-table key: top-1/top-10 shares + all-BIGINT Gini — the salting decision input",
    "attribution_multi_touch": "linear + U-shaped multi-touch conversion credit, exact integer accounting (Σ = 1e6 per purchase); bucketed window join vs the oracle's theta-join truth",
    "ann_matryoshka_recall": "recall@5 of Matryoshka prefix-cosine (dims 32/16/8 of 64, truncate+renormalize) vs full-dim truth — the how-short-can-the-first-stage-be measurement",
    "ann_hamming_recall": "recall@5 of the 1-bit sign-sketch shortlist at 10/25/50: 0.50/0.63/0.77 — exact-scoring 10% of the corpus after an integer-only coarse pass",
    "knn_hamming_topk": "two-stage 1-bit ANN: Hamming xor+popcount coarse top-50 (16-byte sketch column), exact cosine rerank",
    "rag_chunk_banners": "REAL rag.format_chunks incl. F9 blank-line collapse",
    "rag_citations_html": "REAL rag.format_citations: %.3f score spans + page ranges",
    "rag_prompt_assembly": "REAL rag.assemble_rag_prompt in a grouped Pandas stage, byte-identical prompt",
    "rank_functions_per_segment": "rank/dense_rank/percent_rank/cume_dist family",
    "returned_item_customers": "Q10 shape, top-20 on rounded revenue",
    "revenue_by_supplier_nation_year": "Q9-adapted join web, exact cents",
    "sample_mixture_temperature": "data-driven temperature mixing, integer-exact rates",
    "sample_weighted_pps": "integer PPS systematic sampling, two-level cumsum",
    "search_mmr_diversify": "MMR greedy diversity re-rank, chained-CTE oracle",
    "search_prf_expansion": "two-pass PRF expansion, float-free term pick",
    "search_rerank": "two-stage retrieve->cross-rerank, candidates-only mapInPandas",
    "scd2_customer_history": "type-2 dimension merge (survive/close/open via one full-outer join); integer versions, chained-merge test",
    "set_ops_all_labeled": "INTERSECT/EXCEPT ALL multiplicities",
    "table_profile_orders": "per-column null/distinct/min-max profiling, numeric-encoded extremes",
    "table_snapshot_diff": "CDC diff via full-outer hash compare",
    "union_schema_evolution": "unionByName(allowMissingColumns) vs UNION ALL BY NAME",
    "urgent_lines_by_flag": "Q12 shape: conditional counts over fact-fact join",
    "zorder_layout_ranges": "Morton-key layout, per-file 2-D range stats",
}


def _ever_driver_checked() -> set[str]:
    """Query names with at least one recorded external-driver pass across
    all committed CORRECTNESS_r*.json rounds (VERDICT r7 #8)."""
    import glob
    import json

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rec.items():
            # a pass needs the value hash too when one was recorded —
            # rows_match alone with hash_match=False is a dtype-level FAIL
            # (review r8), not an earned external pass
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match") is not False
            ):
                seen.add(name)
    return seen


# The CORRECTNESS ledger snapshot the committed PRIORITY was derived
# from: the driver lands CORRECTNESS_r{N}.json AFTER the round's last
# commit, so the derivation (and its pytest invariant) must be pinned to
# the rounds that existed at derivation time — bump when re-deriving.
WINDOW_DERIVED_AT = 14


def _last_pass_round(max_round: int | None = None) -> dict[str, int]:
    """name -> LATEST round with a recorded external-driver pass, over
    rounds <= ``max_round`` (None = all).

    Same pass rule as :func:`_ever_driver_checked`; used by --window to
    order the regression-guard slots oldest-external-pass-first."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rec.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match") is not False
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


# Longitudinal anchors: always-in-window rows that give the driver ledger
# round-over-round continuity (the flagship retrieval DAG and the heaviest
# capstone). Everything else in the window is derived mechanically.
WINDOW_ANCHORS: tuple[str, ...] = ("search_pipeline", "media_curation_pipeline")
WINDOW_SIZE = 50

# Queries whose OUTPUT changed this round (schema or semantics) without
# being newcomers — they re-enter the window right after the newcomers
# (their last-pass round no longer certifies the current code). Update
# per round; the derivation handles everything else mechanically.
CHANGED_THIS_ROUND: tuple[str, ...] = (
    # r15: gram-df cap on the near-dedup + decontam stages (rule 13,
    # VERDICT r14 watch #1) — funnel output changed (contaminated 88->33,
    # kept 78->102)
    "llm_corpus_pipeline",
    # r15: oracle now MODELS the frame-df cap (ADVICE r14 #1 — hash
    # unchanged on this fixture, but the certified semantics moved);
    # media_curation_pipeline is an anchor, listed here for the ledger
    "media_curation_pipeline",
)


def next_window(size: int = WINDOW_SIZE) -> list[str]:
    """Derive the next driver window mechanically (VERDICT r11 #10).

    Priority order, with external coverage complete (208/208 as of r11),
    the window's only remaining job is regression guarding:
      1. anchors (longitudinal continuity),
      2. NEWCOMERS — registered queries with no external pass in any
         CORRECTNESS_r*.json (new operators land here automatically),
      3. CHANGED_THIS_ROUND — existing queries whose output changed,
      4. the rest, LONGEST-UNREFRESHED first (ascending last-pass round,
         name as the deterministic tie-break).
    Only oracle-backed queries are eligible: a rows-only slot spends an
    external check on a weaker signal than driver_sim already gives.
    """
    from vector_db_light_spark.registry import ORACLES, QUERIES

    latest = _last_pass_round(WINDOW_DERIVED_AT)
    eligible = [n for n in QUERIES if n in ORACLES]
    newcomers = sorted(n for n in eligible if n not in latest)
    changed = [
        n
        for n in CHANGED_THIS_ROUND
        if n in eligible and n in latest and n not in WINDOW_ANCHORS
    ]
    rest = sorted(
        (
            n
            for n in eligible
            if n in latest and n not in WINDOW_ANCHORS and n not in changed
        ),
        key=lambda n: (latest[n], n),
    )
    window = [a for a in WINDOW_ANCHORS if a in QUERIES]
    for name in newcomers + changed + rest:
        if len(window) >= size:
            break
        if name not in window:
            window.append(name)
    return window


def main_window() -> int:
    from vector_db_light_spark.registry import PRIORITY

    latest = _last_pass_round(WINDOW_DERIVED_AT)
    window = next_window()
    print("# Mechanical next-window derivation (oldest-external-pass-first)")
    print("# paste into registry.PRIORITY; anchors first, then newcomers,")
    print("# then longest-unrefreshed:")
    print("PRIORITY: tuple[str, ...] = (")
    for name in window:
        if name in WINDOW_ANCHORS:
            tag = "anchor"
        elif name not in latest:
            tag = "NEWCOMER"
        elif name in CHANGED_THIS_ROUND:
            tag = f"CHANGED this round (last pass r{latest[name]})"
        else:
            tag = f"last pass r{latest[name]}"
        print(f'    "{name}",  # {tag}')
    print(")")
    current = list(PRIORITY)
    if current == window:
        print("# registry.PRIORITY already matches this derivation")
    else:
        drop = [n for n in current if n not in window]
        add = [n for n in window if n not in current]
        print(f"# differs from current PRIORITY: -{len(drop)} +{len(add)}")
    return 0


def render() -> str:
    from vector_db_light_spark.registry import ORACLES, PRIORITY, QUERIES

    window = set(PRIORITY)
    n_oracle = sum(1 for n in QUERIES if n in ORACLES)
    n_rows_only = len(QUERIES) - n_oracle
    out = [HEADER, ""]
    out.append(
        f"{len(QUERIES)} queries; {n_oracle} hash-checked against DuckDB "
        f"oracles"
        + (f", {n_rows_only} rows-only" if n_rows_only else " (zero rows-only)")
        + "."
    )
    out.append(
        "First 50 in registration order form the driver-checked window "
        "(registry.PRIORITY)."
    )
    ever = _ever_driver_checked() & set(QUERIES)
    pending = window - ever  # rotated in this round, external pass pending
    never = set(QUERIES) - ever - window
    out.append(
        f"External-driver rotation status (VERDICT r7 #8): {len(ever)} of "
        f"{len(QUERIES)} registered families have >=1 recorded external "
        f"pass across CORRECTNESS_r*.json; the current window adds "
        f"{len(pending)} first-timers this round; {len(never)} remain "
        f"driver_sim-only pending future rotations."
    )
    if never:
        # VERDICT r8 #9: name the tail, don't just count it, so rotation
        # progress is reviewable per round.
        out.append(
            "Never externally checked (driver_sim-only, next rotation "
            "candidates): "
            + ", ".join(f"`{n}`" for n in sorted(never))
            + "."
        )
    out.append("")
    for name in sorted(QUERIES):
        kind = "oracle" if name in ORACLES else "rows-only"
        tags = kind + (", window" if name in window else "")
        note = ANNOTATIONS.get(name)
        suffix = f" \u2014 {note}" if note else ""
        out.append(f"- `{name}` ({tags}{suffix})")
    out.append("")
    return "\n".join(out)


def _regenerate() -> tuple[str, str, str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "COVERAGE.md")
    with open(path) as f:
        current = f.read()
    head, sep, _ = current.partition(HEADER)
    if not sep:
        raise RuntimeError(f"gen_coverage: header not found in {path}")
    return path, current, head + render()


def _strip_rotation_lines(text: str) -> str:
    """Drop the lines derived from CORRECTNESS_r*.json (rotation status +
    never-checked tail); everything left derives from the registry/code."""
    return "\n".join(
        ln
        for ln in text.splitlines()
        if not ln.startswith("External-driver rotation status")
        and not ln.startswith("Never externally checked")
    )


def main_check() -> int:
    """Exit-style check (also called by tools/driver_sim.py).

    Self-heals ONLY the CORRECTNESS-derived rotation lines (VERDICT r8 #7 +
    ADVICE r9 #2): a new round's CORRECTNESS file landing after the last
    regeneration rewrites COVERAGE.md in place and stays green. Any OTHER
    divergence (query added/removed, annotation or window changed without
    regenerating) means the COMMITTED doc is wrong — that still fails, so
    a stale commit is caught instead of silently papered over."""
    path, current, regenerated = _regenerate()
    if _strip_rotation_lines(regenerated) != _strip_rotation_lines(current):
        print(
            "FAIL  gen_coverage: COVERAGE.md query index is STALE beyond "
            "the rotation-status lines (registry/annotation content "
            "changed) — run `python tools/gen_coverage.py` and commit",
            file=sys.stderr,
        )
        return 1
    if regenerated != current:
        try:
            with open(path, "w") as f:
                f.write(regenerated)
        except OSError:
            print(
                "FAIL  gen_coverage: COVERAGE.md query index is STALE and "
                "could not be rewritten (run python tools/gen_coverage.py)",
                file=sys.stderr,
            )
            return 1
        print(
            "gen_coverage: COVERAGE.md index refreshed in place "
            "(rotation status re-derived from CORRECTNESS_r*.json)"
        )
        return 0
    print("gen_coverage: COVERAGE.md index is current")
    return 0


def main() -> int:
    if "--window" in sys.argv:
        return main_window()
    if "--check" in sys.argv:
        return main_check()
    path, _, regenerated = _regenerate()
    with open(path, "w") as f:
        f.write(regenerated)
    print(f"gen_coverage: wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
