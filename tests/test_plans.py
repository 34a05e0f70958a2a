"""Physical-plan shape assertions — the properties that keep these operators
viable at 100 TB (SURVEY.md §4): top-k short-circuit, broadcast lookup
joins, filter pushdown, column pruning."""

from __future__ import annotations

from conftest import SF_ORACLE

from vector_db_light_spark.functions.vector import default_query_vector
from vector_db_light_spark.operators.knn import knn, search
from vector_db_light_spark.plans.explain import (
    assert_in_plan,
    assert_not_in_plan,
    explain_string,
)

Q = default_query_vector()


def test_knn_plans_take_ordered_not_global_sort(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = knn(emb, Q, k=6)
    assert_in_plan(df, "TakeOrderedAndProject")


def test_search_lookup_join_is_broadcast(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    df = search(emb, docs, Q, k=6, score_threshold=0.0)
    plan = explain_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan  # k rows must never shuffle the corpus


def test_filter_pushdown_reaches_parquet_scan(spark):
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = explain_string(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = explain_string(df)
    # ReadSchema must carry only the projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_knn_scan_reads_only_needed_columns(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = knn(emb, Q, k=6)
    plan = explain_string(df)
    assert "label" not in plan.split("ReadSchema:")[-1]


def test_ivf_search_prebuilt_centroids_no_corpus_aggregate(spark):
    """The IVF QUERY path must probe the build-time centroid artifact, not
    re-aggregate the corpus (VERDICT r1: centroid groupBy per query is a
    full scan per query at 100 TB). With static pruning the probe runs
    eagerly against the artifact, so the SERVING plan is just a pruned
    scan + top-k: no aggregate, no join, a static IN filter."""
    from vector_db_light_spark.operators.similarity import ivf_centroids, ivf_search

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = ivf_centroids(emb, 64).persist()
    cents.count()  # materialize the build artifact
    try:
        df = ivf_search(emb, Q, nprobe=2, k=10, centroids=cents)
        plan = explain_string(df)
        assert "TakeOrderedAndProject" in plan
        assert "HashAggregate" not in plan  # never re-aggregates the corpus
        assert "label IN (" in plan or "label#" in plan and " IN (" in plan
    finally:
        cents.unpersist()


def test_ivf_static_prune_skips_partitions_on_disk(spark, tmp_path):
    """On a corpus PARTITIONED BY the cluster column, static probing must
    surface as real partition pruning — PartitionFilters carries the IN
    list, so unprobed partitions are never read. (The join-pruned variant
    does NOT get this: Spark's dynamic partition pruning skips limit-
    derived build sides — that's why static is the serving default.)"""
    import pyspark.sql.functions as F

    from vector_db_light_spark.operators.similarity import (
        ivf_centroids,
        ivf_search,
        lsh_bucket_expr,
        random_hyperplanes,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    planes = random_hyperplanes(4, 64)
    path = str(tmp_path / "ivf")
    emb.withColumn("cluster_id", lsh_bucket_expr("embedding", planes)).write.partitionBy(
        "cluster_id"
    ).parquet(path)
    ivf = spark.read.parquet(path)
    cents = ivf_centroids(ivf, 64, cluster_col="cluster_id")
    df = ivf_search(ivf, Q, nprobe=2, k=5, cluster_col="cluster_id", centroids=cents)
    plan = explain_string(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and " IN (" in pf[0], plan


def test_batch_lsh_join_is_broadcast_with_prereduced_window(spark):
    """batch_lsh_topk must keep batch_knn's two load-bearing shapes: the
    query side joins by BROADCAST (never shuffling the corpus for the
    bucket equi-join) and the top-k window pre-reduces below its exchange
    (Partial WindowGroupLimit)."""
    import pyspark.sql.functions as F

    import vector_db_light_spark.registry  # noqa: F401  (full populate first)
    from vector_db_light_spark.operators.similarity import batch_lsh_topk
    from vector_db_light_spark.queries.similarity import PLANES

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df = batch_lsh_topk(emb, queries, PLANES, k=3)
    plan = explain_string(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert sum("WindowGroupLimit" in l for l in tree.splitlines()) == 2, tree


def test_top_supplier_max_is_broadcast_not_global_window(spark):
    """Q15 shape: the global max must come back as a broadcast 1-row
    aggregate; a single-partition global window would serialize the corpus
    through one task."""
    from vector_db_light_spark.registry import QUERIES

    df = QUERIES["top_supplier_revenue"](spark, SF_ORACLE)
    plan = explain_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_connected_components_rounds_are_checkpointed(spark):
    """The label frame feeds two inputs of each round; without lineage
    truncation the plan doubles per round. The returned frame's plan must
    therefore bottom out in checkpointed scans, not the full iterative
    lineage."""
    from vector_db_light_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    labels = connected_components(pairs)
    plan = explain_string(labels)
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_batch_knn_exchange_is_on_prereduced_candidates(spark):
    """batch_knn's shuffle must move a pre-reduced candidate set, never
    |corpus| x |queries| rows (VERDICT r1): Spark's WindowGroupLimit rule
    must fire in Partial mode BELOW the exchange (each input partition keeps
    only its own top-k per query before shuffling) and again in Final mode
    above it. If a refactor breaks the rank-filter shape the rule recognizes
    (row_number + rk <= k), the partial node disappears — this test is the
    tripwire."""
    import pyspark.sql.functions as F

    from vector_db_light_spark.operators.similarity import batch_knn

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df = batch_knn(emb, queries, k=3)
    tree = explain_string(df).split("\n\n")[0]  # the tree section, top-down
    wgl_lines = [i for i, l in enumerate(tree.splitlines()) if "WindowGroupLimit" in l]
    exch_lines = [
        i
        for i, l in enumerate(tree.splitlines())
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(wgl_lines) == 2, f"expected Partial+Final WindowGroupLimit:\n{tree}"
    assert len(exch_lines) == 1, f"expected exactly one shuffle exchange:\n{tree}"
    # top-down text: Final WGL above the exchange, Partial WGL below it
    assert wgl_lines[0] < exch_lines[0] < wgl_lines[1], tree


def test_user_funnel_single_shuffle_no_joins(spark):
    """The funnel's three stage-mins (view -> click -> purchase) are windows
    over the SAME partitioning (user_id), and the final per-user groupBy
    reuses it: exactly ONE hashpartitioning exchange moves the events table,
    and no join appears (the oracle's three LEFT JOINs collapse into one
    shuffle). A refactor that re-keys any window or routes a stage through a
    self-join would re-shuffle a 100 TB events table two extra times."""
    from vector_db_light_spark.registry import QUERIES

    df = QUERIES["user_funnel_stages"](spark, SF_ORACLE)
    plan = explain_string(df, mode="simple")
    lines = plan.splitlines()
    hash_exch = [l for l in lines if "Exchange hashpartitioning" in l]
    assert len(hash_exch) == 1, plan
    assert "user_id" in hash_exch[0], plan
    assert sum("Window [" in l for l in lines) == 3, plan
    assert "Join" not in plan, plan


def test_spread_exchange_is_reused_by_signature_agg(spark):
    """plans/spread.py's core claim: keying the input repartition on doc_id
    means the minhash signature groupBy(doc_id) sits directly on that
    exchange — ONE shuffle total, moved below the expensive shingle+hash
    map work, not an extra one. If a refactor breaks the key match (e.g.
    round-robin repartition), a second hashpartitioning exchange appears
    between the map stage and the aggregate, re-shuffling the corpus."""
    import vector_db_light_spark.operators.dedup as D
    from vector_db_light_spark.queries.dedup import _corpus

    sigs = D.minhash_signatures(_corpus(spark, SF_ORACLE))
    plan = explain_string(sigs, mode="simple")
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert len(exchanges) == 1, plan
    assert "doc_id" in exchanges[0], plan


def test_spread_self_disables_on_parallel_input(spark):
    """At 100 TB the scan arrives as thousands of splits — there spread()
    must be a no-op, not a full-input shuffle bought for parallelism the
    scan already has. It fires only for starved inputs."""
    from vector_db_light_spark.plans.spread import spread

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(max(n, 8), "id")
    assert spread(wide, "id") is wide

    narrow = spark.range(1000).coalesce(1)
    out = spread(narrow, "id")
    assert out is not narrow and out.rdd.getNumPartitions() >= min(n, 2)


def test_pq_adc_topk_is_take_ordered_over_codes_only(spark, tmp_path):
    """ADC serving must rank with TakeOrderedAndProject (no corpus shuffle)
    and, when the codes table is the stored artifact, read ONLY the code
    columns — the 32x-IO claim depends on the vectors never being scanned."""
    from vector_db_light_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    books = S.pq_codebooks(8, 16, 8)
    codes_path = str(tmp_path / "codes")
    S.pq_encode(emb, books).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    lut = S.pq_adc_lut(Q, books)
    df = S.pq_adc_topk(codes, lut, k=10)
    plan = explain_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "embedding" not in plan.split("ReadSchema:")[-1]


def test_batch_pq_adc_uses_window_group_limit(spark):
    """Batch ADC keeps the WindowGroupLimit pre-reduction shape: partial
    top-k per input partition BEFORE the single exchange."""
    from vector_db_light_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    books = S.pq_codebooks(8, 16, 8)
    codes = S.pq_encode(emb, books)
    luts = spark.createDataFrame(
        [(i, S.pq_adc_lut(default_query_vector(seed=7 + i), books))
         for i in range(4)],
        "query_id INT, lut ARRAY<ARRAY<DOUBLE>>",
    )
    df = S.batch_pq_adc_topk(codes, luts, 8, k=5)
    plan = explain_string(df, "simple")
    assert "WindowGroupLimit" in plan
    # partial pre-reduction must sit BELOW the single row shuffle
    assert plan.index("Partial") > plan.index("Exchange hashpartitioning")
    assert plan.count("Exchange hashpartitioning") == 1


def test_join_hints_steer_physical_strategy(spark):
    """§4 optimizer control: the engine's join-strategy levers actually
    move the physical plan — broadcast() forces BroadcastHashJoin on a
    side AQE would shuffle, merge() forces SortMergeJoin where broadcast
    would win, and shuffle_hash() suppresses the sort. These are the
    knobs SCALE.md's posture notes assume are available."""
    import pyspark.sql.functions as F

    from conftest import SF_ORACLE

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    j1 = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    assert "BroadcastHashJoin" in plan(j1)

    j2 = orders.join(
        customer.hint("merge"), orders.o_custkey == customer.c_custkey
    )
    assert "SortMergeJoin" in plan(j2)

    j3 = orders.join(
        customer.hint("shuffle_hash"), orders.o_custkey == customer.c_custkey
    )
    p3 = plan(j3)
    assert "ShuffledHashJoin" in p3 and "SortMergeJoin" not in p3


def test_observation_metrics_piggyback_one_pass(spark):
    """df.observe: pipeline health metrics (rows kept, weight kept) ride
    the SAME job as the real sink — at 100 TB this replaces the separate
    .count() pass every naive pipeline pays for monitoring. The observed
    values must equal what a second pass would report."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from conftest import SF_ORACLE
    from vector_db_light_spark.operators.sampling import temperature_mixture

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    kept = temperature_mixture(docs, "lang", key_col="doc_id")
    obs = Observation("mixture")
    observed = kept.observe(
        obs,
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )
    # ONE action drives both the "sink" (noop-ish collect of a projection)
    # and the metrics
    out_rows = observed.select("doc_id").count()
    got = obs.get
    assert got["n_kept"] == out_rows
    want_chars = kept.agg(F.sum("n_chars")).collect()[0][0]
    assert got["chars_kept"] == want_chars


def test_knn_dot_is_unrolled_codegen_not_interpreted_hof(spark):
    """VERDICT r6 #1: a literal query vector must score via a statically
    unrolled Add/Multiply chain inside whole-stage codegen, NOT the
    interpreted ``aggregate(zip_with(...))`` HigherOrderFunction fold (the
    search_pipeline bench breach). Column-valued query vectors (batch
    serving without a known dim) may still fold."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = knn(emb, Q, k=6)
    plan = explain_string(df)
    assert "zip_with" not in plan and "aggregate(" not in plan
    assert "lambdafunction" not in plan.lower()
    # the statically unrolled left-to-right chain is in the Project
    # (plain Add/Multiply over array indexing => codegen-able; AQE hides
    # the WholeStageCodegen label pre-execution, so pin the expression).
    # The ADVICE-r7 dim guard must be the chain's INITIAL TERM, not a CASE
    # around the whole chain (which un-splits the 64-term branch past the
    # JIT's method limit — measured 4.5x on knn_batch_topk):
    assert "THEN 0.0 END + (cast(embedding" in plan


def test_batch_knn_dot_unrolls_with_known_dim(spark):
    from vector_db_light_spark.operators.similarity import batch_knn

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.limit(3).select(
        emb.vec_id.alias("query_id"), emb.embedding.alias("query_vec")
    )
    plan = explain_string(batch_knn(emb, queries, k=3, dim=64))
    assert "zip_with" not in plan and "aggregate(" not in plan


def test_line_dedup_boilerplate_set_is_broadcast(spark):
    """remove_boilerplate_lines must broadcast the (tiny) boilerplate-line
    set back to the corpus — the big side is never shuffled for the lookup;
    the only exchanges are the line-df aggregate and the per-doc reassembly."""
    from vector_db_light_spark.operators.dedup import remove_boilerplate_lines

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = explain_string(remove_boilerplate_lines(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # VERDICT r7 #3: at 100 TB the boilerplate set can exceed broadcast
    # limits — broadcast_boiler=False must degrade to a shuffle join on
    # line_hash (both sides hash-partitioned) instead of OOMing the driver
    plan2 = explain_string(
        remove_boilerplate_lines(docs, broadcast_boiler=False)
    )
    assert "BroadcastHashJoin" not in plan2
    assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2


def test_fuzzy_self_join_has_no_cartesian_shapes(spark):
    """Both blocking tiers must be equi-joins: the gram join on the gram
    value, the short tier on the replicated length bucket — never a
    cartesian/nested-loop pairing of the corpus with itself."""
    import pyspark.sql.functions as F

    from vector_db_light_spark.operators.fuzzy import fuzzy_self_join

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", F.lower(F.expr("substring(text, 1, 40)")).alias("title")
    )
    plan = explain_string(fuzzy_self_join(docs, "title", "doc_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_filtered_ivf_pushes_both_predicates_to_the_scan(spark):
    """Filtered ANN must PRE-filter: the metadata predicate and the probed
    cluster IN-list both reach the parquet scan of one pass — no
    post-top-k filter (which starves k under selective predicates) and no
    second scan."""
    import pyspark.sql.functions as F

    from vector_db_light_spark.operators.similarity import (
        ivf_centroids,
        ivf_search,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = ivf_centroids(emb, 64).persist()
    cents.count()
    try:
        df = ivf_search(
            emb.filter(F.col("vec_id") % 3 == 0),
            Q,
            nprobe=2,
            k=10,
            centroids=cents,
        )
        plan = explain_string(df)
        scan_part = plan.split("Scan parquet")[-1]
        pushed = [l for l in scan_part.splitlines() if "PushedFilters" in l]
        assert pushed and "In(label" in pushed[0], plan
        # the vec_id predicate sits in the same scan's filter stage (modulo
        # isn't a pushable parquet predicate, but it must be BELOW top-k)
        assert plan.index("vec_id#") < plan.index("TakeOrderedAndProject") or (
            "(vec_id" in scan_part
        )
        assert "TakeOrderedAndProject" in plan
    finally:
        cents.unpersist()


def test_triangle_count_joins_are_equi_not_cartesian(spark):
    """Both wedge joins must be hash/merge equi-joins on node keys; a
    cartesian/nested-loop pairing of the (materialized) oriented edge
    list with itself is the hub-explosion failure the degree orientation
    exists to prevent."""
    from vector_db_light_spark.operators.graph import count_triangles

    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 30) for b in range(a + 1, 30) if (a * b) % 3],
        "u long, v long",
    )
    plan = explain_string(count_triangles(edges, src="u", dst="v"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # post-checkpoint plan: the edge build must NOT re-run per wedge side
    assert plan.count("ExistingRDD") >= 2 or "LocalTableScan" in plan


def test_wand_survivor_scoring_joins_are_broadcast(spark):
    """bm25_wand_topk's exact scorer must see broadcast semi/hash joins
    only (survivors, term sidecar, 1-row stats) and finish with the
    TakeOrderedAndProject top-k — never a sort-merge join or global
    sort."""
    from vector_db_light_spark.operators.text_search import bm25_wand_topk

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    df = bm25_wand_topk(docs, ["spark", "table", "query"], k=10)
    plan = explain_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_triplet_mining_has_no_smj_and_prereduced_windows(spark):
    """triplet_semihard_mining: pick-assembly joins broadcast (the audit
    caught SMJs here — post-window sizes are opaque to the optimizer) and
    every row_number pick is WindowGroupLimit-prereduced."""
    from vector_db_light_spark.operators.similarity import (
        triplet_semihard_mining,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    df = triplet_semihard_mining(emb, 24, dim=64)
    plan = explain_string(df)
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_attribution_window_join_is_hash_not_theta(spark):
    """multi_touch_attribution's purchase->touch range predicate must ride
    a (user, bucket) equi-join — a hash join with the exact predicate as
    residual — never a cartesian/theta join."""
    from vector_db_light_spark.operators.relational import (
        multi_touch_attribution,
    )
    from vector_db_light_spark.registry import load_events

    df = multi_touch_attribution(load_events(spark, SF_ORACLE))
    plan = explain_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_chunks_boundary_scan_has_no_shuffle_before_window(spark):
    """cdc_chunks is ONE embarrassingly-parallel Arrow pass: scan ->
    mapInPandas, no join and ZERO exchanges (boundaries leave the pass
    sorted per doc, so no per-doc window is needed). The SQL cross-check
    variant keeps exactly one exchange (its per-doc chunk-assembly
    window)."""
    from vector_db_light_spark.operators.dedup import cdc_chunks, cdc_chunks_sql

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = explain_string(cdc_chunks(docs))
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    sql_plan = explain_string(cdc_chunks_sql(docs))
    assert "Join" not in sql_plan
    assert sql_plan.count("Arguments: hashpartitioning") == 1


def test_scalable_bpe_apply_plan_independent_of_merge_count(spark):
    """The production-apply claim (r13): the vocabulary-factored
    mapInPandas tokenizer's PLAN carries zero replace() nodes and does
    not grow with the merge table — the chained-replace expression adds
    one node per merge (fine at 8, fatal at 32k)."""
    from vector_db_light_spark.operators.textstats import (
        bpe_tokenize_counts,
        bpe_tokenize_counts_scalable,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id bigint, text string"
    )
    merges_small = ["t h", "c a"]
    merges_big = merges_small + [f"x{i} y{i}" for i in range(300)]

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    p_small = plan(bpe_tokenize_counts_scalable(docs, merges_small))
    p_big = plan(bpe_tokenize_counts_scalable(docs, merges_big))
    assert "replace(" not in p_big
    # merge table lives in a broadcast variable, not the plan: same size
    assert abs(len(p_big) - len(p_small)) < 50
    # the expression apply DOES grow per merge — the contrast the claim
    # rests on
    p_expr = plan(bpe_tokenize_counts(docs, merges_small))
    assert p_expr.count("replace(") >= len(merges_small)


def test_curation_batteries_are_zero_shuffle(spark):
    """The r13 battery docstrings claim map-side single projections —
    pin it: no Exchange anywhere in the optimized physical plan of the
    Gopher, C4, PII, and scrub->filter queries (scrub_filter carries
    n_pii through c4_line_rules' projection — no rejoin; ADVICE r13
    #2)."""
    from vector_db_light_spark.registry import QUERIES

    for name in (
        "gopher_quality_battery",
        "c4_line_filter_battery",
        "pii_scrub_battery",
        "scrub_filter_pipeline",
    ):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the loader's deliberate small-file spread (REPARTITION_BY_NUM)
        # is infrastructure, not battery work — every other Exchange
        # (aggregation/join hashpartitioning) is a broken claim
        battery_exchanges = [
            ln
            for ln in plan.splitlines()
            if "Exchange" in ln and "REPARTITION_BY_NUM" not in ln
        ]
        assert not battery_exchanges, (name, battery_exchanges)
