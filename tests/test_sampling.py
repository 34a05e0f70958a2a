"""Deterministic sampling / split / packing operator properties."""

from __future__ import annotations

from conftest import SF_ORACLE

import pyspark.sql.functions as F

from vector_db_light_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
    train_val_test_split,
)


def test_stratified_sample_partition_independent(spark):
    """The #1 reason for hash sampling over df.sample: the kept set must not
    depend on partitioning."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rates = {"en": 0.25, "de": 0.6}
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", rates, "doc_id", 0.5).collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), "lang", rates, "doc_id", 0.5
        ).collect()
    }
    assert a == b and len(a) > 0


def test_stratified_sample_rates_approximate(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    kept = stratified_sample(
        docs, "lang", {"en": 0.25}, "doc_id", default_rate=1.0
    )
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept_en = kept.filter(F.col("lang") == "en").count()
    # 4-hex-digit uniform: en keep-rate within a loose band of 0.25
    assert 0.1 <= kept_en / totals["en"] <= 0.45
    # non-en strata kept in full (default_rate=1.0)
    assert kept.filter(F.col("lang") != "en").count() == sum(
        n for l, n in totals.items() if l != "en"
    )


def test_split_is_total_disjoint_and_stable(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = train_val_test_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()  # total
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # same doc -> same split on a re-run with different partitioning
    again = {r["doc_id"]: r["split"]
             for r in train_val_test_split(docs.repartition(5), "doc_id").collect()}
    for r in out.collect():
        assert again[r["doc_id"]] == r["split"]


def test_pack_sequences_respects_capacity(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", (F.length("text") / 5).cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences(docs, "n_tokens", capacity=256, key_col="doc_id",
                            num_shards=8).collect()
    bins: dict[tuple, list] = {}
    for r in packed:
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for (shard, bin_id), rows in bins.items():
        total = sum(r["n_tokens"] for r in rows)
        # a bin only exceeds capacity via the single doc that overflows it:
        # the fill before its last doc is < capacity
        last = max(rows, key=lambda r: r["doc_id"])
        assert total - last["n_tokens"] < 256
        # bins are contiguous in key order within a shard
        ids = sorted(r["doc_id"] for r in rows)
        all_ids = sorted(r["doc_id"] for r in packed if r["shard"] == shard)
        lo, hi = all_ids.index(ids[0]), all_ids.index(ids[-1])
        assert all_ids[lo : hi + 1] == ids


def test_temperature_mixture_flattens_and_is_partition_independent(spark):
    """alpha=1/2 mixing: dominant stratum keeps a LOWER rate than the tail,
    total lands near target_fraction, and the kept set is identical under
    repartitioning (content-keyed, no RNG)."""
    from vector_db_light_spark.operators import sampling as SM

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    kept = SM.temperature_mixture(docs, "lang", key_col="doc_id")
    n, k = docs.count(), kept.count()
    assert 0.35 * n < k < 0.65 * n

    before = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    after = {r["lang"]: r["c"] for r in kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    hi = max(before, key=before.get)
    lo = min(before, key=before.get)
    assert after[hi] / before[hi] < after[lo] / before[lo]
    # flatter: dominant/tail ratio shrinks
    assert after[hi] / after[lo] < before[hi] / before[lo]

    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    kept2 = SM.temperature_mixture(docs.repartition(7), "lang", key_col="doc_id")
    assert {r["doc_id"] for r in kept2.select("doc_id").collect()} == ids


def test_pps_systematic_sample_weights_and_determinism(spark):
    """PPS property: the length-weighted sample over-represents long docs
    (kept mean n_chars > corpus mean), lands near k picks, and is
    identical under repartitioning (integer arithmetic + content order)."""
    from vector_db_light_spark.operators.sampling import pps_systematic_sample

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    kept = pps_systematic_sample(docs, "n_chars", 60, "doc_id")
    rows = kept.collect()
    assert 50 <= len(rows) <= 70  # systematic: within a few of k
    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_kept = sum(r["n_chars"] for r in rows) / len(rows)
    assert mean_kept > mean_all

    ids = {r["doc_id"] for r in rows}
    kept2 = pps_systematic_sample(docs.repartition(7), "n_chars", 60, "doc_id")
    assert {r["doc_id"] for r in kept2.collect()} == ids


def test_dsir_bucket_ratios_and_weights(spark):
    """DSIR pieces: add-one smoothing gives every bucket a finite ratio
    (absent buckets included), per-doc weights are occurrence means
    clamped >= 1, and in-domain docs outweigh off-domain ones on a
    planted split."""
    from vector_db_light_spark.operators.sampling import (
        dsir_bucket_ratios,
        dsir_doc_weights,
        dsir_feature_rows,
    )

    src_rows = [
        (1, "alpha beta alpha beta gamma"),
        (2, "delta epsilon zeta delta"),
        (3, "alpha beta gamma alpha beta"),
    ]
    src = spark.createDataFrame(src_rows, "doc_id bigint, text string")
    tgt = spark.createDataFrame(
        [(9, "alpha beta alpha beta alpha beta")], "doc_id bigint, text string"
    )
    sfeat = dsir_feature_rows(src).localCheckpoint()
    ratios = dsir_bucket_ratios(sfeat, dsir_feature_rows(tgt))
    rows = {r["bucket"]: r["r_u6"] for r in ratios.collect()}
    assert len(rows) == 64  # every bucket present, smoothing floor for absent
    assert all(v >= 0 for v in rows.values())
    w = {r["doc_id"]: r["weight_u6"] for r in dsir_doc_weights(sfeat, ratios).collect()}
    # docs 1/3 share the target's alpha-beta bigrams; doc 2 shares nothing
    assert w[1] > w[2] and w[3] > w[2]
    assert all(v >= 1 for v in w.values())

    # single-token doc: no bigrams, unigram features only — no crash
    one = spark.createDataFrame([(5, "alpha")], "doc_id bigint, text string")
    assert dsir_feature_rows(one).count() == 1
