"""Custom Python DataSource (S1 extensibility): schema, partitioned
parallel generation, determinism, and that the output feeds the existing
operators (dedup finds the planted duplicates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_light_spark.sources.synthetic import register


def _load(spark, n_docs=2000, n_partitions=16, seed=7):
    register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", n_partitions)
        .option("seed", seed)
        .load()
    )


def test_synthetic_source_shape_and_parallelism(spark):
    df = _load(spark)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 16
    assert df.select("doc_id").distinct().count() == 2000
    langs = {r["lang"] for r in df.select("lang").distinct().collect()}
    assert langs == {"en", "zh", "es", "de", "fr"}
    bad = df.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_synthetic_source_deterministic_and_partition_independent(spark):
    a = {r["doc_id"]: r["text"] for r in _load(spark).collect()}
    b = {r["doc_id"]: r["text"] for r in _load(spark, n_partitions=5).collect()}
    assert a == b  # content depends on (seed, doc_id) alone
    c = {r["doc_id"]: r["text"] for r in _load(spark, seed=8).collect()}
    assert a != c


def test_synthetic_source_feeds_dedup(spark):
    """The planted ~5% exact duplicates are found by the existing exact
    dedup operator — the source is pipeline-compatible, not just a row
    generator."""
    from vector_db_light_spark.operators.dedup import exact_dedup

    df = _load(spark)
    groups = exact_dedup(df)
    n_dup_rows = 2000 - groups.count()  # rows lost to duplicate groups
    assert 0.02 * 2000 < n_dup_rows < 0.10 * 2000


def test_synthetic_duplicates_match_an_existing_doc(spark):
    """ADVICE r6: every planted duplicate's text must equal the text of at
    least one OTHER document (the redirection chain is fully resolved; a
    one-hop copy of a doc that is itself a duplicate matched nothing)."""
    rows = _load(spark).select("doc_id", "text").collect()
    by_text: dict[str, list[int]] = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    # duplicates exist, and no text group is a singleton copy-of-nothing:
    # every doc flagged by the hash branch shares its text with its source
    import hashlib

    lonely = 0
    for r in rows:
        h = hashlib.md5(f"7:{r['doc_id']}".encode()).digest()
        if h[0] < 13 and r["doc_id"] >= 20 and len(by_text[r["text"]]) == 1:
            lonely += 1
    assert lonely == 0
