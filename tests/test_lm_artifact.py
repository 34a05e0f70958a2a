"""Persisted n-gram LM artifact (round 12, VERDICT r11 #7): build / score /
incremental maintenance — scoring from the artifact must equal the corpus
path, and the maintained count table must equal a rebuild bit-for-bit in
BOTH directions (counts are a sum monoid: appends merge, deletes subtract
exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_light_spark.api import VectorDatabaseManager
from vector_db_light_spark.operators.dedup import tokens_expr
from vector_db_light_spark.operators.textstats import (
    kn_bigram_counts,
    kn_fluency_scores,
    kn_trigram_counts,
)


def _mgr(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("spark query engine for big data " * 30)
    (src / "b.txt").write_text("analytical database for fast query " * 30)
    (src / "c.txt").write_text("image resize thumbnail pixel decode " * 30)
    mgr = VectorDatabaseManager(spark, str(tmp_path / "dbs"))
    mgr.create_database("lm", str(src), chunk_size=100, chunk_overlap=30)
    return mgr


def _counts(spark, mgr, order):
    df = spark.read.parquet(mgr._lm_table("lm", order))
    return sorted(map(tuple, df.select(sorted(df.columns)).collect()))


def _rebuilt(spark, mgr, order):
    toks = spark.read.parquet(mgr._table("lm", "embeddings")).select(
        "chunk_id", tokens_expr("chunk_text").alias("toks")
    )
    fresh = (
        kn_bigram_counts(toks, id_col="chunk_id")
        if order == 2
        else kn_trigram_counts(toks, id_col="chunk_id")
    )
    return sorted(map(tuple, fresh.select(sorted(fresh.columns)).collect()))


def test_lm_scoring_from_artifact_equals_corpus_path(spark, tmp_path):
    mgr = _mgr(spark, tmp_path)
    mgr.build_lm("lm", order=2)
    served = sorted(
        map(tuple, mgr.score_fluency("lm", order=2).collect())
    )
    variants = spark.read.parquet(mgr._table("lm", "embeddings")).select(
        F.col("chunk_id").alias("doc_id"),
        F.lit("doc").alias("variant"),
        tokens_expr("chunk_text").alias("toks"),
    )
    corpus = sorted(
        (r["doc_id"], r["n_bigrams"], r["fluency_u6"])
        for r in kn_fluency_scores(variants, train_variant="doc").collect()
    )
    assert served == corpus and served


def test_lm_incremental_maintenance_equals_rebuild(spark, tmp_path):
    mgr = _mgr(spark, tmp_path)
    mgr.build_lm("lm", order=2)
    mgr.build_lm("lm", order=3)
    more = tmp_path / "more"
    more.mkdir()
    (more / "d.txt").write_text("streaming watermark stateful window " * 30)
    assert mgr.add_documents("lm", str(more)) == 1
    for order in (2, 3):
        assert _counts(spark, mgr, order) == _rebuilt(spark, mgr, order)
    assert mgr.delete_documents("lm", ["b.txt"]) == 1
    for order in (2, 3):
        got = _counts(spark, mgr, order)
        # subtraction == rebuild: the deleted doc's unique n-grams dropped
        assert got == _rebuilt(spark, mgr, order) and got
    # trigram scoring from the maintained artifact still serves
    assert mgr.score_fluency("lm", order=3).count() > 0


def test_api_tokenizer_artifact(spark, tmp_path):
    """build_tokenizer persists the frozen merge table; tokenize_counts
    serves from it and equals an inline train+apply; the artifact does
    NOT drift on add_documents (pinned-tokenizer contract: new chunks
    tokenize under the old merges)."""
    import json

    from vector_db_light_spark.api import VectorDatabaseManager
    from vector_db_light_spark.operators.textstats import (
        bpe_tokenize_counts,
        bpe_train,
    )
    import pyspark.sql.functions as F

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("the cat sat on the mat " * 30)
    (src / "b.txt").write_text("the cart art and the chart " * 30)
    mgr = VectorDatabaseManager(spark, str(tmp_path / "dbs"))
    mgr.create_database("tk", str(src), chunk_size=80, chunk_overlap=20)
    mgr.build_tokenizer("tk", n_merges=4)
    with open(mgr._table("tk", "tokenizer.json")) as fh:
        side = json.load(fh)
    assert len(side["merges"]) == 4
    frozen = [m["pair"] for m in side["merges"]]

    emb = spark.read.parquet(mgr._table("tk", "embeddings")).select(
        F.col("chunk_id"), F.col("chunk_text").alias("text")
    )
    inline_merges = [
        r["pair"]
        for r in bpe_train(emb, n_merges=4).orderBy("merge_round").collect()
    ]
    assert frozen == inline_merges
    served = sorted(
        map(tuple, mgr.tokenize_counts("tk").collect())
    )
    inline = sorted(
        map(
            tuple,
            bpe_tokenize_counts(emb, frozen, id_col="chunk_id").collect(),
        )
    )
    assert served == inline

    more = tmp_path / "more"
    more.mkdir()
    (more / "c.txt").write_text("completely different words here " * 30)
    mgr.add_documents("tk", str(more))
    with open(mgr._table("tk", "tokenizer.json")) as fh:
        assert [m["pair"] for m in json.load(fh)["merges"]] == frozen
    # new chunks are tokenized under the FROZEN merges
    n_chunks = spark.read.parquet(mgr._table("tk", "embeddings")).count()
    assert mgr.tokenize_counts("tk").count() == n_chunks


def test_api_tokenizer_large_vocab_production_path(spark, tmp_path):
    """r13: past the toy merge counts the api routes through the
    production shape — single-job sampled trainer (== the engine loop,
    property-pinned) and rank-based vocabulary-factored serving (== the
    chained-replace expression) — so the large-vocab artifact serves the
    same counts the toy path would, end to end through the api."""
    import json

    import pyspark.sql.functions as F

    from vector_db_light_spark.api import VectorDatabaseManager
    from vector_db_light_spark.operators.textstats import (
        bpe_tokenize_counts,
        bpe_train,
    )

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("the cat sat on the mat and the hat " * 40)
    (src / "b.txt").write_text("the cart art and the chart start " * 40)
    mgr = VectorDatabaseManager(spark, str(tmp_path / "dbs"))
    mgr.create_database("tk2", str(src), chunk_size=80, chunk_overlap=20)
    mgr.build_tokenizer("tk2", n_merges=20)  # > 8: sampled trainer;
    with open(mgr._table("tk2", "tokenizer.json")) as fh:
        side = json.load(fh)
    frozen = [m["pair"] for m in side["merges"]]
    assert len(frozen) == 20 and side["sample_mod"] is None

    emb = spark.read.parquet(mgr._table("tk2", "embeddings")).select(
        F.col("chunk_id"), F.col("chunk_text").alias("text")
    )
    # sampled trainer == engine loop on the same corpus
    iterative = [
        r["pair"]
        for r in bpe_train(emb.withColumnRenamed("chunk_id", "doc_id"),
                           n_merges=20).orderBy("merge_round").collect()
    ]
    assert frozen == iterative
    # rank-based scalable serving (>16 merges) == expression apply
    served = sorted(map(tuple, mgr.tokenize_counts("tk2").collect()))
    inline = sorted(
        map(
            tuple,
            bpe_tokenize_counts(emb, frozen, id_col="chunk_id").collect(),
        )
    )
    assert served == inline


def test_stream_lm_maintenance_equals_rebuild(spark, tmp_path):
    """r13 streaming LM twin: after draining N micro-batches the on-disk
    count table equals a batch rebuild over the union; a REPLAYED batch
    merges nothing (doc_ids ledger); in-batch duplicate ids count once;
    a torn batch (stale _inflight marker) raises instead of
    double-merging."""
    import pytest

    from vector_db_light_spark.operators.dedup import tokens_expr
    from vector_db_light_spark.operators.textstats import kn_bigram_counts
    from vector_db_light_spark.streaming.serving import stream_lm_maintenance

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cart art and the chart"),
            (3, "a cat and a dog and a bird"),
            (4, "entirely new words arrive here"),
            (5, ""),  # no bigrams — the ledger, not the counts, must remember it
        ],
        "doc_id bigint, text string",
    ).localCheckpoint(eager=True)
    src = tmp_path / "stream"
    src.mkdir()
    lm = str(tmp_path / "lm")

    def drain(tag):
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(
            str(src)
        )
        stream_lm_maintenance(
            stream, lm, str(tmp_path / f"ckpt_{tag}")
        ).awaitTermination(180)

    def snap():
        df = spark.read.parquet(f"{lm}/counts_2gram")
        return sorted(map(tuple, df.select(sorted(df.columns)).collect()))

    def rebuild(frame):
        toks = frame.select("doc_id", tokens_expr("text").alias("toks"))
        fresh = kn_bigram_counts(toks)
        return sorted(
            map(tuple, fresh.select(sorted(fresh.columns)).collect())
        )

    first = docs.filter("doc_id <= 2")
    first.write.mode("append").parquet(str(src))
    drain("a")
    assert snap() == rebuild(first)

    # batch 2 contains doc 3 TWICE (in-batch duplicate) plus docs 4, 5
    rest = docs.filter("doc_id >= 3")
    rest.union(docs.filter("doc_id = 3")).write.mode("append").parquet(
        str(src)
    )
    drain("b")
    assert snap() == rebuild(docs)

    # replay under a fresh checkpoint: ledger admits nothing, counts stay
    first.write.mode("append").parquet(str(src))
    drain("c")
    assert snap() == rebuild(docs)
    # the empty doc is in the ledger even though it produced no counts
    ledger = {
        r["doc_id"] for r in spark.read.parquet(f"{lm}/doc_ids_2gram").collect()
    }
    assert ledger == {1, 2, 3, 4, 5}

    # torn batch: a stale intent marker makes the next delta-bearing
    # batch raise instead of double-merging
    with open(f"{lm}/_inflight_2gram", "w") as fh:
        fh.write("99")
    spark.createDataFrame(
        [(6, "unseen text entirely")], "doc_id bigint, text string"
    ).write.mode("append").parquet(str(src))
    with pytest.raises(Exception, match="torn micro-batch"):
        try:
            drain("d")
        except Exception as ex:  # unwrap StreamingQueryException
            raise RuntimeError(str(ex)) from ex


def test_stream_tokenize_pack_equals_batch(spark, tmp_path):
    """r13 streaming tokenize-pack: after draining id-ordered batches the
    spans table equals the batch pack_spans over all docs' frozen-merge
    token counts; a replayed batch appends nothing; in-batch duplicates
    count once; zero-token docs get a span row (the table is its own
    ledger)."""
    from vector_db_light_spark.operators.packing import pack_spans
    from vector_db_light_spark.operators.textstats import (
        bpe_tokenize_counts_scalable,
        bpe_train_sampled,
    )
    from vector_db_light_spark.streaming.serving import stream_tokenize_pack

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat " * 8),
            (2, "the cart art and the chart " * 6),
            (3, "a dog and a bird and a cow " * 7),
            (4, ""),  # zero tokens — still gets a span row
            (5, "entirely new words arrive here today " * 5),
        ],
        "doc_id bigint, text string",
    ).localCheckpoint(eager=True)
    merges = [
        r["pair"]
        for r in bpe_train_sampled(docs, n_merges=6)
        .orderBy("merge_round")
        .collect()
    ]
    src = tmp_path / "stream"
    src.mkdir()
    pk = str(tmp_path / "pack")

    def drain(tag):
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(
            str(src)
        )
        stream_tokenize_pack(
            stream, pk, str(tmp_path / f"ckpt_{tag}"), merges, budget=32
        ).awaitTermination(180)

    def snap():
        df = spark.read.parquet(f"{pk}/spans")
        return sorted(map(tuple, df.select(sorted(df.columns)).collect()))

    def batch_truth(frame):
        counts = frame.select("doc_id").join(
            bpe_tokenize_counts_scalable(frame, merges).select(
                "doc_id", F.col("n_tokens_after").cast("long").alias("n_tok")
            ),
            "doc_id",
            "left",
        ).select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0).cast("long")).alias("n_tok"),
        )
        out = pack_spans(counts, 32)
        return sorted(map(tuple, out.select(sorted(out.columns)).collect()))

    first = docs.filter("doc_id <= 2")
    first.write.mode("append").parquet(str(src))
    drain("a")
    assert snap() == batch_truth(first)

    rest = docs.filter("doc_id >= 3")
    rest.union(docs.filter("doc_id = 3")).write.mode("append").parquet(
        str(src)
    )  # in-batch duplicate of doc 3
    drain("b")
    assert snap() == batch_truth(docs)
    ids = {r[0] for r in snap()}
    assert 4 in ids  # the zero-token doc holds a span row

    first.write.mode("append").parquet(str(src))  # replay, fresh checkpoint
    drain("c")
    assert snap() == batch_truth(docs)
