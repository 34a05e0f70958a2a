"""Repetition-metric properties with hand-computed expectations."""

from __future__ import annotations

import pytest

from vector_db_light_spark.operators.textstats import repetition_metrics


def _row(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return repetition_metrics(df).collect()[0]


def test_alternating_bigram_dominates(spark):
    # tokens [a b a b a b]: "a b" occurs 3x, 2 chars -> top2 covers 6/6 chars
    r = _row(spark, "a b a b a b")
    assert r["n_tokens"] == 6
    assert r["unique_token_ratio"] == pytest.approx(2 / 6)
    assert r["top2_char_frac"] == pytest.approx(1.0)
    # every 5-gram is unique -> no duplicated-5-gram coverage
    assert r["dup5_char_frac"] == 0.0


def test_dup5_counts_overlapping_coverage_once(spark):
    # tokens [x y z x y z x y z w]: "x y z x y" at pos 1,4 and
    # "y z x y z" at pos 2,5 -> covered positions 1..9 of 10 -> 0.9
    r = _row(spark, "x y z x y z x y z w")
    assert r["dup5_char_frac"] == pytest.approx(0.9)


def test_short_doc_no_grams(spark):
    r = _row(spark, "lonely")
    assert r["n_tokens"] == 1
    assert r["unique_token_ratio"] == 1.0
    assert r["top2_char_frac"] == 0.0
    assert r["dup5_char_frac"] == 0.0


def test_full_self_repeat_covers_everything(spark):
    base = "one two three four five six"
    r = _row(spark, base + " " + base)
    # every 5-gram inside each copy occurs twice; coverage spans all tokens
    assert r["dup5_char_frac"] == pytest.approx(1.0)
    assert r["unique_token_ratio"] == pytest.approx(0.5)


def test_bigram_coverage_survives_empty_token_docs(spark, tmp_path):
    """ADVICE r6: a whitespace-only (or one-token) doc must produce no row,
    not crash the whole query with INVALID_PARAMETER_VALUE.LENGTH from
    F.slice(toks, 1, size-1)."""
    from vector_db_light_spark.registry import QUERIES

    docs = spark.createDataFrame(
        [(1, "common words common words here"), (2, "   "), (3, "solo"),
         (4, "common words again")],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["bigram_coverage_score"](spark, str(tmp_path)).collect()
    ids = [r["doc_id"] for r in out]
    assert 2 not in ids and 3 not in ids
    assert 1 in ids and 4 in ids


def test_remove_boilerplate_lines_edges(spark):
    """All-boilerplate docs come back empty; kept lines preserve original
    (unstripped) bytes and position order; normalization matches str.strip."""
    from vector_db_light_spark.operators.dedup import remove_boilerplate_lines

    header = "=== header ==="
    rows = [(i, f"{header}\nbody {i}\n  {header}  ") for i in range(8)]
    rows.append((99, header))  # only-boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, max_doc_freq=5).collect()
    }
    assert out[99]["text"] == "" and out[99]["n_lines_kept"] == 0
    assert out[0]["text"] == "body 0"  # both header variants stripped-equal
    assert out[0]["n_lines_total"] == 3 and out[0]["n_lines_kept"] == 1
    assert len(out) == 9


def test_remove_boilerplate_keeps_rare_lines_in_order(spark):
    from vector_db_light_spark.operators.dedup import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [(1, "z last\na first\nm mid")], "doc_id bigint, text string"
    )
    out = remove_boilerplate_lines(docs, max_doc_freq=5).collect()[0]
    assert out["text"] == "z last\na first\nm mid"  # position, not sort order


def test_bpe_train_greedy_overlap_and_ties(spark):
    """'aaa' with merge (a,a) must become [aa, a] (greedy left-to-right,
    non-overlapping), and argmax ties break lexicographically."""
    from vector_db_light_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaa aaa bb bb bb")], "doc_id bigint, text string"
    )
    out = bpe_train(docs, n_merges=2).collect()
    # round 1: pairs = (a,a)x2x... 'aaa' gives (a a)x2 per word x2 words = 4
    # vs (b b)x1x3 = 3 -> merge 'a a' first
    assert out[0]["pair"] == "a a" and out[0]["cnt"] == 4
    # after merging, 'aaa' -> 'aa a' (greedy): pairs now (aa,a)x2=2, (b,b)x3=3
    assert out[1]["pair"] == "b b" and out[1]["cnt"] == 3


def test_bpe_train_exhausts_gracefully(spark):
    from vector_db_light_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
    assert bpe_train(docs, n_merges=5).count() == 0  # no pairs at all


def test_bpe_merge_is_positional_not_substring(spark):
    """ADVICE r7 (high): a merge must only join a full adjacent symbol
    pair. With symbols [c, at, h, e], merging (t, h) must be a no-op —
    the bare space-joined replace('t h' -> 'th') falsely produced
    [c, ath, e] by matching the suffix of the multi-char symbol 'at'."""
    from vector_db_light_spark.operators.textstats import bpe_apply_merge

    sym = spark.createDataFrame(
        [(1, "\tc\n\tat\n\th\n\te\n")], "n bigint, s string"
    )
    out = bpe_apply_merge(sym, "t h").collect()[0]["s"]
    assert out == "\tc\n\tat\n\th\n\te\n"
    # and the true adjacent pair does merge:
    out2 = bpe_apply_merge(sym, "at h").collect()[0]["s"]
    assert out2 == "\tc\n\tath\n\te\n"


def test_bpe_multichar_suffix_overlap_end_to_end(spark):
    """End-to-end version of the boundary case (ADVICE r7): corpus where
    round 3 picks merge (ca, t) while the symbol sequence [ca, th] exists —
    substring replace would have collapsed 'cath' to ONE token."""
    from vector_db_light_spark.operators.textstats import (
        bpe_tokenize_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "th th th cat cat cath")], "doc_id bigint, text string"
    )
    merges = bpe_train(docs, n_merges=3).orderBy("merge_round").collect()
    assert [(m["pair"], m["cnt"]) for m in merges] == [
        ("t h", 4), ("c a", 3), ("ca t", 2)
    ]
    out = bpe_tokenize_counts(docs, [m["pair"] for m in merges]).collect()[0]
    # th->[th] x3 (3) + cat->[cat] x2 (2) + cath->[ca, th] (2) = 7;
    # the substring-replace bug gave 6 (cath -> [cath]).
    assert out["n_symbols_before"] == 16 and out["n_tokens_after"] == 7


def test_bpe_checkpoint_bounds_replace_chain_depth(spark):
    """VERDICT r7 #2: re-localCheckpoint every K merges so a 30k-merge run
    never carries an unbounded replace chain; the merge table must be
    invariant to K (checkpointing is a pure plan cut)."""
    from vector_db_light_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog then there other")],
        "doc_id bigint, text string",
    )
    state: dict = {}
    out = bpe_train(docs, n_merges=7, checkpoint_every=3, debug_state=state)
    plan = state["sym"]._jdf.queryExecution().optimizedPlan().toString()
    # checkpoints after merges 3 and 6 -> only merge 7's replace remains
    assert plan.count("replace(") <= 3
    ref = bpe_train(docs, n_merges=7, checkpoint_every=10_000)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def _seq_apply_local(word, merges):
    """Reference apply: the chained-replace expression's semantics in
    pure Python (wrapped representation, left-to-right non-overlapping
    replace per merge IN TRAINING ORDER) — what bpe_tokenize_counts
    compiles to, replayed locally for the rank-apply property."""
    s = "\t" + "\n\t".join(word) + "\n"
    for p in merges:
        left, right = p.split(" ")
        s = s.replace(
            "\t" + left + "\n\t" + right + "\n", "\t" + left + right + "\n"
        )
    return s[1:-1].split("\n\t")


def test_bpe_train_sampled_full_equals_iterative(spark):
    """VERDICT r12 #1 property pin: the production-shape trainer (one
    vocabulary collect + driver-side Sennrich loop) on the FULL corpus is
    bit-identical to the one-job-per-merge engine loop — rounds, pairs,
    and counts."""
    from vector_db_light_spark.operators.textstats import (
        bpe_train,
        bpe_train_sampled,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the jay pig fox zebra and my wolves quack"),
        ],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, bpe_train(docs, n_merges=8).collect()))
    b = sorted(map(tuple, bpe_train_sampled(docs, n_merges=8).collect()))
    assert a == b and len(a) == 8


def test_bpe_train_sampled_cut_is_the_md5_residue(spark):
    """The sample predicate is the portable md5 cut: training on
    sample_mod=2,keep=1 equals training the engine loop on the manually
    md5-filtered docs."""
    import pyspark.sql.functions as F

    from vector_db_light_spark.operators.textstats import (
        bpe_train,
        bpe_train_sampled,
    )

    docs = spark.createDataFrame(
        [(i, t * 3) for i, t in enumerate(
            ["cat hat mat ", "dog log fog ", "sun fun run ", "red bed fed "]
        )],
        "doc_id bigint, text string",
    )
    res = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10)"
        " as bigint)"
    )
    manual = docs.filter(res % 2 < 1)
    assert 0 < manual.count() < docs.count()  # the cut actually samples
    a = sorted(map(tuple, bpe_train(manual, n_merges=5).collect()))
    b = sorted(
        map(
            tuple,
            bpe_train_sampled(
                docs, n_merges=5, sample_mod=2, sample_keep=1
            ).collect(),
        )
    )
    assert a == b


def test_bpe_scalable_apply_equals_expression(spark):
    """The rank-based vocabulary-factored mapInPandas apply returns the
    same per-doc counts as the chained-replace expression apply on a
    trained merge table — including the multi-char suffix boundary
    corpus (ADVICE r7) where substring semantics would diverge."""
    from vector_db_light_spark.operators.textstats import (
        bpe_tokenize_counts,
        bpe_tokenize_counts_scalable,
        bpe_train_sampled,
    )

    docs = spark.createDataFrame(
        [
            (1, "th th th cat cat cath"),
            (2, "the theme then therefore thesis there"),
            (3, "cat cart chart art and a cathode"),
        ],
        "doc_id bigint, text string",
    )
    merges = [
        r["pair"]
        for r in bpe_train_sampled(docs, n_merges=20)
        .orderBy("merge_round")
        .collect()
    ]
    assert len(merges) >= 15
    a = sorted(map(tuple, bpe_tokenize_counts(docs, merges).collect()))
    b = sorted(
        map(tuple, bpe_tokenize_counts_scalable(docs, merges).collect())
    )
    assert a == b


def test_bpe_rank_apply_equals_sequential_property():
    """Pure-local property over random corpora: on a TRAINED merge table
    the rank-based serving apply (bpe_apply_word) equals applying the
    merges one at a time in training order (the expression semantics) —
    the dependency-order argument in the docstring, exercised across
    many random vocabularies."""
    import random

    from vector_db_light_spark.operators.textstats import (
        bpe_apply_word,
        bpe_train_local,
    )

    rng = random.Random(13)
    for trial in range(60):
        alpha = "abcd"[: rng.randint(2, 4)]
        vocab = {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9))):
                rng.randint(1, 9)
            for _ in range(rng.randint(2, 12))
        }
        merges = [
            p for _, p, _ in bpe_train_local(vocab, rng.randint(1, 15))
        ]
        ranks = {tuple(p.split(" ")): i for i, p in enumerate(merges)}
        for w in vocab:
            assert bpe_apply_word(w, ranks) == _seq_apply_local(w, merges), (
                trial, w, merges
            )


def test_incremental_line_df_merge_is_cumulative(spark):
    """A line under the threshold in each batch alone must still be dropped
    when the MERGED state crosses it — the incrementality contract."""
    from vector_db_light_spark.operators.dedup import (
        line_doc_freq,
        merge_line_doc_freq,
        remove_boilerplate_lines,
    )

    hdr = "shared header"
    b1 = spark.createDataFrame(
        [(i, f"{hdr}\nbody one {i}") for i in range(4)],
        "doc_id bigint, text string",
    )
    b2 = spark.createDataFrame(
        [(10 + i, f"{hdr}\nbody two {i}") for i in range(4)],
        "doc_id bigint, text string",
    )
    cum = merge_line_doc_freq(line_doc_freq(b1), line_doc_freq(b2))
    # per-batch df = 4 <= 5 (kept); cumulative = 8 > 5 (dropped)
    own = {r["doc_id"]: r for r in remove_boilerplate_lines(b2, 5).collect()}
    inc = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(b2, 5, line_df=cum).collect()
    }
    assert own[10]["n_lines_kept"] == 2  # batch-local counts admit the header
    assert inc[10]["n_lines_kept"] == 1 and inc[10]["text"] == "body two 0"


def test_two_level_prefix_sum_equals_window_and_is_partition_independent(spark):
    """operators/packing.py: the scalable two-level prefix sum must equal
    the naive global-order cumsum exactly, under any partitioning and any
    chunk size (including chunk=1 and chunk >> N degenerate shapes)."""
    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.packing import (
        pack_spans,
        prefix_sum_by_id,
    )

    rows = [(i, (i * 7) % 13) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    expect = {}
    acc = 0
    for i, n in rows:
        expect[i] = acc
        acc += n
    for chunk in (1, 7, 64, 1000):
        got = {
            r["doc_id"]: r["tok_start"]
            for r in prefix_sum_by_id(
                df.repartition(9), "n_tok", chunk=chunk
            ).collect()
        }
        assert got == expect, f"chunk={chunk}"

    spans = {
        r["doc_id"]: (r["first_bin"], r["last_bin"], r["n_bins"])
        for r in pack_spans(df, budget=16, chunk=7).collect()
    }
    acc = 0
    for i, n in rows:
        first = acc // 16
        last = max(first, (acc + n - 1) // 16)
        assert spans[i] == (first, last, last - first + 1), i
        acc += n
    # zero-token doc: stays in its first bin, never an inverted span
    z = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 5)], "doc_id bigint, n_tok bigint"
    )
    got = {r["doc_id"]: r for r in pack_spans(z, budget=4).collect()}
    assert (got[2]["first_bin"], got[2]["n_bins"]) == (1, 1)


def test_kn_fluency_scores_hand_case(spark):
    """KN micro-unit probabilities verified against a hand computation on
    a 2-doc corpus, plus the OOV-backoff branches."""
    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.textstats import kn_fluency_scores

    # training corpus ('orig'): doc1 = a b a b, doc2 = a b c
    # bigram counts: (a,b)=3 (a,b)x2 in doc1 + 1 in doc2; (b,a)=1; (b,c)=1
    # w1 stats: a -> c_w1=3, fanout=1 ; b -> c_w1=2, fanout=2
    # w2 stats: b -> n_cont=1 ; a -> 1 ; c -> 1 ; n_types=3
    rows = [
        (1, "orig", ["a", "b", "a", "b"]),
        (2, "orig", ["a", "b", "c"]),
        # probe doc: one seen bigram, one unseen-w2, one unseen-w1
        (3, "probe", ["a", "b", "zz", "c"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, variant string, toks array<string>"
    )
    got = {
        (r["doc_id"], r["variant"]): (r["n_bigrams"], r["fluency_u6"])
        for r in kn_fluency_scores(df).collect()
    }

    def p(c_ab, c_w1, fanout, n_cont, n_types=3):
        if c_w1:
            t1 = max(4 * c_ab - 3, 0) * 1_000_000 // (4 * c_w1)
            lam = 3 * fanout * 1_000_000 // (4 * c_w1)
        else:
            t1, lam = 0, 1_000_000
        return t1 + lam * (n_cont * 1_000_000 // n_types) // 1_000_000

    # probe bigrams: (a,b) seen; (b,zz) unseen w2 (n_cont 0);
    # (zz,c) unseen w1 -> pure continuation
    want = [
        p(3, 3, 1, 1),      # (a,b)
        p(0, 2, 2, 0),      # (b,zz)
        p(0, 0, 0, 1),      # (zz,c)
    ]
    assert got[(3, "probe")] == (3, sum(want) // 3)
    # originals score themselves fluently: every doc-1 bigram is seen
    assert got[(1, "orig")][1] > got[(3, "probe")][1]


def test_kn_fluency_separates_planted_corruption(spark):
    """The registered query's plant on a synthetic corpus: OOV'ing every
    3rd token must drop the score for every doc."""
    from pyspark.sql import functions as F

    from vector_db_light_spark.operators.textstats import kn_fluency_scores

    base = [
        (i, ("alpha beta gamma delta " * 5).split()) for i in range(1, 9)
    ]
    docs = spark.createDataFrame(base, "doc_id bigint, toks array<string>")
    corrupt = F.transform(
        F.col("toks"),
        lambda t, i: F.when((i + 1) % 3 == 0, F.concat(F.lit("zq"), t)).otherwise(t),
    )
    variants = docs.select(
        "doc_id", F.lit("orig").alias("variant"), "toks"
    ).unionByName(
        docs.select("doc_id", F.lit("corrupt").alias("variant"), corrupt.alias("toks"))
    )
    per = kn_fluency_scores(variants).collect()
    flu = {(r["doc_id"], r["variant"]): r["fluency_u6"] for r in per}
    for i in range(1, 9):
        assert flu[(i, "orig")] > flu[(i, "corrupt")], i


def test_ccnet_gk_thresholds_agree(spark):
    """The engine GK sketch variant of the CCNet tercile swap-out
    (VERDICT r12 #4): thresholds from percentile_approx over the full
    fluency column (accuracy 10000 — effectively exact at fixture n,
    the engine's real production estimator) bucket-agree with the exact
    rank cut on >= 95% of docs. The REGISTERED query uses the
    sample-exact estimator because GK merge order is not bit-portable
    across engines; this test pins the GK path itself."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from vector_db_light_spark.operators.textstats import (
        kn_fluency_scores,
        tokens_expr,
    )
    from vector_db_light_spark._registry_core import load_docs

    docs = load_docs(spark, "/root/testdata/sf0.001")
    orig = (
        docs.select("doc_id", tokens_expr("text").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", F.lit("orig").alias("variant"), "toks")
    )
    per = kn_fluency_scores(orig).select("doc_id", "fluency_u6")
    th = per.agg(
        F.percentile_approx("fluency_u6", F.lit(2.0 / 3.0), F.lit(10000)).alias(
            "t_head"
        ),
        F.percentile_approx("fluency_u6", F.lit(1.0 / 3.0), F.lit(10000)).alias(
            "t_mid"
        ),
    )
    w = Window.orderBy(F.col("fluency_u6").desc(), F.col("doc_id").asc())
    cnt = per.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = (
        per.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(cnt))
        .crossJoin(F.broadcast(th))
    )
    b_exact = (
        F.when(F.col("rk") * 3 <= F.col("_n"), "head")
        .when(F.col("rk") * 3 <= 2 * F.col("_n"), "middle")
        .otherwise("tail")
    )
    b_gk = (
        F.when(F.col("fluency_u6") >= F.col("t_head"), "head")
        .when(F.col("fluency_u6") >= F.col("t_mid"), "middle")
        .otherwise("tail")
    )
    stats = ranked.agg(
        F.sum((b_exact == b_gk).cast("int")).alias("agree"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats["n"] > 0
    assert stats["agree"] / stats["n"] >= 0.95, (
        stats["agree"], stats["n"]
    )


def test_pii_scrub_edges(spark):
    """Clean text is untouched (0 counts, md5 of the lowercased input);
    scrubbing is idempotent (the redaction tags match no pattern); counts
    see multiple occurrences and mixed classes."""
    import hashlib

    from vector_db_light_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "Just A Clean Sentence"),
            (2, "a@b.io or c.d+x@e-f.org and a@b.io"),
            (3, "call 555-123-4567 from 10.0.0.7"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[1]["n_pii"], out[1]["has_pii"]) == (0, 0)
    assert out[1]["scrubbed_md5"] == hashlib.md5(
        b"just a clean sentence"
    ).hexdigest()[:16]
    assert out[2]["n_emails"] == 3  # every occurrence, not distinct
    assert (out[3]["n_phones"], out[3]["n_ips"]) == (1, 1)
    # idempotence: scrub of the scrubbed text is a fixed point
    scrubbed2 = spark.createDataFrame(
        [(3, "call [PHONE] from [IP]")], "doc_id bigint, text string"
    )
    r2 = pii_scrub(scrubbed2).collect()[0]
    assert r2["n_pii"] == 0
    assert r2["scrubbed_md5"] == hashlib.md5(
        b"call [phone] from [ip]"
    ).hexdigest()[:16]


def test_c4_line_rules_edges(spark):
    """Line keep-law edges: quote-terminated lines keep; 4-word lines
    drop; 'JavaScript' is case-insensitive; a brace anywhere drops the
    page regardless of good lines; empty text is one (dropped) line."""
    from vector_db_light_spark.operators.textstats import c4_line_rules

    good = "this line has five good words."
    docs = spark.createDataFrame(
        [
            (1, "\n".join([good, good, 'he said "five words right here."'])),
            (2, "\n".join([good, good, "only four words here."])),
            (3, "\n".join([good, good, good, "the JavaScript line is long enough."])),
            (4, "\n".join([good, good, good, "code { x }"])),
            (5, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_rules(docs).collect()}
    assert (out[1]["n_kept_lines"], out[1]["keep"]) == (3, 1)
    assert (out[2]["n_kept_lines"], out[2]["drop_reason"]) == (
        2, "few_sentences",
    )
    assert out[3]["n_kept_lines"] == 3  # javascript line dropped, page kept
    assert out[3]["keep"] == 1
    assert out[4]["drop_reason"] == "brace"
    assert (out[5]["n_lines"], out[5]["drop_reason"]) == (1, "few_sentences")


def test_bpe_train_local_incremental_equals_naive_property():
    """The r13 incremental trainer (pair-delta maintenance + lazy heap
    argmax) is bit-identical to the naive recount-per-round loop across
    random vocabularies — rounds, pairs, counts, AND re-merge cases
    where a later merge recreates a previously merged pair."""
    import random

    from vector_db_light_spark.operators.textstats import (
        _merge_word,
        bpe_train_local,
    )

    def naive(word_counts, n_merges):
        sym = {w: tuple(w) for w in word_counts}
        merges = []
        for r in range(1, n_merges + 1):
            cnt = {}
            for w, n in word_counts.items():
                s = sym[w]
                for i in range(len(s) - 1):
                    p = (s[i], s[i + 1])
                    cnt[p] = cnt.get(p, 0) + n
            if not cnt:
                break
            (L, R), c = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
            )
            merges.append((r, L + " " + R, c))
            for w in sym:
                sym[w] = _merge_word(sym[w], L, R)
        return merges

    rng = random.Random(131)
    for trial in range(80):
        alpha = "ab" if trial % 3 == 0 else "abc"  # tiny alphabets force ties
        vocab = {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10))):
                rng.randint(1, 9)
            for _ in range(rng.randint(1, 15))
        }
        k = rng.randint(1, 40)
        assert bpe_train_local(dict(vocab), k) == naive(dict(vocab), k), (
            trial, vocab, k
        )


def test_pii_regex_cross_engine_parity_fuzz(spark):
    """The PII patterns are restricted to Java-regex/RE2-shared syntax —
    fuzz that claim: random ASCII texts salted with PII-shaped and
    ALMOST-PII-shaped fragments must yield identical per-class counts
    and identical scrubbed bytes on Spark and DuckDB."""
    import random

    import duckdb

    from vector_db_light_spark.operators.textstats import pii_scrub
    from vector_db_light_spark.queries.textstats import (
        _PII_EMAIL_SQL,
        _PII_IP_SQL,
        _PII_PHONE_SQL,
    )

    rng = random.Random(13)
    frags = [
        "a@b.io", "x.y+z@host-name.org", "no@tld", "@lonely", "a@@b.com",
        "555-123-4567", "55-123-4567", "555-123-456", "5551234567",
        "10.0.0.7", "1.2.3", "999.999.999.999", "1.2.3.4.5", "v1.2.3.4",
        "{", "}", '"', "..", "a.b", "-", "+", "%", "_",
    ]
    words = ["the", "quick", "Fox", "JUMPS", "over", "lazy", "dogs"]
    rows = []
    for i in range(120):
        n = rng.randint(0, 14)
        toks = [rng.choice(words + frags) for _ in range(n)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (
            r["n_emails"], r["n_phones"], r["n_ips"], r["scrubbed_md5"]
        )
        for r in pii_scrub(docs).collect()
    }
    con = duckdb.connect()
    for i, text in rows:
        e, p, q, h = con.execute(
            f"""SELECT
              len(regexp_extract_all(lower($1), '{_PII_EMAIL_SQL}')),
              len(regexp_extract_all(lower($1), '{_PII_PHONE_SQL}')),
              len(regexp_extract_all(lower($1), '{_PII_IP_SQL}')),
              substr(md5(regexp_replace(regexp_replace(regexp_replace(
                lower($1), '{_PII_EMAIL_SQL}', '[EMAIL]', 'g'),
                '{_PII_PHONE_SQL}', '[PHONE]', 'g'),
                '{_PII_IP_SQL}', '[IP]', 'g')), 1, 16)""",
            [text],
        ).fetchone()
        assert got[i] == (e, p, q, h), (i, text, got[i], (e, p, q, h))


def test_pii_scrub_luhn_cc(spark):
    """r14 credit-card path: a Luhn-VALID 16-digit card redacts to [CC]
    (and counts toward n_pii), a broken-check candidate is counted as a
    candidate but SURVIVES redaction — the false-positive guard a bare
    regex scrub fails."""
    import hashlib

    from vector_db_light_spark.operators.textstats import pii_scrub

    valid, invalid = "4532-0151-1283-0366", "4532-0151-1283-0367"
    docs = spark.createDataFrame(
        [(1, f"pay {valid} not {invalid} ok")],
        "doc_id bigint, text string",
    )
    r = pii_scrub(docs).collect()[0]
    assert (r["n_cc_candidates"], r["n_cc_valid"]) == (2, 1)
    assert (r["n_pii"], r["has_pii"]) == (1, 1)
    assert r["scrubbed_md5"] == hashlib.md5(
        f"pay [CC] not {invalid} ok".encode()
    ).hexdigest()[:16]


def test_llm_corpus_pipeline_funnel_invariants(spark):
    """Fast (sf0.001) structural pins on the r14 capstone beyond the
    driver's sf0.01 hash: the funnel is populated, stage precedence
    rules hold row-wise, and the packing layout is a valid contiguous
    bin assignment over exactly the kept docs."""
    from collections import Counter

    from vector_db_light_spark.registry import QUERIES

    rows = QUERIES["llm_corpus_pipeline"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    reasons = Counter(r["drop_reason"] for r in rows)
    assert reasons["kept"] > 0 and reasons["exact_dup"] > 0
    kept = sorted(
        (r for r in rows if r["drop_reason"] == "kept"),
        key=lambda r: r["doc_id"],
    )
    # keep bit == kept reason; dropped rows carry the sentinels
    for r in rows:
        if r["drop_reason"] == "kept":
            assert r["keep"] == 1 and r["n_tok"] >= 0 and r["n_bins"] >= 1
        else:
            assert (r["keep"], r["n_tok"], r["n_bins"]) == (0, -1, 0)
            if r["drop_reason"] not in ("ppl_sample", "mix_sample"):
                # docs dropped before CCNet carry the bucket sentinel
                assert r["bucket"] == "dropped" and r["fluency_u6"] == -1
    # PII stage is scrub-not-drop: planted %13 docs carry n_pii >= 2 and
    # never a pii drop reason
    pii_docs = [r for r in rows if r["doc_id"] % 13 == 0 and r["doc_id"] < 100000]
    assert pii_docs and all(r["n_pii"] >= 2 for r in pii_docs)
    assert not any(str(r["drop_reason"]).startswith("pii") for r in rows)
    # packing: first_bin nondecreasing in doc_id order; a doc spanning
    # n_bins covers exactly the bins its token span implies
    tok_start = 0
    for r in kept:
        assert r["first_bin"] == tok_start // 512
        last = max(tok_start // 512, (tok_start + r["n_tok"] - 1) // 512)
        assert r["n_bins"] == last - r["first_bin"] + 1
        tok_start += r["n_tok"]
