"""Connected-components clustering properties (transitive closure of
near-dup pairs -> canonical keep-list)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_db_light_spark.operators.dedup import connected_components


def _components(spark, pairs, npartitions=1):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    if npartitions > 1:
        df = df.repartition(npartitions)
    return {
        r["id"]: r["label"] for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4 is one component labeled 1; 10-11 another labeled 10.
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_partition_independent(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (5, 6), (6, 7), (4, 5)]
    assert _components(spark, pairs) == _components(spark, pairs, npartitions=7)


def test_star_and_reversed_edges(spark):
    # hub listed as id_b sometimes; direction must not matter
    got = _components(spark, [(5, 1), (1, 6), (7, 1), (1, 8)])
    assert set(got.values()) == {1}
    assert set(got) == {1, 5, 6, 7, 8}


def test_empty_pairs(spark):
    got = _components(spark, [])
    assert got == {}


def test_long_chain_converges(spark):
    # diameter 12 — needs multiple propagation rounds, still closes
    pairs = [(i, i + 1) for i in range(1, 13)]
    got = _components(spark, pairs)
    assert set(got.values()) == {1}
    assert len(got) == 13


def _star_components(spark, pairs, **kw):
    from vector_db_light_spark.operators.dedup import connected_components_star

    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    return {r["id"]: r["label"] for r in connected_components_star(df, **kw).collect()}


def test_star_variant_matches_min_label_on_random_graphs(spark):
    """Property: large-star/small-star and min-label propagation agree on
    random graphs (same node set, same min-id labels). Seeded RNG keeps the
    run deterministic; shapes cover sparse, denser, and chain-heavy."""
    import random

    for seed, n, m in [(7, 30, 20), (11, 40, 60), (13, 25, 12)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ] + [(i, i + 1) for i in range(0, n // 3)]  # graft a chain segment
        assert _star_components(spark, pairs) == _components(spark, pairs), (
            f"divergence at seed={seed}"
        )


def test_star_variant_high_diameter_chain(spark):
    # diameter 20: the workload the alternating algorithm exists for
    pairs = [(i, i + 1) for i in range(1, 21)]
    got = _star_components(spark, pairs)
    assert set(got.values()) == {1}
    assert len(got) == 21


def test_star_variant_edge_shapes(spark):
    assert _star_components(spark, []) == {}
    # self-pair only: node labels itself
    assert _star_components(spark, [(4, 4)]) == {4: 4}
    # reversed directions and duplicates don't matter
    got = _star_components(spark, [(5, 1), (1, 5), (7, 1), (1, 8), (8, 1)])
    assert set(got.values()) == {1} and set(got) == {1, 5, 7, 8}


def test_star_variant_reliable_checkpoint_dir(spark, tmp_path):
    import os

    from vector_db_light_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    ckpt = str(tmp_path / "star_ckpt")
    got = {
        r["id"]: r["label"]
        for r in connected_components_star(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    assert os.listdir(ckpt)  # reliable checkpoints actually landed there


def test_checkpoint_dir_restored_even_on_failure(spark, tmp_path):
    """ADVICE r5: a mid-iteration failure must restore the context-global
    checkpoint dir when one was previously set."""
    import pytest

    from vector_db_light_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    original = str(tmp_path / "orig_ckpt")
    sc.setCheckpointDir(original)
    try:
        prev = sc.getCheckpointDir()
        bad = spark.createDataFrame([(1, "x")], "id_a bigint, id_b string")
        with pytest.raises(Exception):
            # the string id column fails the bigint cast under ANSI mid-
            # iteration — the finally must still restore the dir
            connected_components(
                bad, checkpoint_dir=str(tmp_path / "cc_ckpt")
            ).collect()
        # setCheckpointDir nests a fresh UUID under the given path, so
        # "restored" means: back under the ORIGINAL base, not the cc_ckpt one
        got = sc.getCheckpointDir()
        assert got == prev or got.startswith(prev + "/")
        assert "cc_ckpt" not in got
    finally:
        sc.setCheckpointDir(original)


def test_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir selects reliable checkpoint(): same labels as the
    localCheckpoint default, and the checkpoint files actually land in the
    given directory (the on-cluster durability story is code, not comment)."""
    import os

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    ckpt = str(tmp_path / "ckpt")
    got = {
        (r["id"], r["label"])
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "no reliable checkpoint files written under checkpoint_dir"


def test_minhash_double_hash_family_properties(spark):
    """The KM double-hash signatures must behave like a minhash family:
    every value in [0, P); identical texts get identical signatures
    (determinism); unrelated texts differ in at least one of the 12
    sig columns."""
    from vector_db_light_spark.operators.dedup import (
        MINHASH_P,
        NUM_HASHES,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different words in this one altogether now"),
        ],
        "doc_id bigint, text string",
    )
    sigs = {r["doc_id"]: r for r in minhash_signatures(docs, n=3).collect()}
    for r in sigs.values():
        for j in range(NUM_HASHES):
            assert 0 <= r[f"sig_{j}"] < MINHASH_P
    assert all(sigs[1][f"sig_{j}"] == sigs[2][f"sig_{j}"] for j in range(NUM_HASHES))
    assert any(sigs[1][f"sig_{j}"] != sigs[3][f"sig_{j}"] for j in range(NUM_HASHES))


def test_incremental_candidates_are_cross_only(spark):
    """incremental_lsh_candidates must emit new x existing pairs only —
    never existing x existing (that half is the one-time backfill) and
    never new x new (that's lsh_candidate_pairs on the batch)."""
    from vector_db_light_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_keys,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
            (100, "alpha beta gamma delta epsilon zeta eta theta"),  # new dup
            (101, "totally unrelated new content words here now"),
            (102, "totally unrelated new content words here now"),  # new x new
        ],
        "doc_id bigint, text string",
    )
    bands = minhash_band_keys(minhash_signatures(docs, n=3))
    got = {
        (r["new_id"], r["existing_id"])
        for r in incremental_lsh_candidates(
            bands.filter("doc_id < 100"), bands.filter("doc_id >= 100")
        ).collect()
    }
    assert got == {(100, 1), (100, 2)}  # no (1,2), no (101,102)


def test_fuzzy_self_join_blocking_tiers_complete(spark):
    """Both blocking tiers and the boundary: long strings (q-gram tier),
    short strings (length-bucket tier), a cross-boundary-length pair, and
    a distance-3 pair that must be excluded."""
    from vector_db_light_spark.operators.fuzzy import fuzzy_self_join

    rows = [
        (1, "the quick brown fox jumps over the dog"),
        (2, "the quick brown fox jumps over the do"),    # dist 1 to 1
        (3, "the quick brown fox jumpz over the dig"),   # dist 2 to 1
        (4, "completely different sentence entirely"),
        (5, "cat"),                                      # short tier
        (6, "cut"),                                      # dist 1 to 5
        (7, "ba"),                                       # dist 2 to 5/6
        (8, "abcdefgh"),                                 # len 8 (short)
        (9, "abcdefghij"),                               # len 10, dist 2 to 8
        (10, "the quick brown fox j"),                   # dist >2 to 1-3
    ]
    df = spark.createDataFrame(rows, "id bigint, k string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join(df, "k", "id", max_dist=2, q=3).collect()
    }
    # ground truth via python
    import itertools

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b): ed(ka, kb)
        for (a, ka), (b, kb) in itertools.combinations(rows, 2)
        if ed(ka, kb) <= 2
    }
    assert got == want and (1, 2) in got and (5, 6) in got and (8, 9) in got


def test_fuzzy_self_join_gram_df_pruning_is_explicit_tradeoff(spark):
    """max_gram_df prunes hot grams: with every 3-gram shared by > 1
    string pruned, the long-tier pair disappears (documented recall
    trade); without pruning it is found."""
    from vector_db_light_spark.operators.fuzzy import fuzzy_self_join

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaa"), (2, "aaaaaaaaaaaaaaab")],
        "id bigint, k string",
    )
    assert fuzzy_self_join(df, "k", "id", max_dist=2).count() == 1
    assert (
        fuzzy_self_join(df, "k", "id", max_dist=2, max_gram_df=1).count() == 0
    )


def test_incremental_fuzzy_matches_self_join_on_union(spark):
    """The incremental path's index+probe must find exactly the
    cross-set pairs the batch self-join over the union finds — including
    across the tier boundary (one short key, one gram-tier key)."""
    from vector_db_light_spark.operators.fuzzy import (
        fuzzy_self_join,
        incremental_fuzzy_pairs,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "completely different text"),
            (3, "abcdefgh"),            # short tier (len 8)
            (4, "abcdefghij"),          # gram+short overlap (len 10)
        ],
        "id bigint, k string",
    )
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumpz"),   # dist 1 to 1
            (102, "abcdefg"),                      # dist 1 to 3, 3 to 4
            (103, "abcdefghijkl"),                 # dist 2 to 4 (len 12)
            (104, "zzzzzzzzzzzzzzzz"),             # matches nothing
        ],
        "id bigint, k string",
    )
    got = {
        (r["new_id"], r["existing_id"]): r["dist"]
        for r in incremental_fuzzy_pairs(corpus, new, "k", "id").collect()
    }
    # truth: self-join over the union, restricted to cross-set pairs
    both = corpus.unionByName(new)
    want = {
        (r["id_b"], r["id_a"]): r["dist"]
        for r in fuzzy_self_join(both, "k", "id").collect()
        if r["id_b"] > 100 and r["id_a"] <= 100
    }
    assert got == want
    assert (101, 1) in got and (102, 3) in got and (103, 4) in got
    # the exact prefix-filtered probe must return the identical pair set
    got_p = {
        (r["new_id"], r["existing_id"]): r["dist"]
        for r in incremental_fuzzy_pairs(
            corpus, new, "k", "id", prefix_filter=True
        ).collect()
    }
    assert got_p == want


def test_fuzzy_prefix_filter_is_exact(spark):
    """prefix_filter=True must return the identical pair set: one-sided
    prefix soundness is pigeonhole (k edits destroy <= q*k positional
    grams and shift survivors <= k positions, so one of any q*k + 1 probe
    grams survives in the partner within the position window). Includes
    repetitive strings ('aaaa…' has ONE distinct gram — the bag/positional
    form must not collapse) and the boundary-length tiers."""
    from vector_db_light_spark.operators.fuzzy import fuzzy_self_join

    rows = [
        (1, "the quick brown fox jumps over the dog"),
        (2, "the quick brown fox jumps over the do"),
        (3, "the quick brown fox jumpz over the dig"),
        (4, "completely different sentence entirely"),
        (5, "cat"), (6, "cut"), (7, "ba"),
        (8, "abcdefgh"), (9, "abcdefghij"),
        (10, "aaaaaaaaaaaaaaaa"), (11, "aaaaaaaaaaaaaaab"),
        (12, "aaabaaaaaaaaaaaa"),
    ]
    df = spark.createDataFrame(rows, "id bigint, k string")
    full = sorted(
        map(tuple, fuzzy_self_join(df, "k", "id", max_dist=2).collect())
    )
    pref = sorted(
        map(
            tuple,
            fuzzy_self_join(
                df, "k", "id", max_dist=2, prefix_filter=True
            ).collect(),
        )
    )
    assert full == pref and (10, 11) in {(a, b) for a, b, _ in pref}


def test_fuzzy_prefix_filter_random_mutation_sweep(spark):
    """Seeded random corpus of base strings + typo mutations (substitute /
    delete / insert / transpose-ish), prefix-filtered join vs a full
    python brute force — one Spark call, dozens of adversarial pairs."""
    import random

    from vector_db_light_spark.operators.fuzzy import fuzzy_self_join

    rng = random.Random(1234)
    alpha = "abcdef gh"
    bases = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 30)))
        for _ in range(40)
    ]
    rows = []
    for i, b in enumerate(bases):
        rows.append((i * 10, b))
        m = list(b)
        for _ in range(rng.randint(0, 2)):  # 0-2 random edits
            op = rng.choice("sdi")
            if op == "s" and m:
                m[rng.randrange(len(m))] = rng.choice(alpha)
            elif op == "d" and m:
                del m[rng.randrange(len(m))]
            else:
                m.insert(rng.randrange(len(m) + 1), rng.choice(alpha))
        rows.append((i * 10 + 1, "".join(m)))
    df = spark.createDataFrame(rows, "id bigint, k string")
    got = sorted(
        map(
            tuple,
            fuzzy_self_join(
                df, "k", "id", max_dist=2, prefix_filter=True
            ).collect(),
        )
    )

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    import itertools

    want = sorted(
        (a, b, ed(ka, kb))
        for (a, ka), (b, kb) in itertools.combinations(rows, 2)
        if ed(ka, kb) <= 2
    )
    assert got == want


def test_cdc_chunk_stats_shift_tolerance(spark):
    """The CDC property: a prefix edit re-synchronizes at the next
    content-defined boundary, so every later chunk of the edited copy
    deduplicates against the original; an exact copy dedups fully; an
    unrelated doc dedups nothing."""
    from vector_db_light_spark.operators.dedup import cdc_chunk_stats

    # mask=16 gives boundaries every ~16 chars; the repeated 44-char
    # phrase deterministically fires 16 of them (verified with hashlib
    # when the test was written), so re-synchronization is observable
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base),
        (2, base),                      # exact copy
        (3, "EDITEDPREFIX " + base),    # prefix edit, content shifted
        (4, "completely different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r for r in cdc_chunk_stats(df, mask=16).collect()
    }

    # exact copy: every chunk already owned by doc 1
    assert got[2]["n_dup_chunks"] == got[2]["n_chunks"]
    assert got[2]["dedup_ratio_u6"] == 1_000_000
    # doc 1 owns at least its first period's chunks (later periods may
    # dedup internally — that is CDC working on repetitive content)
    assert got[1]["n_dup_chunks"] < got[1]["n_chunks"]
    # shifted copy: chunks AFTER the first boundary re-align; with a
    # repeated base and mask 64 there must be at least one shared chunk
    # and the unshared part is only the edited head
    assert 0 < got[3]["n_dup_chunks"] <= got[3]["n_chunks"]
    assert got[3]["dup_bytes"] > 0
    # unrelated doc: nothing shared
    assert got[4]["n_dup_chunks"] == 0

    # chunk lengths tile the document exactly (no byte lost or doubled):
    # re-derive per-doc total via the operator's internals: ratio identity
    for r in cdc_chunk_stats(df, mask=16).join(df, "doc_id").collect():
        if r["dup_bytes"] == 0:
            assert r["dedup_ratio_u6"] == 0
        else:
            assert (
                r["dedup_ratio_u6"]
                == r["dup_bytes"] * 1_000_000 // len(r["text"])
            )
