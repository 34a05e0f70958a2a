"""Edit-distance fuzzy self-join (entity resolution / record linkage).

The data-cleaning companion to the token-level dedup tiers in
``operators/dedup.py``: finds ID pairs whose STRING keys are within a
bounded Levenshtein distance — near-identical titles, author fields, file
names — without the O(n²) comparison a naive approach needs. Both engines
implement the same unit-cost edit distance (Spark ``levenshtein`` /
DuckDB ``levenshtein``), and the distance is an integer, so results are
exactly oracle-checkable with no float concerns.

Blocking is COMPLETE (no candidate within ``max_dist`` is ever missed),
via two equi-join tiers:

* **q-gram tier** (strings with ``len >= q + q*max_dist``): strings x, y
  with ``ed(x, y) <= k`` share at least ``max(|x|,|y|) - (q-1) - q*k``
  q-gram occurrences (the classic count-filter bound, Gravano et al.,
  "Approximate String Joins in a Database (Almost) for Free", VLDB 2001)
  — which is >= 1 exactly when ``max(|x|,|y|) >= q + q*k``, the tier's
  admission bound. One equi-join on the gram value.
* **short tier** (strings with ``len < q + q*k + k``): too short for the
  gram guarantee, blocked by LENGTH instead — each row replicates to the
  ``2k+1`` length keys it could pair with, then equi-joins on the key.
  Quadratic only within a length bucket of the short-string minority.

Any pair with ``min(len) < q + q*k`` has BOTH members under
``q + q*k + k`` (lengths of a matching pair differ by <= k), so it is
caught by the short tier; pairs with both members >= ``q + q*k`` are
caught by the gram tier; the overlap de-dups via ``distinct()``.

Scale shape: the gram join shuffles (gram, id) pairs — linear in total
gram count; ultra-common grams fatten the join like any hot key and can
be pruned with ``max_gram_df`` at a documented recall cost (the standard
prefix-filter trade; leave None for exactness). The verify stage joins
candidate IDs back to their keys (two key-table joins) and computes the
exact distance only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prune_hot_grams(
    blocking: DataFrame, index: DataFrame, max_gram_df: int
) -> DataFrame:
    """Drop gram rows whose key appears in more than ``max_gram_df``
    distinct INDEX strings (prefix-filter style — the documented recall
    trade for corpora where stopword-grams dominate the join). Length
    rows pass through untouched."""
    rare = (
        index.filter(F.col("kind") == "g")
        .groupBy("key")
        .agg(F.count_distinct("_fid").alias("_df"))
        .filter(F.col("_df") <= max_gram_df)
        .select("key")
    )
    return blocking.filter(F.col("kind") == "l").unionByName(
        blocking.filter(F.col("kind") == "g").join(
            F.broadcast(rare), "key", "left_semi"
        )
    )


def _verify_pairs(
    cands: DataFrame,
    left_keys: DataFrame,
    right_keys: DataFrame,
    left_id: str,
    right_id: str,
    max_dist: int,
) -> DataFrame:
    """Exact-distance verification on candidates only (length window
    first — a cheap codegen predicate that skips the DP for most false
    drops)."""
    return (
        cands.join(left_keys, left_id)
        .join(right_keys, right_id)
        .filter(F.abs(F.length("_ka") - F.length("_kb")) <= max_dist)
        .withColumn("dist", F.levenshtein("_ka", "_kb"))
        .filter(F.col("dist") <= max_dist)
        .select(
            left_id, right_id, F.col("dist").cast("int").alias("dist")
        )
    )


def _positional_grams(keyed: DataFrame, q: int) -> DataFrame:
    """(_fid, _g, _pos, _len) positional q-gram rows of pre-aliased
    (_fid, _k) strings. Positions are 1-based."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length("_k") - q + 1),
        lambda i: F.struct(
            F.col("_k").substr(i, F.lit(q)).alias("_g"), i.alias("_pos")
        ),
    )
    return keyed.select(
        "_fid",
        F.length("_k").alias("_len"),
        F.explode(grams).alias("_x"),
    ).select("_fid", "_len", "_x._g", "_x._pos")


def _prefix_probe_rows(
    grams: DataFrame, gram_df: DataFrame, n_prefix: int
) -> DataFrame:
    """Each string's ``n_prefix`` RAREST positional grams (global
    (df, gram, pos) order; unseen grams rank rarest via df 0) — the
    one-sided prefix filter. Soundness is elementary pigeonhole, not a
    both-side prefix lemma: k edits destroy at most q*k of a string's
    positional grams and shift survivors by at most k positions, so ANY
    q*k + 1 of its grams contain one that survives — in particular the
    rarest ones, which keeps hot (stopword) grams out of the probe side
    and turns their join cost linear-in-df instead of df^2."""
    from pyspark.sql.window import Window

    ranked = grams.join(gram_df, "_g", "left").withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_fid").orderBy(
                F.coalesce(F.col("_gdf"), F.lit(0)), "_g", "_pos"
            )
        ),
    )
    return ranked.filter(F.col("_rn") <= n_prefix).select(
        "_fid", "_len", "_g", "_pos"
    )


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
    max_gram_df: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """(id_a, id_b, dist) for every pair with ``levenshtein <= max_dist``
    (``id_a < id_b``). See module docstring for the blocking guarantee.

    ``prefix_filter=True`` switches the gram tier to the EXACT one-sided
    prefix filter (:func:`_prefix_probe_rows`): the probe side shrinks
    from every gram to the ``q*max_dist + 1`` rarest per string, the
    index side keeps all positional grams, and candidates additionally
    need ``|pos_a - pos_b| <= max_dist`` (edits shift positions by at
    most k). Same answer set — the completeness argument is pigeonhole
    over EITHER direction of a pair, so each string probing the full
    index suffices — at a fraction of the hot-gram join cost; prefer it
    over ``max_gram_df`` (which trades recall) at scale. Default stays
    the plain full-gram join (simplest plan; fine until stopword grams
    dominate).

    Candidates otherwise come from one probe-vs-index equi-join over
    :func:`fuzzy_blocking_keys` — the SAME tier construction the
    incremental path uses (review r8: a hand-rolled copy here would let
    the two paths' completeness-critical bounds drift apart)."""
    keyed = df.select(
        F.col(id_col).alias("_fid"), F.col(key_col).alias("_k")
    ).filter(F.col("_k").isNotNull())

    if prefix_filter:
        gram_bound = q + q * max_dist
        short_bound = gram_bound + max_dist
        longs = keyed.filter(F.length("_k") >= gram_bound)
        grams = _positional_grams(longs, q)
        gdf = grams.groupBy("_g").agg(
            F.count_distinct("_fid").alias("_gdf")
        )
        probe = _prefix_probe_rows(grams, gdf, q * max_dist + 1)
        cand_gram = (
            probe.select(
                F.col("_fid").alias("id_a"),
                F.col("_len").alias("_la"),
                "_g",
                F.col("_pos").alias("_pa"),
            )
            .join(
                grams.select(
                    F.col("_fid").alias("id_b"),
                    F.col("_len").alias("_lb"),
                    "_g",
                    F.col("_pos").alias("_pb"),
                ),
                "_g",
            )
            .filter(
                (F.col("id_a") != F.col("id_b"))
                & (F.abs(F.col("_pa") - F.col("_pb")) <= max_dist)
                & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
            )
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
        )
        shorts_idx = fuzzy_blocking_keys(
            keyed.filter(F.length("_k") < short_bound),
            "_k", "_fid", max_dist=max_dist, q=q, probe=False,
        ).filter(F.col("kind") == "l")
        shorts_prb = fuzzy_blocking_keys(
            keyed.filter(F.length("_k") < short_bound),
            "_k", "_fid", max_dist=max_dist, q=q, probe=True,
        ).filter(F.col("kind") == "l")
        cand_short = (
            shorts_prb.select(F.col("_fid").alias("id_a"), "kind", "key")
            .join(
                shorts_idx.select(F.col("_fid").alias("id_b"), "kind", "key"),
                ["kind", "key"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = cand_gram.unionByName(cand_short).distinct()
    else:
        idx = fuzzy_blocking_keys(
            keyed, "_k", "_fid", max_dist=max_dist, q=q, probe=False
        )
        prb = fuzzy_blocking_keys(
            keyed, "_k", "_fid", max_dist=max_dist, q=q, probe=True
        )
        if max_gram_df is not None:
            idx = _prune_hot_grams(idx, idx, max_gram_df)
            prb = _prune_hot_grams(prb, idx, max_gram_df)
        cands = (
            prb.select(F.col("_fid").alias("id_a"), "kind", "key")
            .join(
                idx.select(F.col("_fid").alias("id_b"), "kind", "key"),
                ["kind", "key"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    ka = keyed.select(F.col("_fid").alias("id_a"), F.col("_k").alias("_ka"))
    kb = keyed.select(F.col("_fid").alias("id_b"), F.col("_k").alias("_kb"))
    return _verify_pairs(cands, ka, kb, "id_a", "id_b", max_dist)


def fuzzy_blocking_keys(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
    probe: bool = False,
) -> DataFrame:
    """(id, kind, key) blocking rows for the INCREMENTAL entity-resolution
    path — the persistable gram/length index the batch-vs-corpus join
    probes (the fuzzy twin of dedup's band table).

    Two row kinds mirror :func:`fuzzy_self_join`'s tiers: ``'g'`` rows are
    q-grams of strings long enough for the count-filter guarantee;
    ``'l'`` rows block the short minority by length. ``probe=False``
    emits INDEX rows (one length row per short string); ``probe=True``
    emits PROBE rows (a short string fans out to the ``2k+1`` partner
    lengths it could match). Completeness across the tiers holds because
    a pair's lengths differ by <= k: if either member is under the gram
    bound, BOTH are under the short bound + k, so the probe's length
    fan-out reaches the index's length row; pairs with both members at or
    above the gram bound meet in the gram tier."""
    keyed = df.select(
        F.col(id_col).alias("_fid"), F.col(key_col).alias("_k")
    ).filter(F.col("_k").isNotNull())
    gram_bound = q + q * max_dist
    short_bound = gram_bound + max_dist

    long_rows = keyed.filter(F.length("_k") >= gram_bound)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("_k") - q + 1),
        lambda i: F.col("_k").substr(i, F.lit(q)),
    )
    g = long_rows.select(
        "_fid", F.lit("g").alias("kind"), F.explode(grams).alias("key")
    )
    shorts = keyed.filter(F.length("_k") < short_bound)
    if probe:
        lens = shorts.select(
            "_fid",
            F.lit("l").alias("kind"),
            F.explode(
                F.transform(
                    F.sequence(
                        F.length("_k") - max_dist, F.length("_k") + max_dist
                    ),
                    lambda x: x.cast("string"),
                )
            ).alias("key"),
        )
    else:
        lens = shorts.select(
            "_fid",
            F.lit("l").alias("kind"),
            F.length("_k").cast("string").alias("key"),
        )
    return g.unionByName(lens)


def incremental_fuzzy_pairs(
    corpus: DataFrame,
    new: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
    index: DataFrame | None = None,
) -> DataFrame:
    """(new_id, existing_id, dist) for every new-batch key within
    ``max_dist`` of a corpus key — the daily-ingest entity-resolution
    pass. Candidate generation joins the NEW batch's probe rows against
    the corpus' blocking index only, so per-batch cost scales with the
    batch, never |corpus|^2 (the dedup_incremental_lsh posture);
    verification computes the exact distance on candidates.

    Pass ``index`` — a PERSISTED :func:`fuzzy_blocking_keys`
    (``probe=False``) table, built with the SAME (max_dist, q) — to skip
    re-deriving it from the corpus: that is the whole point of the
    incremental path at scale (review r8: without this parameter every
    batch re-exploded q-grams over the entire corpus). The raw ``corpus``
    frame is still needed for the candidate-only key lookup at verify
    time (an id equi-join, not a corpus scan of the keys' grams)."""
    if index is None:
        index = fuzzy_blocking_keys(
            corpus, key_col, id_col, max_dist=max_dist, q=q, probe=False
        )
    idx = index.select(F.col("_fid").alias("existing_id"), "kind", "key")
    probes = fuzzy_blocking_keys(
        new, key_col, id_col, max_dist=max_dist, q=q, probe=True
    ).select(F.col("_fid").alias("new_id"), "kind", "key")
    cands = probes.join(idx, ["kind", "key"]).select(
        "new_id", "existing_id"
    ).distinct()
    kn = new.select(
        F.col(id_col).alias("new_id"), F.col(key_col).alias("_ka")
    )
    ke = corpus.select(
        F.col(id_col).alias("existing_id"), F.col(key_col).alias("_kb")
    )
    return _verify_pairs(cands, kn, ke, "new_id", "existing_id", max_dist)
