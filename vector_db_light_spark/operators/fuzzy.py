"""Edit-distance fuzzy join (entity resolution / record linkage).

The data-cleaning companion to the token-level dedup tiers in
``operators/dedup.py``: finds ID pairs whose STRING keys are within a
bounded Levenshtein distance — near-identical titles, author fields, file
names — without the O(n²) comparison a naive approach needs. Both engines
implement the same unit-cost edit distance (Spark ``levenshtein`` /
DuckDB ``levenshtein``), and the distance is an integer, so results are
exactly oracle-checkable with no float concerns.

Blocking is COMPLETE (no candidate within ``max_dist`` is ever missed),
via two equi-join tiers over POSITIONAL q-grams:

* **q-gram tier** (strings with ``len >= q + q*max_dist``): k edits
  destroy at most ``q*k`` of a string's positional q-grams, and every
  surviving gram reappears in the partner at a position shifted by at
  most ``k`` — so two matching strings share a gram VALUE within a
  ``|pos diff| <= k`` window (the classic count-filter family: Gravano
  et al. VLDB 2001; positional window as in Ed-Join, Xiao et al. 2008).
  One equi-join on the gram value plus the position-window predicate.
* **short tier** (strings with ``len < q + q*k + k``): too short for the
  gram guarantee, blocked by LENGTH instead — probe rows replicate to the
  ``2k+1`` partner lengths and equi-join the index's exact-length rows.
  Quadratic only within a length bucket of the short-string minority.

Any pair with ``min(len) < q + q*k`` has BOTH members under
``q + q*k + k`` (lengths of a matching pair differ by <= k), so it is
caught by the short tier; pairs with both members >= ``q + q*k`` are
caught by the gram tier; the overlap de-dups via ``distinct()``.

**Hot grams and the exact prefix filter.** The plain gram join pays
``df(g)^2`` pairs for every hot (stopword) gram. ``prefix_filter=True``
closes this EXACTLY: the probe side keeps only each string's
``q*k + 1`` RAREST positional grams (global document-frequency order) —
by pigeonhole one of ANY ``q*k + 1`` probe grams survives ``k`` edits,
so probing those against the FULL index misses nothing, and rare-first
ordering keeps hot grams off the probe side (their cost becomes linear
in df instead of quadratic). Measured at sf0.1: 66.6 s -> 6.6 s with an
identical pair set. This one-sided construction needs no both-side
prefix lemma. ``max_gram_df`` remains as a lossy fallback knob
(documented recall trade) for the plain path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed(df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_fid"), F.col(key_col).alias("_k")
    ).filter(F.col("_k").isNotNull())


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
    (df, gram, pos) order; grams absent from ``gram_df`` rank rarest via
    df 0) — the one-sided prefix filter (module docstring)."""
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


def _gram_rows_to_blocking(grams: DataFrame) -> DataFrame:
    return grams.select(
        "_fid", F.lit("g").alias("kind"), F.col("_g").alias("key"),
        F.col("_pos").alias("pos"),
    )


def fuzzy_blocking_keys(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
    probe: bool = False,
) -> DataFrame:
    """(id, kind, key, pos) blocking rows — the persistable gram/length
    index the joins probe (the fuzzy twin of dedup's band table).

    ``'g'`` rows are positional q-grams of strings long enough for the
    gram-tier guarantee (``pos`` carries the 1-based offset so candidate
    joins can apply the ``|pos diff| <= k`` window); ``'l'`` rows block
    the short minority by length (``pos`` NULL). ``probe=False`` emits
    INDEX rows (one length row per short string); ``probe=True`` emits
    PROBE rows (a short string fans out to the ``2k+1`` partner
    lengths). Tier-crossing completeness: a matching pair's lengths
    differ by <= k, so if either member is under the gram bound both are
    under the short bound and the probe's length fan-out reaches the
    index's length row."""
    keyed = _keyed(df, key_col, id_col)
    gram_bound = q + q * max_dist
    short_bound = gram_bound + max_dist

    g = _gram_rows_to_blocking(
        _positional_grams(keyed.filter(F.length("_k") >= gram_bound), q)
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
            F.lit(None).cast("int").alias("pos"),
        )
    else:
        lens = shorts.select(
            "_fid",
            F.lit("l").alias("kind"),
            F.length("_k").cast("string").alias("key"),
            F.lit(None).cast("int").alias("pos"),
        )
    return g.unionByName(lens)


def _prune_hot_grams(
    blocking: DataFrame, index: DataFrame, max_gram_df: int
) -> DataFrame:
    """Drop gram rows whose key appears in more than ``max_gram_df``
    distinct INDEX strings (lossy fallback — the documented recall trade;
    prefer ``prefix_filter``). Length rows pass through untouched."""
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


def _candidate_join(
    probes: DataFrame,
    index: DataFrame,
    left_id: str,
    right_id: str,
    max_dist: int,
) -> DataFrame:
    """Probe-vs-index equi-join on (kind, key); gram rows additionally
    require the ``|pos diff| <= k`` window (edits shift surviving grams
    by at most k — Ed-Join's positional condition). Distinct id pairs."""
    p = probes.select(
        F.col("_fid").alias(left_id), "kind", "key", F.col("pos").alias("_pa")
    )
    i = index.select(
        F.col("_fid").alias(right_id), "kind", "key", F.col("pos").alias("_pb")
    )
    return (
        p.join(i, ["kind", "key"])
        .filter(
            (F.col("kind") == "l")
            | (F.abs(F.col("_pa") - F.col("_pb")) <= max_dist)
        )
        .select(left_id, right_id)
        .distinct()
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
    (``id_a < id_b``). See module docstring for the blocking guarantee
    and the ``prefix_filter`` scale path (exact, preferred at corpus
    scale; ``max_gram_df`` is the lossy fallback for the plain join)."""
    keyed = _keyed(df, key_col, id_col)
    idx = fuzzy_blocking_keys(
        keyed, "_k", "_fid", max_dist=max_dist, q=q, probe=False
    )
    prb = fuzzy_blocking_keys(
        keyed, "_k", "_fid", max_dist=max_dist, q=q, probe=True
    )
    if prefix_filter:
        gram_bound = q + q * max_dist
        grams = _positional_grams(
            keyed.filter(F.length("_k") >= gram_bound), q
        )
        gdf = grams.groupBy("_g").agg(F.count_distinct("_fid").alias("_gdf"))
        prb = _gram_rows_to_blocking(
            _prefix_probe_rows(grams, gdf, q * max_dist + 1)
        ).unionByName(prb.filter(F.col("kind") == "l"))
    elif max_gram_df is not None:
        idx = _prune_hot_grams(idx, idx, max_gram_df)
        prb = _prune_hot_grams(prb, idx, max_gram_df)
    cands = (
        _candidate_join(prb, idx, "_ida", "_idb", max_dist)
        .filter(F.col("_ida") != F.col("_idb"))
        # one-sided probing finds a pair from either member's probe rows:
        # normalize the orientation, then distinct
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
        )
        .distinct()
    )
    ka = keyed.select(F.col("_fid").alias("id_a"), F.col("_k").alias("_ka"))
    kb = keyed.select(F.col("_fid").alias("id_b"), F.col("_k").alias("_kb"))
    return _verify_pairs(cands, ka, kb, "id_a", "id_b", max_dist)


def incremental_fuzzy_pairs(
    corpus: DataFrame,
    new: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
    index: DataFrame | None = None,
    prefix_filter: bool = False,
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
    time (an id equi-join, not a corpus scan of the keys' grams).

    ``prefix_filter=True`` ranks the batch's probe grams by the INDEX
    side's gram frequencies (derived from the persisted index — one
    vocabulary-sized aggregate, no corpus rescan) and keeps the
    ``q*max_dist + 1`` rarest per string — the same exact one-sided
    pigeonhole as the self-join, cutting the hot-gram join cost."""
    if index is None:
        index = fuzzy_blocking_keys(
            corpus, key_col, id_col, max_dist=max_dist, q=q, probe=False
        )
    new_keyed = _keyed(new, key_col, id_col)
    probes = fuzzy_blocking_keys(
        new_keyed, "_k", "_fid", max_dist=max_dist, q=q, probe=True
    )
    if prefix_filter:
        gram_bound = q + q * max_dist
        grams = _positional_grams(
            new_keyed.filter(F.length("_k") >= gram_bound), q
        )
        gdf = (
            index.filter(F.col("kind") == "g")
            .groupBy(F.col("key").alias("_g"))
            .agg(F.count_distinct("_fid").alias("_gdf"))
        )
        probes = _gram_rows_to_blocking(
            _prefix_probe_rows(grams, gdf, q * max_dist + 1)
        ).unionByName(probes.filter(F.col("kind") == "l"))
    cands = _candidate_join(probes, index, "new_id", "existing_id", max_dist)
    kn = new.select(
        F.col(id_col).alias("new_id"), F.col(key_col).alias("_ka")
    )
    ke = corpus.select(
        F.col(id_col).alias("existing_id"), F.col(key_col).alias("_kb")
    )
    return _verify_pairs(cands, kn, ke, "new_id", "existing_id", max_dist)
