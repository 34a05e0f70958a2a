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


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, dist) for every pair with ``levenshtein <= max_dist``
    (``id_a < id_b``). See module docstring for the blocking guarantee."""
    keyed = df.select(
        F.col(id_col).alias("_fid"), F.col(key_col).alias("_k")
    ).filter(F.col("_k").isNotNull())

    gram_bound = q + q * max_dist          # gram tier admission
    short_bound = gram_bound + max_dist    # short tier admission

    # tier 1: q-gram blocking (complete for len >= gram_bound)
    long_rows = keyed.filter(F.length("_k") >= gram_bound)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("_k") - q + 1),
        lambda i: F.col("_k").substr(i, F.lit(q)),
    )
    g = long_rows.select("_fid", F.explode(grams).alias("_g"))
    if max_gram_df is not None:
        # prefix-filter style pruning of hot grams (approximate: documented
        # recall trade for corpora where stopword-grams dominate the join)
        rare = (
            g.groupBy("_g")
            .agg(F.count_distinct("_fid").alias("_df"))
            .filter(F.col("_df") <= max_gram_df)
            .select("_g")
        )
        g = g.join(F.broadcast(rare), "_g", "left_semi")
    ga, gb = g.alias("a"), g.alias("b")
    cand_gram = (
        ga.join(gb, F.col("a._g") == F.col("b._g"))
        .filter(F.col("a._fid") < F.col("b._fid"))
        .select(
            F.col("a._fid").alias("id_a"), F.col("b._fid").alias("id_b")
        )
    )

    # tier 2: length-bucket blocking for the short minority — each left
    # row replicates to the 2k+1 partner lengths, equi-join on the bucket
    shorts = keyed.filter(F.length("_k") < short_bound)
    la = shorts.select(
        "_fid",
        F.explode(
            F.sequence(
                F.length("_k") - max_dist, F.length("_k") + max_dist
            )
        ).alias("_lb"),
    )
    lb = shorts.select(F.col("_fid").alias("_fid_b"), F.length("_k").alias("_lb"))
    cand_short = (
        la.join(lb, "_lb")
        .filter(F.col("_fid") < F.col("_fid_b"))
        .select(F.col("_fid").alias("id_a"), F.col("_fid_b").alias("id_b"))
    )

    cands = cand_gram.unionByName(cand_short).distinct()

    # verify: exact distance on candidates only (length window first —
    # a cheap codegen predicate that skips the DP for most false drops)
    ka = keyed.select(F.col("_fid").alias("id_a"), F.col("_k").alias("_ka"))
    kb = keyed.select(F.col("_fid").alias("id_b"), F.col("_k").alias("_kb"))
    return (
        cands.join(ka, "id_a")
        .join(kb, "id_b")
        .filter(
            F.abs(F.length("_ka") - F.length("_kb")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("_ka", "_kb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )


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
) -> DataFrame:
    """(new_id, existing_id, dist) for every new-batch key within
    ``max_dist`` of a corpus key — the daily-ingest entity-resolution
    pass. Candidate generation joins the NEW batch's probe rows against
    the corpus' (persistable) blocking index only, so per-batch cost
    scales with the batch, never |corpus|^2 (the dedup_incremental_lsh
    posture); verification computes the exact distance on candidates."""
    idx = fuzzy_blocking_keys(
        corpus, key_col, id_col, max_dist=max_dist, q=q, probe=False
    ).select(F.col("_fid").alias("existing_id"), "kind", "key")
    probes = fuzzy_blocking_keys(
        new, key_col, id_col, max_dist=max_dist, q=q, probe=True
    ).select(F.col("_fid").alias("new_id"), "kind", "key")
    cands = probes.join(idx, ["kind", "key"]).select(
        "new_id", "existing_id"
    ).distinct()
    kn = new.select(
        F.col(id_col).alias("new_id"), F.col(key_col).alias("_kn")
    )
    ke = corpus.select(
        F.col(id_col).alias("existing_id"), F.col(key_col).alias("_ke")
    )
    return (
        cands.join(kn, "new_id")
        .join(ke, "existing_id")
        .filter(F.abs(F.length("_kn") - F.length("_ke")) <= max_dist)
        .withColumn("dist", F.levenshtein("_kn", "_ke"))
        .filter(F.col("dist") <= max_dist)
        .select("new_id", "existing_id", F.col("dist").cast("int").alias("dist"))
    )
