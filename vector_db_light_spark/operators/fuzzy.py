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
