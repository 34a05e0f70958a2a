"""Vector math as Catalyst expressions (no Python in the hot path).

Re-expresses the reference's FLAT-index query math
(``/root/reference/vector_db_query.py:158-202``, metric written at
``/root/reference/vector_db_creator.py:210-225``) as column expressions over
``ARRAY<FLOAT>`` embedding columns.

Numeric-determinism note: dot products are computed as a *left-to-right
fold over doubles* (``aggregate(zip_with(...))``). The DuckDB oracles use
``list_reduce(list_transform(list_zip(...)))`` — the identical IEEE-754
operation sequence — so results are bit-identical and hash-comparable
without rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# The four metrics the reference's index sidecar can declare
# (vector_db_creator.py:218-225) plus the "unknown" fallback branch
# (vector_db_query.py:199-202).
METRICS = ("cosine", "l2", "sum_of_squares", "inner_product")


def default_query_vector(dim: int = 64, seed: int = 7) -> list[float]:
    """Deterministic unit-norm query vector used by tests/oracles.

    The reference embeds the query string with the same model as the corpus
    (vector_db_query.py:151-154); for model-free oracle checking we use a
    fixed literal vector instead (FIXTURES.md §3).
    """
    raw = [math.sin(seed + 0.7 * i) for i in range(dim)]
    norm = math.sqrt(sum(x * x for x in raw))
    return [round(x / norm, 6) for x in raw]


def vector_lit(vec: list[float]) -> Column:
    """A literal ARRAY<DOUBLE> column."""
    return F.array(*[F.lit(float(v)) for v in vec])


Query = "Column | list[float]"  # accepted query-vector forms (doc alias)


def dot(
    vec_col: Column | str, query: Column | list[float], dim: int | None = None
) -> Column:
    """Left-to-right double fold of the elementwise product.

    Two physical forms, one numeric result:

    * ``query`` is a **Python list** (literal query vector, dim known at
      plan time): emit the statically unrolled sum
      ``(((0.0 + v[0]*q0) + v[1]*q1) + ...)``. Plain Add/Multiply
      expressions stay inside whole-stage codegen — this is the hot
      serving path (VERDICT r6 #1: the interpreted HOF fold was the
      search_pipeline bench breach).
    * ``query`` is a **Column** with ``dim`` given (batch serving: a
      broadcast-joined per-row query vector of known width): unroll with
      ``F.get`` on both sides — still codegen-able.
    * ``query`` is a **Column**, ``dim`` unknown: fall back to the Catalyst
      HigherOrderFunction fold ``aggregate(zip_with(...))`` — JVM-side but
      interpreted.

    Both evaluate the identical IEEE-754 addition sequence starting from
    0.0, so results are bit-identical to each other and to the DuckDB
    ``list_reduce(list_transform(list_zip(...)))`` oracles.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if isinstance(query, (list, tuple)):
        vd = v.cast("array<double>")
        acc = F.lit(0.0)
        for i, q in enumerate(query):
            # F.get (not [] / element_at): NULL on out-of-bounds even under
            # ANSI mode, matching zip_with's null-padding semantics.
            acc = acc + F.get(vd, i) * F.lit(float(q))
        return acc
    if dim is not None:
        vd = v.cast("array<double>")
        qd = query.cast("array<double>")
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.get(vd, i) * F.get(qd, i)
        return acc
    prods = F.zip_with(v.cast("array<double>"), query, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine_distance(vec_col: Column | str, query: Column | list[float]) -> Column:
    """Cosine distance = 1 - dot, assuming unit-norm inputs — the invariant
    the reference guarantees at encode time (embedding_models.py:122)."""
    return F.lit(1.0) - dot(vec_col, query)


def sum_of_squares_distance(
    vec_col: Column | str, query: Column | list[float]
) -> Column:
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if isinstance(query, (list, tuple)):
        vd = v.cast("array<double>")
        acc = F.lit(0.0)
        for i, q in enumerate(query):
            diff = F.get(vd, i) - F.lit(float(q))
            acc = acc + diff * diff
        return acc
    diffs = F.zip_with(v.cast("array<double>"), query, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_distance(vec_col: Column | str, query: Column | list[float]) -> Column:
    return F.sqrt(sum_of_squares_distance(vec_col, query))


def inner_product(vec_col: Column | str, query: Column | list[float]) -> Column:
    return dot(vec_col, query)


def distance_expr(
    metric: str, vec_col: Column | str, query: Column | list[float]
) -> Column:
    """Distance for one stored metric (vector_db_creator.py:210 fixes cosine
    at build time; the query path dispatches on the sidecar value)."""
    if metric == "cosine":
        return cosine_distance(vec_col, query)
    if metric == "l2":
        return l2_distance(vec_col, query)
    if metric == "sum_of_squares":
        return sum_of_squares_distance(vec_col, query)
    if metric == "inner_product":
        return inner_product(vec_col, query)
    # "unknown metric" branch: callers still need a distance; reference
    # only defines the conversion (1 - d^2/2), distances come from the
    # index. We model unknown metrics as cosine distance.
    return cosine_distance(vec_col, query)


def clip01(col: Column) -> Column:
    """np.clip(x, 0.0, 1.0) (vector_db_query.py:172-186)."""
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), col))


def similarity_expr(metric: str, d: Column, dmin: Column, dmax: Column) -> Column:
    """Distance -> similarity conversion, exact parity with
    ``/root/reference/vector_db_query.py:170-202``.

    ``dmin``/``dmax`` are aggregates over the *raw top-k result set* (before
    threshold filtering) — the reference computes np.min/np.max over the
    returned distance arrays, so the conversion is result-set-relative for
    every metric except cosine (SURVEY.md §7 hard-part #1).
    """
    if metric == "cosine":
        return clip01(F.lit(1.0) - d)
    if metric in ("l2", "sum_of_squares"):
        return clip01(
            F.when(dmax > F.lit(0.0), F.lit(1.0) - d / dmax).otherwise(F.lit(1.0))
        )
    if metric == "inner_product":
        # min-max rescale, NO clip (vector_db_query.py:188-197)
        return F.when(dmax > dmin, (d - dmin) / (dmax - dmin)).otherwise(F.lit(1.0))
    # unknown metric fallback (vector_db_query.py:199-202)
    return clip01(F.lit(1.0) - (d * d) / F.lit(2.0))
