"""Shared literals/fragments for DuckDB oracle SQL.

Every fragment mirrors the corresponding Catalyst expression operation-for-
operation so doubles come out bit-identical (see functions/vector.py).
"""

from __future__ import annotations

from ..functions.vector import default_query_vector

QUERY_VEC = default_query_vector(dim=64, seed=7)


def vec_sql(vec: list[float]) -> str:
    """Float literals go through VARCHAR: DuckDB parses bare numeric
    literals as DECIMAL first, and the DECIMAL->DOUBLE conversion double-
    rounds some 17-digit values (found live: 0.20412414523193154 parses to
    a neighboring double in a bare list literal but exactly via
    '0.20412414523193154'::DOUBLE)."""
    return "[" + ", ".join(f"'{float(v)!r}'" for v in vec) + "]::DOUBLE[]"


QUERY_VEC_SQL = vec_sql(QUERY_VEC)


def dot_sql(expr: str, q_sql: str = QUERY_VEC_SQL) -> str:
    """Left-to-right fold — same IEEE op order as F.aggregate(zip_with(...))."""
    return (
        f"list_reduce(list_transform(list_zip({expr}::DOUBLE[], {q_sql}), "
        f"s -> s[1] * s[2]), (a, b) -> a + b)"
    )


def sumsq_sql(expr: str, q_sql: str = QUERY_VEC_SQL) -> str:
    return (
        f"list_reduce(list_transform(list_zip({expr}::DOUBLE[], {q_sql}), "
        f"s -> (s[1] - s[2]) * (s[1] - s[2])), (a, b) -> a + b)"
    )


def clip01_sql(expr: str) -> str:
    return f"greatest(0.0, least(1.0, {expr}))"
