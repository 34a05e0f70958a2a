"""PII detection and redaction over text columns.

Training-data pipelines scrub personally identifiable information before
anything else sees the corpus. These are pure Catalyst regex expressions —
JVM-side, whole-stage-codegen, zero shuffles, linear in corpus size — so the
scrub is a narrow map that composes with any downstream operator.

Pattern syntax is restricted to the Java-regex / RE2 common subset (no
lookaround, no backreferences, ASCII ``\\d``) so the DuckDB oracles match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies patterns in this sequence on both engines.
# SSN before phone: both are digit-dash shapes and must not interleave.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_counts(text_col: str) -> dict[str, Column]:
    """Per-kind occurrence counts (``n_email``, ``n_ssn``, ...)."""
    col = F.col(text_col)
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_expr(text_col: str) -> Column:
    """Text with every PII match replaced by its placeholder, patterns
    applied in PII_PATTERNS order (order matters for overlapping digit
    shapes and is mirrored verbatim in the oracles)."""
    col = F.col(text_col)
    for _, pat, placeholder in PII_PATTERNS:
        col = F.regexp_replace(col, pat, placeholder)
    return col


def scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, per-kind counts, has_pii flag, redacted text) for every row.
    Narrow projection — no shuffle, no Python."""
    counts = pii_counts(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in counts.items()],
        F.when(total > 0, 1).otherwise(0).alias("has_pii"),
        redact_expr(text_col).alias("redacted"),
    )


CC_CANDIDATE_PATTERN = r"\b\d{4}-\d{4}-\d{4}-\d{4}\b"


def luhn_valid(card: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) for a 16-digit card string in
    dddd-dddd-dddd-dddd form — the validation step that separates real
    card numbers from random 16-digit ids (a regex alone false-positives
    on order/tracking numbers). Fully unrolled integer expression: from
    the RIGHT, every second digit doubles (minus 9 when >9); valid iff
    the total is divisible by 10. Pure codegen arithmetic — engine-exact,
    usable inside higher-order lambdas on both engines."""
    digits = F.translate(card, "-", "")
    total = None
    for j in range(1, 17):  # 1-indexed from the left; 16 digits
        d = F.substring(digits, j, 1).cast("int")
        if j % 2 == 1:  # odd-from-left == even-from-right for length 16
            dd = d * 2
            term = F.when(dd > 9, dd - 9).otherwise(dd)
        else:
            term = d
        total = term if total is None else total + term
    return total % 10 == 0


def cc_detection(text_col: str) -> dict[str, Column]:
    """(n_cc_candidates, n_cc_valid): regex candidates vs Luhn-validated
    matches. The candidate list is materialized once; validation is a
    higher-order filter over it — no second regex pass."""
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(CC_CANDIDATE_PATTERN), F.lit(0)
    )
    return {
        "n_cc_candidates": F.size(cands),
        "n_cc_valid": F.size(F.filter(cands, luhn_valid)),
    }
