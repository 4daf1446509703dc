"""PII scanning / redaction over text columns.

A training-data pipeline scrubs personally-identifiable information
before anything else touches the corpus.  Both scan and redact are pure
``Column`` expressions (``regexp_count`` / ``regexp_replace`` run inside
whole-stage codegen), so at 100 TB this is a single embarrassingly
parallel scan — no shuffle, no UDF, no driver state.

The patterns deliberately stay inside the regex subset with identical
semantics in Java (Spark) and RE2 (DuckDB): character classes, bounded
repetition, ``\\b`` word boundaries — no lookarounds, no backreferences
— so every scan is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: matched on the LOWERCASED text (callers pass ``F.lower(col)``)
EMAIL_RE = r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
#: 8+ digit runs allowing separators — deliberately broad (recall over
#: precision: a scrubber prefers false redactions to leaked numbers)
PHONE_RE = r"\+?[0-9][0-9\- ]{6,}[0-9]"

#: scan/redact order matters: IPs are redacted before phones so a
#: dotted quad is never half-eaten by the digit-run pattern
PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "phone": PHONE_RE,
}


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """Per-row match counts, one column per pattern kind."""
    lowered = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    return {
        f"n_{kind}": F.regexp_count(lowered, F.lit(pat))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text_col: Column | str) -> Column:
    """Text with every PII match replaced by a ``[KIND]`` token.

    Patterns apply in :data:`PII_PATTERNS` order on the lowercased text
    (scrubbed corpora are normalized anyway; keeping original case would
    need case-insensitive flags with engine-specific syntax).
    """
    out = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def pii_counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twin of :func:`pii_counts` over ``text_expr`` (already
    lowercased by the caller)."""
    return {
        f"n_{kind}": f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for kind, pat in PII_PATTERNS.items()
    }
