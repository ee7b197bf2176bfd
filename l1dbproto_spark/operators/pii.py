"""PII detection and redaction over text columns — the scrubbing stage a
training-data pipeline runs before anything else sees the raw crawl.

Both operators are pure column algebra (``regexp_count`` /
``regexp_replace`` — JVM-side, whole-stage codegen), so the 100 TB cost is
exactly one scan of the text column: no shuffle, no UDF, no state. The
patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — character classes, bounded repetition, ``\\b``
word boundaries — so the DuckDB oracle in tests/test_pii_quality.py reproduces
detection counts and redacted text byte-for-byte.

Pattern scope mirrors the usual first-pass scrubbers (email, NANP-style
phone, IPv4, US SSN). The list is a policy knob, not a closed set:
``redact_pii``/``pii_signals`` take an ordered mapping so deployments add
jurisdiction-specific patterns without touching the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies patterns in this order, and counting runs on
# the ORIGINAL text, so overlapping patterns (an IPv4 inside a longer
# dotted string) count per-pattern independently.
DEFAULT_PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, replacement token)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
}


def pii_signals(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document PII hit counts: one ``n_<name>`` long column per
    pattern plus ``n_pii`` (their sum) — all counted on the original text
    in a single projection. Order-independent and overlap-independent, so
    the counts are a stable audit signal even when patterns nest."""
    patterns = DEFAULT_PII_PATTERNS if patterns is None else patterns
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(rx)).cast("long")
        for name, (rx, _) in patterns.items()
    }
    out = docs
    total = F.lit(0).cast("long")
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c)
        total = total + F.col(f"n_{name}")
    return out.withColumn("n_pii", total)


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every PII match with its type token (``<EMAIL>`` etc.),
    applying patterns in mapping order — earlier patterns consume their
    matches before later ones run, the standard cascade (an email's host
    part can no longer be claimed by the IPv4 rule). Writes ``out_col``
    (default: in place). One projection; the cascade composes into a
    single generated expression."""
    patterns = DEFAULT_PII_PATTERNS if patterns is None else patterns
    expr = F.col(text_col)
    for _, (rx, token) in patterns.items():
        expr = F.regexp_replace(expr, rx, token)
    return docs.withColumn(out_col or text_col, expr)
