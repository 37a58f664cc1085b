"""PII detection and redaction for training-data pipelines.

Before text reaches a training corpus, emails / IPs / phone numbers /
SSNs must be stripped (compliance) and counted (corpus health metrics).
Both are pure ``regexp_extract_all`` / ``regexp_replace`` column
expressions — JVM-side, whole-stage codegen, zero shuffles, and the
patterns are written in the regex subset Java and RE2 share so the same
strings drive the DuckDB oracle.

At 100 TB this is the cheapest kind of operator: a map-only pass whose
cost is one regex automaton scan per pattern per row; it pipelines into
whatever shuffle follows without adding one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement). Order matters: structured long forms
# (email, credit card, SSN) are replaced before the looser phone / IPv4
# patterns so a longer match is never partially consumed by a shorter
# one. Patterns avoid lookaround and backreferences — the Java/RE2
# common subset — so one string serves Spark and the SQL oracle.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "cc": (r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(text: Column, patterns: dict[str, tuple[str, str]] | None = None) -> dict[str, Column]:
    """Per-pattern match counts on the ORIGINAL text (counts are
    independent per pattern; a token matching two patterns counts in
    both — documented, deterministic, and what a corpus-health report
    wants)."""
    pats = patterns or PII_PATTERNS
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, (pat, _) in pats.items()
    }


def redact_text(text: Column, patterns: dict[str, tuple[str, str]] | None = None) -> Column:
    """Sequential redaction in PII_PATTERNS order; each pattern's
    matches are replaced globally before the next pattern runs."""
    pats = patterns or PII_PATTERNS
    out = text
    for pat, repl in pats.values():
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Append per-pattern counts (``n_<name>``), a ``pii_total``, and the
    redacted text (``text_redacted``) to every row."""
    pats = patterns or PII_PATTERNS
    counts = pii_counts(F.col(text_col), pats)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        "*",
        *[c.cast("long").alias(f"n_{name}") for name, c in counts.items()],
        total.cast("long").alias("pii_total"),
        redact_text(F.col(text_col), pats).alias("text_redacted"),
    )
