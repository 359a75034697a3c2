"""PII detection / redaction for training corpora (LLM-pipeline
extension; no counterpart in the reference).

Regex families are restricted to syntax RE2 and Java regex share
(no lookarounds, no backrefs), so the DuckDB oracle reproduces Spark's
matches exactly. Everything is ``regexp_replace``/``regexp_count``
Column expressions — whole-stage codegen, one pass over the text, no
shuffle: redaction runs at scan speed, which is what makes it viable as
a default stage at corpus scale.

Pattern order matters and is fixed: emails first (their local part can
contain digit runs), then IPs (dotted quads would otherwise feed the
phone pattern), then SSNs (3-2-4 grouping), then phones (3-3-4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — applied in order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> Column:
    """Struct of per-kind match counts (n_email, n_ip, n_ssn, n_phone).

    Counted in the same masking order as ``scrub_pii`` (each kind counts
    on text with the previous kinds already redacted), so counts and
    redactions always agree — an IP inside an email never double-counts.
    """
    text = _c(col)
    fields = []
    for kind, pat, repl in PII_PATTERNS:
        fields.append(F.regexp_count(text, F.lit(pat)).cast("long")
                      .alias(f"n_{kind}"))
        text = F.regexp_replace(text, pat, repl)
    return F.struct(*fields)


def scrub_pii(col: Column | str) -> Column:
    """Redact every PII family to its typed token (<EMAIL>, <IP>,
    <SSN>, <PHONE>), in the documented order."""
    text = _c(col)
    for _, pat, repl in PII_PATTERNS:
        text = F.regexp_replace(text, pat, repl)
    return text
