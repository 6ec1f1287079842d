"""PII scrubbing for corpus preparation.

A training-data pipeline must strip personally identifiable
information before text reaches a training corpus. The reference
pipeline handles government registry data (names, registration
numbers) but never ships raw contact data downstream; at 100 TB the
same requirement becomes a bulk regex pass over every document.

Everything here is a native column expression (``regexp_replace`` /
``regexp_count``), so the scrub runs inside whole-stage codegen — no
Python crossing, no shuffle: a pure projection that Catalyst pushes
wherever the scan is.

Pattern dialect: the subset of regex that Java (Spark) and RE2
(DuckDB oracle) interpret identically — character classes, bounded
repetition, word boundaries; no lookaround, no backreferences. The
DuckDB mirrors live next to the q90 oracle in
``queries/quality.py``.

Redaction order is part of the contract: CARD before PHONE (a 16-digit
run also matches the looser phone pattern; scrubbing cards first makes
the outcome order-independent), EMAIL before PHONE (phone-like digit
runs inside an email local part disappear with the email). Counts are
taken on the ORIGINAL text per class, so they report what each class
matched before any rewriting.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Class name -> (pattern, replacement token). Insertion order IS the
# application order (see module docstring).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # local@domain.tld — ASCII mailbox shape, 2+ letter TLD
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    # 16-digit PAN run (space/dash separated quartets or contiguous)
    "card": (
        r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b",
        "[CARD]",
    ),
    # international-ish phone: optional +, then 9-14 digits with
    # optional single space/dash separators, ending in a digit
    "phone": (
        r"\+?\d(?:[ -]?\d){8,13}",
        "[PHONE]",
    ),
    # dotted-quad IPv4
    "ipv4": (
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
}


def pii_redact_col(text: Column) -> Column:
    """Apply the full redaction chain to ``text`` (codegen'd)."""
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count_col(text: Column, kind: str) -> Column:
    """Occurrences of one PII class in the ORIGINAL text.

    Counted before any redaction, so classes whose patterns overlap
    (card vs phone) each report their own raw match count.
    """
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(text, F.lit(pattern))
