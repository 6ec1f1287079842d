"""Text-cleaning transforms carrying the reference's business semantics.

Each function re-expresses one reference scalar (see the file:line cite
in its docstring) as a Spark Column expression. Everything that plain
regex can express stays JVM-side (``F.regexp_replace`` chains compile
into whole-stage codegen); only NFKC normalization and the
Python-``\\w``-semantics character filter drop to an Arrow-batched
``pandas_udf`` — and only for the characters regex can't reach.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from gov_data_pipeline_spark.util import qcol

# Python str.strip() removes all whitespace (\t\n\r\f\v), Spark's trim()
# removes spaces only — so "strip" is expressed as a regex.
# (?U): Java UNICODE_CHARACTER_CLASS so \s/\d match like Python re
_STRIP = r"(?U)^\s+|\s+$"


def _strip(col: Column) -> Column:
    return F.regexp_replace(col, _STRIP, "")


def clean_cell_col(col: Column) -> Column:
    """``re.sub(r"\\s+", " ", cell.strip()) if cell else ""``.

    Reference: ``handlers/kyrgyzstan.py:169-174`` (also ``62-71``).
    Null and empty collapse to ``""``; interior whitespace runs collapse
    to one space.
    """
    cleaned = F.trim(F.regexp_replace(col, r"(?U)\s+", " "))
    return F.coalesce(cleaned, F.lit(""))


@F.pandas_udf(T.StringType())
def _nfkc_and_filter(s: pd.Series) -> pd.Series:
    """NFKC-normalize then drop chars outside ``[\\w\\s.,;:№-]``.

    The char class uses *Python* regex semantics (``\\w`` is
    Unicode-aware: Cyrillic and Latin letters, digits, underscore) to
    match the reference exactly; Java regex ``\\w`` is ASCII-only, so
    this half stays in Python. Reference: ``handlers/kazakhstan.py:158-168``.
    """

    def fix(v: str | None) -> str | None:
        if v is None:
            return None
        v = unicodedata.normalize("NFKC", v)
        return re.sub(r"[^\w\s\.,;:№\-]", "", v)

    return s.map(fix)


@F.pandas_udf(T.StringType())
def nfkc_normalize(s: pd.Series) -> pd.Series:
    """Plain NFKC normalization (SURVEY T29); no Spark builtin exists."""
    return s.map(lambda v: unicodedata.normalize("NFKC", v) if v is not None else None)


def clean_text_col(col: Column) -> Column:
    """The Kazakhstan ``clean_text`` scalar, reference
    ``handlers/kazakhstan.py:154-168``:

    1. strip; ``\\n`` -> space; drop ``\\r``;
    2. collapse ``\\s{2,}`` to one space;
    3. NFKC normalize;
    4. drop every char outside ``[\\w\\s.,;:№-]`` (Python ``\\w``);
    null -> ``""``.

    Steps 1-2 are native regexp (codegen); 3-4 are one Arrow-batched
    pandas_udf call.
    """
    t = _strip(col)
    t = F.regexp_replace(t, r"\n", " ")
    t = F.regexp_replace(t, r"\r", "")
    t = F.regexp_replace(t, r"(?U)\s{2,}", " ")
    return F.coalesce(_nfkc_and_filter(t), F.lit(""))


def normalize_reg_num_col(col: Column) -> Column:
    """The registration-number normalizer, all 10 rules in reference
    order (``handlers/kyrgyzstan.py:219-236``) — plain regex, so the
    whole chain is native and codegen'd:

    strip; drop leading ``№``; stabilize ``См.``; long dashes -> ``-``;
    tighten ``-`` ``/`` ``.``; close digit gaps; re-space ``См.``;
    collapse ``--``; collapse whitespace; strip.
    """
    v = _strip(col)
    rules: list[tuple[str, str]] = [
        (r"(?U)^№\s*", ""),
        (r"(?U)\s*См\.\s*", " См. "),
        (r"(?U)\s*[–—]\s*", "-"),
        (r"(?U)\s*-\s*", "-"),
        (r"(?U)\s*/\s*", "/"),
        (r"(?U)\s*\.\s*", "."),
        (r"(?U)(?<=\d)\s+(?=\d)", ""),
        (r"(?U)(См\.)\s*(?=\S)", "$1 "),
        (r"-{2,}", "-"),
        (r"(?U)\s+", " "),
    ]
    out = v
    for pat, rep in rules:
        out = F.regexp_replace(out, pat, rep)
    out = _strip(out)
    # Reference returns the stripped original when it strips to empty —
    # which is itself empty, so plain empty-string propagation is exact.
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(out)


# "исключен" as a standalone word: no Cyrillic letter directly before or
# after (rejects "исключение"), arbitrary whitespace between letters,
# ё folded to е, case-insensitive. Reference: utils/gpt.py:39-51.
_EXCLUDED_PATTERN = r"(?U)(?<![а-я])" + r"\s*".join("исключен") + r"(?![а-я])"


def is_excluded_col(*cols: Column | str) -> Column:
    """Row-level exclusion predicate over the concatenated row text.

    Reference: ``utils/gpt.py:39-51`` (predicate) and ``399-401`` (row
    concatenation). Lowercase approximates ``str.casefold`` exactly for
    the Cyrillic/Latin domain the reference handles.
    """
    row_text = F.concat_ws(" ", *[F.coalesce(qcol(c) if isinstance(c, str) else c, F.lit("")) for c in cols])
    normalized = F.regexp_replace(F.lower(row_text), "ё", "е")
    return normalized.rlike(_EXCLUDED_PATTERN)


def exclusion_flag_col(*cols: Column | str) -> Column:
    """The reference's ``Исключено`` column: ``Да``/``Нет``
    (``utils/gpt.py:398-406,447-448``)."""
    return F.when(is_excluded_col(*cols), F.lit("Да")).otherwise(F.lit("Нет"))


def strip_all_strings(df: DataFrame) -> DataFrame:
    """Trim every string column (reference ``handlers/belarus.py:117-119``)."""
    return df.select(
        *[
            _strip(qcol(c)).alias(c) if isinstance(df.schema[c].dataType, T.StringType) else qcol(c)
            for c in df.columns
        ]
    )


def cast_all_string(df: DataFrame) -> DataFrame:
    """Force every column to string (reference ``handlers/kyrgyzstan.py:273-281``)."""
    return df.select(*[qcol(c).cast("string").alias(c) for c in df.columns])


def redact_long_col(col: Column, max_len: int = 100, keep: int = 50) -> Column:
    """Log-redaction projection: long strings elided to ``head … tail``
    (reference ``utils/gpt.py:390-396``)."""
    return F.when(
        F.length(col) > max_len,
        F.concat(
            F.substring(col, 1, keep), F.lit(" ... "), F.substring(col, -keep, keep)
        ),
    ).otherwise(col)


# PII regex family. Cross-engine contract: explicit ASCII classes only
# (no \w, no \d ambiguity, no lookaround — RE2 lacks lookaround and the
# shorthand classes differ under Unicode flags between Java and RE2).
# Email: RFC-ish local@domain.tld with a 2+-letter TLD. IPv4: four
# 1-3-digit octets (no value-range check — a scrubber over-masking
# 999.999.999.999 costs nothing; under-masking a real IP does). Phone:
# an ordered alternation that requires a PHONE MARKER or enough
# digits — (a) a + country prefix, any grouping after it; (b) a
# parenthesized area code; (c) bare 3-3-4 with separators (NANP);
# (d) a bare space-separated {3,4} {3,4} {4} TRIPLE (>= 10 digits).
# A bare digit PAIR like 'pages 12 34', a dashed range '1990-1995', a
# date '2026-08-16', an adjacent year pair 'fiscal 2024 2025', and an
# ISBN fragment '978 0262' match NONE of the branches (review-caught
# r11/r12: earlier cuts masked any TWO number groups, destructively
# rewriting dates, page ranges and year pairs corpus-wide). A
# space-separated TRIPLE ending in 4 digits ('2024 2025 2026') does
# mask — >= 10 digits is the line where over-masking is the accepted
# posture; narrowing the first group to {3} would instead SPLIT the
# leading year ('2<PHONE>', regex can start mid-run without
# lookbehind), which corrupts rather than masks. Documented residual over-mask: a digit run ADJACENT
# to a real marker form can partially match — '1234-567-8901' masks
# as '1<PHONE>' via branch (c) — accepted scrubber posture (prefer
# over-masking near phone-shaped spans; boundary guards would need
# capture-group replacements whose backreference syntax differs
# between Java regex ($1) and RE2 (\\1), breaking the shared-pattern
# oracle contract, and would under-mask adjacent phones separated by
# one char). Pinned in tests/test_transforms.py. Order matters across
# families: emails first (their local parts can contain digits a
# phone pattern might nibble), then IPs, then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "phone",
        r"(?:\+[0-9]{1,3}[ -]?(?:\([0-9]{2,4}\)[ -]?)?[0-9]{2,4}(?:[ -]?[0-9]{2,4}){1,3}"
        r"|\([0-9]{2,4}\)[ -]?[0-9]{3,4}(?:[ -][0-9]{3,4}){0,2}"
        r"|[0-9]{3}[ -][0-9]{3}[ -][0-9]{4}"
        r"|[0-9]{3,4} [0-9]{3,4} [0-9]{4})",
        "<PHONE>",
    ),
)


def scrub_pii_col(col: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Mask PII spans in ``col`` with typed placeholder tokens — the
    pre-training scrub step every published curation pipeline runs
    before anything else sees the text (emails/IPs/phones are the
    Dolma/RedPajama core set). Pure codegen'd ``regexp_replace`` chain
    (one pass per kind, no UDF); patterns are lookaround-free explicit
    ASCII classes, identical in Java regex and RE2, so the DuckDB
    oracle (q194) reproduces the masked text byte-for-byte.

    ``kinds`` restricts/reorders the families (default ``None`` = all
    of ``PII_PATTERNS`` in its order — email before IP before phone,
    so a digit-bearing email local part is masked before the phone
    pattern can nibble it); an explicit empty tuple is a no-op, and an
    unknown kind raises ValueError naming the valid ones (not a bare
    KeyError). Counting the masked spans is
    ``pii_count_col(col, kind)`` — same pattern, ``regexp_count``."""
    wanted = {k: (p, r) for k, p, r in PII_PATTERNS}
    if kinds is None:
        kinds = tuple(wanted)
    unknown = [k for k in kinds if k not in wanted]
    if unknown:
        raise ValueError(
            f"unknown PII kind(s) {unknown}; valid: {sorted(wanted)}"
        )
    out = col
    for kind in kinds:
        pat, repl = wanted[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count_col(col: Column, kind: str) -> Column:
    """Occurrence count of one PII family (see ``PII_PATTERNS``) —
    the audit metric beside the scrub. NOTE: counts are per family on
    the ORIGINAL text; because the scrub applies families in order, a
    span matched by two families masks once but counts in both —
    don't sum families and call it "spans masked"."""
    pats = {k: p for k, p, _ in PII_PATTERNS}
    if kind not in pats:
        raise ValueError(
            f"unknown PII kind {kind!r}; valid: {sorted(pats)}"
        )
    return F.regexp_count(col, F.lit(pats[kind])).cast("long")


def canonical_text_col(col: Column, token_classes: str = "ascii") -> Column:
    """Canonical form for normalized ("fuzzy-exact") dedup, one of two
    cross-engine-exact contracts:

    - ``"ascii"`` (default): every run of characters outside
      [A-Za-z0-9] collapses to one space, THEN the survivors
      lowercase. Case/punctuation/whitespace variants of the same text
      — the near-miss duplicates a byte-exact content hash walks past
      — share one canonical key. The class strip runs BEFORE
      ``lower()`` deliberately: lowercasing only ever sees ASCII
      letters, so the result is bit-identical across engines even on
      adversarial Unicode (JVM and DuckDB disagree on exotic case
      mappings like İ, but both agree on A-Z — and everything
      non-ASCII is already gone by then). This is the English-ish
      C4/CCNet-style canonicalization — and it is BLIND outside Latin:
      a Cyrillic document canonicalizes to the empty string, so every
      Cyrillic document would share one key.
    - ``"unicode"``: runs outside ``\\p{L}\\p{N}`` (identical classes
      in Java regex and DuckDB RE2) collapse to one space, then case
      folds for ASCII ONLY (``translate`` A-Z → a-z — a 1:1 codepoint
      map both engines implement identically). Non-ASCII case is
      deliberately NOT folded (exotic case mappings differ between
      JVM and utf8proc), so non-Latin variants dedup on
      punctuation/whitespace/digit noise but stay case-sensitive —
      the documented, cross-engine-exact multilingual contract. For
      full Unicode case/compat folding, dedup on the NFKC-cleaned
      text (``clean_text_col``) and accept its documented DuckDB
      oracle boundary. BLIND spot: scripts with no separator
      characters (Han, kana, Thai) keep whole sentences as ONE token,
      so the key degenerates toward byte identity and a downstream
      word tokenizer sees ~1 feature per sentence — the ``"cjk"``
      mode exists for those.
    - ``"cjk"``: the unicode mode's strip + ASCII-only fold, plus
      every Han / Hiragana / Katakana / Thai character becomes its
      own space-delimited token (capture-replace ``(ch)`` → ``ch ``
      then whitespace re-collapse — NO lookaround, which RE2/DuckDB
      lacks). Two consequences: (a) the canonical key is robust to
      intra-sentence spacing variants of CJK text (``北京大学`` and
      ``北京 大学`` share a key — the CJK analogue of the Latin
      punctuation variants), and (b) a word tokenizer downstream sees
      characters as words, so the standard unigram+bigram feature
      machinery becomes char-1/2-grams — the standard CJK feature
      set. Latin/Cyrillic runs inside mixed text keep whole-word
      tokens. The Spark side names scripts Java-style
      (``\\p{IsHan}``); oracles use the RE2 spelling (``\\p{Han}``) —
      the same documented regex-dialect boundary as \\p{Alnum}.
    """
    if token_classes == "unicode":
        stripped = F.trim(F.regexp_replace(col, r"[^\p{L}\p{N}]+", " "))
        return F.translate(
            stripped,
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            "abcdefghijklmnopqrstuvwxyz",
        )
    if token_classes == "cjk":
        stripped = F.regexp_replace(col, r"[^\p{L}\p{N}]+", " ")
        # ONE capture-replace does split + collapse (r14, guide §1.2
        # per-task work): after the class strip no two spaces are
        # adjacent (each non-alnum run became exactly one space), so
        # the only double a bare ``(ch) -> "ch "`` insert can create is
        # ``ch`` immediately followed by an existing space — consuming
        # that optional space in the SAME match (``" ?"``) yields the
        # identical string and deletes the third full regex pass
        # (``" +" -> " "``) the previous form paid to clean it up.
        # Byte-equivalence to the 3-pass form is pinned by
        # tests/test_transforms.py::test_canonical_cjk_fused_equivalence.
        char_split = F.regexp_replace(
            stripped,
            r"([\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsThai}]) ?",
            "$1 ",
        )
        return F.translate(
            F.trim(char_split),
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            "abcdefghijklmnopqrstuvwxyz",
        )
    if token_classes != "ascii":
        raise ValueError(f"unknown token_classes: {token_classes!r}")
    # \p{Alnum} is Java's POSIX alnum — exactly [A-Za-z0-9] without the
    # UNICODE_CHARACTER_CLASS flag (Spark never sets it), asserted
    # equal on adversarial Unicode in tests. The property class is the
    # JVM fast path: the explicit 3-range class measured 2.6 s vs
    # 0.35 s for the identical strip over sf1.0 documents (7x — it was
    # the entire q164-vs-q167 gap, 20 s vs 4 s end-to-end). Oracles
    # keep '[^A-Za-z0-9]+': DuckDB is RE2, where the explicit class is
    # already fast and \p{Alnum} isn't a supported property name.
    return F.lower(F.trim(F.regexp_replace(col, r"[^\p{Alnum}]+", " ")))
