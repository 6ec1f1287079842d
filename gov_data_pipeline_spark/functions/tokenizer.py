"""Tokenizer-aware token counting for curation budgets (SURVEY L8,
round-8 surface extension).

The packing (q149/q86) and mixture (q139/q146) operators budget on
chars or whitespace tokens; a real training pipeline budgets on what
its TOKENIZER counts. Real tokenizers are Python libraries, so the
honest integration shape is exactly the ``llm_map`` one: an
Arrow-batched pandas UDF in the plan where the library call would go,
with a deterministic mock vocabulary standing in for the learned
merges so every count stays oracle-checkable end-to-end.

The mock scheme keeps BPE's structure — a vocabulary hit costs one
token, anything else falls back to fixed-width subword chunks:

- words are maximal runs of ``[^ \\t\\n\\f\\r]`` (the explicit char
  class is IDENTICAL in Python ``re`` and DuckDB's RE2 — no ``\\s``
  class-membership drift, no trim semantics);
- a word is "in vocabulary" iff its md5 hex digest starts with
  ``0/1/2/3`` (a deterministic, engine-agnostic 25% sample of word
  space — the mock-seeding trick the llm_map fake model uses);
- out-of-vocabulary words cost ``ceil(chars / 4)`` tokens (codepoint
  length — Python ``len`` and DuckDB ``length`` agree on every
  codepoint class, including astral emoji and combining marks);
- NULL text counts 0 (no tokens), matching the oracle's
  ``coalesce(list_sum(...), 0)`` twin.

Swapping in a real tokenizer = replacing ``_count_one`` with the
library call; the plan shape (one Arrow batch crossing, native
everything else) is already the production one.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import TYPE_CHECKING

from pyspark.sql import Column, functions as F, types as T

if TYPE_CHECKING:  # pandas only at UDF-construction/executor time
    import pandas as pd

_WORD_RE = re.compile(r"[^ \t\n\f\r]+")

# DuckDB twin of the whole count (kept next to the implementation so
# the two halves of the contract can't drift apart silently):
MOCK_BPE_SQL = (
    "coalesce(list_sum(list_transform("
    "regexp_extract_all({col}, '[^ \\t\\n\\f\\r]+'), "
    "w -> CASE WHEN substr(md5(w), 1, 1) IN ('0','1','2','3') THEN 1 "
    "ELSE CAST(ceil(length(w) / 4.0) AS BIGINT) END)), 0)"
)


def _count_one(text: str | None) -> int:
    if text is None:
        return 0
    n = 0
    for w in _WORD_RE.findall(text):
        h = hashlib.md5(w.encode("utf-8")).hexdigest()
        n += 1 if h[0] in "0123" else math.ceil(len(w) / 4)
    return n


_UDF_CACHE: list = []


# ---------------------------------------------------------------------------
# REAL-TOKENIZER ADAPTER (r10 verdict item #6). The mock above stays
# the t2 default (oracle-exact, zero external state); this half loads
# an ACTUAL BPE vocabulary in the tiktoken mergeable-ranks file format
# (`base64(token_bytes) rank` per line — the public format of
# cl100k_base.tiktoken et al.) and counts tokens with the real
# byte-pair-merge algorithm: per word, start from single bytes and
# repeatedly merge the adjacent pair whose CONCATENATION has the
# lowest rank in the table (ties: leftmost), until no adjacent
# concatenation is in the vocabulary. That is tiktoken's
# byte_pair_merge loop (public algorithm; openai/tiktoken README) —
# so token budgets driven by q153-style packing can use the counts a
# real training run would see instead of the mock's ceil(len/4).
#
# Pre-tokenization stays this module's word splitter ([^ \t\n\f\r]+):
# the exotic cl100k split regex needs the `regex` module (possessive
# quantifiers) which this runtime doesn't ship, and keeping the
# splitter shared with the mock is what makes the mock-vs-real BUDGET
# DRIFT measurable as a pure vocabulary effect (q193 reports it).
# ---------------------------------------------------------------------------


def load_mergeable_ranks(path: str) -> dict[bytes, int]:
    """Parse a tiktoken-format mergeable-ranks file: one
    ``base64(token_bytes) <space> rank`` pair per line, blank lines
    ignored. Returns {token_bytes: rank}."""
    import base64

    ranks: dict[bytes, int] = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split()
            ranks[base64.b64decode(tok_b64)] = int(rank)
    return ranks


def dump_mergeable_ranks(ranks: dict[bytes, int], path: str) -> None:
    """Write ``ranks`` in the tiktoken file format (the inverse of
    ``load_mergeable_ranks``) — rank-ordered for a stable file."""
    import base64

    with open(path, "wb") as f:
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")


def synthetic_mergeable_ranks(n_ranks: int = 50304) -> dict[bytes, int]:
    """Deterministic production-SIZED mergeable-ranks table for
    throughput evidence (r12 verdict item: the q193/q195 oracles run a
    30-entry fixture table, so the per-word merge loop — the
    pipeline's one per-token Python cost — was never measured at a
    realistic vocabulary). Mimics the tiktoken table shape without
    shipping a real model file:

    - ranks 0-255: the 256 single bytes (every real table starts so);
    - then every [a-z] 2-gram (676), every 3-gram (17 576), then
      4-grams, each tier ordered by md5(token) — deterministic but
      structureless, like learned merge order — until ``n_ranks``.

    With all 2/3-grams present, every adjacent letter pair merges and
    most longer spans cascade, so the merge loop's iteration count per
    word matches a real English vocabulary's regime (words collapse to
    ~len/3-len/4 tokens) instead of the 30-entry fixture's mostly-miss
    fast path. Default 50 304 = the GPT-2 vocab size rounded to the
    common 128-multiple convention. scripts/bpe_scale_bench.py
    round-trips this table through dump/load_mergeable_ranks (the
    tiktoken file format) and measures counting + packing throughput
    at sf1.0; SCALE.md records the numbers."""
    import itertools

    if n_ranks < 256:
        raise ValueError(
            f"synthetic_mergeable_ranks: n_ranks must be >= 256 (the "
            f"single-byte base tier every tiktoken-shaped table starts "
            f"with), got {n_ranks}"
        )
    ranks: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    rank = 256
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for length in (2, 3, 4):
        if rank >= n_ranks:
            break
        toks = ["".join(t) for t in itertools.product(alpha, repeat=length)]
        toks.sort(
            key=lambda t: hashlib.md5(t.encode("ascii")).hexdigest()
        )
        for t in toks:
            if rank >= n_ranks:
                break
            ranks[t.encode("ascii")] = rank
            rank += 1
    return ranks


def bpe_token_count(col: Column, ranks: dict[bytes, int]) -> Column:
    """Token count of ``col`` under a REAL mergeable-ranks BPE
    vocabulary (tiktoken semantics — see the adapter note above), one
    Arrow-batched crossing, NULL counts 0 like the mock.

    ``ranks`` ships inside the UDF closure (cloudpickled by value, so
    executors never import this package): a full 100k-token vocabulary
    is a few MB, deserialized once per long-lived Python worker — the
    same cost model as a broadcast without the extra moving part. The
    single-byte base tokens need not be present in ``ranks``; a word
    none of whose adjacent concatenations appear costs len(bytes)
    tokens (everything stays unmerged)."""
    import pandas

    globals()["pd"] = pandas

    @F.pandas_udf(T.LongType())
    def _bpe_count(s: "pd.Series") -> "pd.Series":
        # import + regex compile ONCE PER ARROW BATCH, not per row
        # (review-caught r11) — the closure still ships by value with
        # only stdlib references, so executors never import the package
        import re as _re

        word_re = _re.compile(r"[^ \t\n\f\r]+")
        # Per-batch DISTINCT-WORD memo (r13, guide §4.2): the merge
        # loop is the kernel's only O(len²·merges) cost and natural
        # text repeats words heavily, so each distinct word pays the
        # loop once per Arrow batch and every repeat is a dict hit.
        # Bounded by the batch's distinct-word count; identical counts
        # (the loop is a pure function of the word bytes).
        memo: dict = {}

        def word_count(wb):
            n = memo.get(wb)
            if n is not None:
                return n
            parts = [wb[i:i + 1] for i in range(len(wb))]
            while len(parts) >= 2:
                best_rank = None
                best_i = -1
                for i in range(len(parts) - 1):
                    r = ranks.get(parts[i] + parts[i + 1])
                    if r is not None and (
                        best_rank is None or r < best_rank
                    ):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                parts[best_i:best_i + 2] = [
                    parts[best_i] + parts[best_i + 1]
                ]
            n = len(parts)
            memo[wb] = n
            return n

        def count_one(text):
            if text is None:
                return 0
            n = 0
            for w in word_re.findall(text):
                n += word_count(w.encode("utf-8"))
            return n

        return s.map(count_one).astype("int64")

    return _bpe_count(col)


def mock_bpe_token_count(col: Column) -> Column:
    """Token count of ``col`` under the deterministic mock-BPE scheme
    (one Arrow-batched crossing; see module docstring for the scheme
    and its exact DuckDB twin in ``MOCK_BPE_SQL``).

    The pandas UDF is built lazily on first call (and memoized):
    decorating at import time would make merely LISTING the query
    registry import pandas/pyarrow — every other Python-stage module
    here defers pandas to call time (review finding)."""
    if not _UDF_CACHE:
        # pandas_udf resolves the (stringified, thanks to `from
        # __future__ import annotations`) type hints against MODULE
        # globals — bind pd there now that we genuinely need it
        import pandas

        globals()["pd"] = pandas
        # The counting logic is NESTED (stdlib-only closure) so
        # cloudpickle ships the whole UDF BY VALUE: any reference to a
        # module-level function pickles as an import of
        # gov_data_pipeline_spark, which executors can't satisfy when
        # the driver runs outside the repo root / without --py-files
        # (measured: ModuleNotFoundError on the workers). Must stay
        # semantically identical to `_count_one` above (the property
        # test's model) — same regex, same md5 nibble, same ceil.
        @F.pandas_udf(T.LongType())
        def _mock_bpe_count(s: "pd.Series") -> "pd.Series":
            # import + regex compile ONCE PER ARROW BATCH, not per row
            # (review-caught r11, same fix as bpe_token_count)
            import hashlib as _hl
            import math as _m
            import re as _re

            word_re = _re.compile(r"[^ \t\n\f\r]+")
            # per-batch distinct-word memo (r13) — same rationale as
            # bpe_token_count's: one md5 per distinct word per batch
            memo: dict = {}

            def count_one(text):
                if text is None:
                    return 0
                n = 0
                for w in word_re.findall(text):
                    c = memo.get(w)
                    if c is None:
                        h = _hl.md5(w.encode("utf-8")).hexdigest()
                        c = 1 if h[0] in "0123" else _m.ceil(len(w) / 4)
                        memo[w] = c
                    n += c
                return n

            return s.map(count_one).astype("int64")

        _UDF_CACHE.append(_mock_bpe_count)
    return _UDF_CACHE[0](col)
