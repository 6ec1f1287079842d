"""Deterministic text embeddings — the native featurizer that stands
in for a neural encoder in tests/oracles, and the plumbing contract a
real encoder drops into.

``hash_embedding_col`` builds a dim-component vector entirely in
codegen'd expressions: component j = (md5_int(text ':' j) % 2000 -
1000) / 1000 ∈ [-1, 1). It is NOT a semantic embedding — it is the
deterministic, engine-reproducible stand-in that lets the full
text → embed → ANN pipeline be value-hash-checked against DuckDB
(mirror: ``('0x' || substr(md5(text || ':' || j), 1, 8))::BIGINT``).

A real encoder replaces this with an Arrow-batched ``mapInPandas``
(text batches in, ``array<float>`` out — the ``llm/runtime.llm_map``
batching pattern with an embeddings endpoint); every downstream
operator (``cosine_topk``, ``ann_topk``, ``lsh_cosine_pairs``,
``ivf_topk``) consumes the column identically.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash_embedding_col(text: Column, dim: int = 8) -> Column:
    """dim-component deterministic embedding of ``text`` as
    array<double>, each component an exact multiple of 1/1000 (so
    cross-engine float parity is exact, not ulp-dependent)."""
    comps = [
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(text, F.lit(f":{j}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 2000
                - 1000
            ).cast("double")
            / 1000.0
        )
        for j in range(dim)
    ]
    return F.array(*comps)
