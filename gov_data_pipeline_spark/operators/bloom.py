"""Relational Bloom filter — a broadcastable membership prefilter
built and probed entirely with column expressions.

Why it exists: the decontamination / membership operators (q87 family)
broadcast the small side's *values*. That works while the benchmark
n-gram set fits in a broadcast as strings, but a large eval suite's
13-gram set can reach tens of GB — too big to broadcast, while a
classic Bloom filter over it is megabytes. Spark has no public column
form of this: ``DataFrameStatFunctions.bloomFilter`` materializes a
sketch object on the DRIVER whose ``mightContain`` is a Python/JVM
method, not an expression, and ``bloom_filter_agg`` / ``might_contain``
are internal runtime-filter expressions not exposed as SQL routines
(probed: UNRESOLVED_ROUTINE on Spark 4.1). So this module re-expresses
the same structure relationally:

- the BIT ARRAY is a DataFrame of ``(word, bits)`` rows — position
  ``p`` lives in 64-bit word ``p div 64`` — built with one
  ``bit_or`` aggregate over the k hash positions of every value;
- the PROBE is k broadcast equi-joins on the word index plus a bitwise
  AND, all inside whole-stage codegen. A value survives only if all k
  bits are set; missing words drop out via the inner join itself.

Sizing: the bitset is at most ``num_bits / 8`` bytes of payload
(``num_bits/64`` rows x 12 bytes); at the default 2^20 bits that is
128 KiB regardless of how many values were inserted. False-positive
rate follows the standard ``(1 - e^(-k*n/m))^k``; callers that need
exactness verify survivors with an exact join afterwards (the filter
guarantees NO FALSE NEGATIVES, so verification only ever removes rows).

Hash family: ``xxhash64(lit(i), value)`` — the per-hash literal seed
column makes the k hashes independent; this is the engine's scale
family (the oracle-checked queries built on top never need to mirror
the filter, because their verify step makes the final result exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 2


def _positions(value: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of ``value``, each in [0, num_bits)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), value), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    value: Column,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate ``value`` into a Bloom bitset: ``(word int, bits long)``.

    One narrow projection (k positions per row, exploded) feeding one
    ``bit_or`` aggregate — the partial aggregation ORs words map-side,
    so the shuffle carries at most ``num_bits/64`` rows per partition
    no matter how many values are inserted. NULL values insert nothing.
    """
    pos = F.explode(F.array(*_positions(value, num_bits, num_hashes))).alias("__p")
    return (
        df.where(value.isNotNull())
        .select(pos)
        .select(
            (F.col("__p") / 64).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__m)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    value: Column,
    bitset: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only rows whose ``value`` the Bloom filter might contain.

    k broadcast hash joins on the word index + bit tests; rows whose
    word is absent from the bitset fall out of the inner join (absent
    word == all bits zero). Never drops a truly-inserted value; passes
    false positives at the filter's documented rate. NULL values are
    dropped (membership of NULL is undefined — insert side skips them
    too). ``num_bits``/``num_hashes`` must match the build call.
    """
    cols = list(df.columns)
    out = df.where(value.isNotNull())
    for i, pos in enumerate(_positions(value, num_bits, num_hashes)):
        w, b, p = f"__bw{i}", f"__bb{i}", f"__bp{i}"
        side = F.broadcast(
            bitset.select(F.col("word").alias(w), F.col("bits").alias(b))
        )
        out = (
            out.withColumn(p, pos)
            .join(side, (F.col(p) / 64).cast("int") == F.col(w), "inner")
            .where(
                F.expr(
                    f"({b} & shiftleft(CAST(1 AS BIGINT),"
                    f" CAST({p} % 64 AS INT))) != 0"
                )
            )
        )
    return out.select(*cols)
