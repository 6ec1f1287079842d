"""Build an id-shifted xN replica of a testdata SF directory (the
sf1.0 stand-in for scale curves; /root/testdata is read-only so the
driver's fixtures cannot simply be regenerated bigger).

Semantics of the multiplication (what keeps the curves honest):

- Every copy k shifts the PK/FK id spaces consistently (lineitem's
  l_orderkey moves with orders.o_orderkey, etc.), so join fan-outs and
  group cardinalities scale linearly — the regime a real corpus is in.
- region/nation stay fixed: TPC-H scales facts, not geography; the
  broadcast-dim pattern must stay broadcast-sized at every SF.
- documents: per-copy vowel rotation of the text (translate — one
  cheap codegen pass) makes cross-copy texts distinct, holding
  duplicate/near-dup DENSITY constant. A naive text copy would plant
  a 10-member exact-dup clique per document, and pair-output volume
  would grow quadratically in copies — measuring that measures the
  corruption, not the operator.
- embeddings: per-copy cyclic rotation of the vector (norm-preserving,
  distinct directions) for the same reason, vs 10x identical vectors
  stacking every LSH bucket.
- events: ids shift, timestamps stay — hourly windows get denser, the
  window count does not change (matching how traffic actually grows).

Usage: python scripts/make_scaled_sf.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from gov_data_pipeline_spark.catalog import read_table
from gov_data_pipeline_spark.session import get_spark

# id shift per copy, comfortably past every fixture id range
OFF = 1_000_000_000

SHIFT_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

VOWELS = "aeiou"


def _mutate(table: str, df: DataFrame, k: int) -> DataFrame:
    for c in SHIFT_COLS.get(table, []):
        df = df.withColumn(c, F.col(c) + F.lit(k * OFF))
    if table == "documents" and k > 0:
        rot = VOWELS[k % 5 :] + VOWELS[: k % 5]
        df = df.withColumn("text", F.translate("text", VOWELS, rot))
    if table == "embeddings" and k > 0:
        # rotate by k positions — k must stay below the vector width or
        # two copies would share a rotation and plant exact cross-copy
        # vector twins (k=8 ≡ k=0 under a %8 was exactly that bug:
        # +40% spurious near-dup pairs at factor 10)
        n = F.size("embedding")
        r = F.lit(k)
        df = df.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", r + 1, n - r),
                F.slice("embedding", 1, r),
            ),
        )
    return df


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make_scaled_sf")
    # Rotation by k only yields `factor` DISTINCT vector directions when
    # k < dim for every copy: k == dim silently reproduces the k=0
    # vectors (planting exact cross-copy twins — the bug the _mutate
    # comment warns about) and k > dim crashes F.slice with a negative
    # length. Fail loudly up front instead.
    dim = spark.read.parquet(f"{src}/embeddings.parquet").select(
        F.size("embedding")
    ).first()[0]
    if factor > dim:
        raise SystemExit(
            f"factor {factor} exceeds embedding dim {dim}: copies k and "
            f"k%{dim} would share a rotation (exact cross-copy vector twins)"
        )
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        base = read_table(spark, src, t)
        if t in ("region", "nation"):
            out = base
        else:
            out = _mutate(t, base, 0)
            for k in range(1, factor):
                out = out.unionByName(_mutate(t, base, k))
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(t, "rows:", spark.read.parquet(f"{dst}/{t}.parquet").count())


if __name__ == "__main__":
    main()
