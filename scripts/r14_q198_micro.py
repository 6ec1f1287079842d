"""Where does q198's construction time go? (guide §1: measure first)

Times each stage of the q198 pin chain as a noop-sink write over the
sf0.1 documents, interleaved best-of-N:

  text     — derived mixed-script text only (translate + concat)
  label    — + the three script_count regexes + dominant_script
  canon    — text -> cjk canonical (the fused 2-pass form)
  feats    — the full hashed_token_features build (canonical + split +
             position explode + md5 feature hash + tf groupBy)
  nohash   — feats minus the md5 (xxhash64 feature ids instead):
             isolates the md5+conv term from the explode/groupBy term

Usage: python scripts/r14_q198_micro.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gov_data_pipeline_spark.catalog import read_table  # noqa: E402
from gov_data_pipeline_spark.functions.textstats import (  # noqa: E402
    dominant_script_col,
    script_count_col,
)
from gov_data_pipeline_spark.operators.scoring import (  # noqa: E402
    canonical_tokens_col,
    hashed_token_features,
)
from gov_data_pipeline_spark.session import get_spark  # noqa: E402

_LO = "abcdefghijklmnopqrstuvwxyz"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r14_q198_micro")

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.translate(F.col("text"), _LO, "абвгдежзийклмнопрстуфхцчшщ"),
            ).otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" 你好 世界 数据 42")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    t = F.col("text")

    # chained-strip counts: one pass keeps only the three classes, two
    # more passes over the (shorter) survivors peel latin then
    # cyrillic; counts come from length differences.  Exactly equal to
    # the three independent regexp_counts (classes are disjoint).
    s1 = F.regexp_replace(t, r"[^A-Za-z\p{IsCyrillic}\p{IsHan}]+", "")
    s2 = F.regexp_replace(s1, r"[A-Za-z]+", "")
    s3 = F.regexp_replace(s2, r"\p{IsCyrillic}+", "")
    n_all, n_23, n_han = F.length(s1), F.length(s2), F.length(s3)
    chained = docs.select(
        "doc_id",
        dominant_script_col(
            (n_all - n_23).cast("bigint"),
            (n_23 - n_han).cast("bigint"),
            n_han.cast("bigint"),
        ).alias("label"),
    )

    variants = {
        "text": docs,
        "label": docs.select(
            "doc_id",
            dominant_script_col(
                script_count_col(t, "latin"),
                script_count_col(t, "cyrillic"),
                script_count_col(t, "han"),
            ).alias("label"),
        ),
        "label_chained": chained,
        "canon": docs.select(
            "doc_id", canonical_tokens_col(t, "cjk").alias("c")
        ),
        "feats": hashed_token_features(
            docs, "doc_id", t, n_features=1 << 18,
            hash_family="md5", token_classes="cjk",
        ),
        "nohash": hashed_token_features(
            docs, "doc_id", t, n_features=1 << 18,
            hash_family="xxhash64", token_classes="cjk",
        ),
    }

    for name, df in variants.items():  # warm codegen once
        df.write.format("noop").mode("overwrite").save()
    results = {name: [] for name in variants}
    for _ in range(n):
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"micro:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 3))
    print(f"loadavg: {[round(x, 2) for x in os.getloadavg()]}")
    for name, runs in results.items():
        print(f"{name:8s} best={min(runs):6.3f}  all={runs}")


if __name__ == "__main__":
    main()
