"""Phase-split timing for the pin-shaped headline queries (guide §1).

For a query whose construction runs eager pin jobs (localCheckpoint /
persist) before the final DAG executes, bench.py's collect number is
construction + final.  This sidecar splits the two so optimization
effort lands on the phase that actually dominates:

- ``construct`` = time for ``registry[name](spark, sf_dir)`` to RETURN
  (all eager pin jobs run inside).
- ``final``     = noop-sink write of the returned frame (guide §1.4).

Usage::

    python scripts/r14_phase_split.py q198_multiclass_route q168_quality_trained
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gov_data_pipeline_spark.queries import all_queries  # noqa: E402
from gov_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r14_phase_split")
    registry = all_queries()
    n_runs = int(os.environ.get("R14_RUNS", "4"))
    for name in names:
        fn = registry[name]
        # warm-up: codegen + JIT + python workers
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rows = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}: construct")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: final DAG")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            rows.append((t1 - t0, t2 - t1, t2 - t0))
        best = min(rows, key=lambda r: r[2])
        print(
            f"{name}: construct={best[0]:.3f}s final={best[1]:.3f}s "
            f"total={best[2]:.3f}s  (all: "
            + ", ".join(f"{c:.2f}+{f:.2f}" for c, f, _ in rows)
            + ")"
        )


if __name__ == "__main__":
    main()
