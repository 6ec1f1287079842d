"""VERDICT r13 item 3: matched interleaved A/B for the two >10%
regressions of the r13 bench, under guide §1.4 conditions.

- q02_revenue_by_nation: join-shaped, runs under the r13 session-wide
  shuffled-hash-join config — A/B the SHJ knobs (``preferSortMergeJoin``
  + AQE ``maxShuffledHashJoinLocalMapThreshold``) on the SAME session,
  interleaved (A, B, A, B, ...) so host throttling waves hit both arms
  equally.  Both are runtime-settable SQL confs, so the flip is honest:
  each timed run re-plans under the arm's config.
- q09_group_concat: edited in r13 (transform-HOF -> native array cast);
  no config arm — record a clean interleaved best-of-N beside q02's
  arms to give the round a quiet-window reading on the same box.

Usage::

    python scripts/r14_ab_q02_q09.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gov_data_pipeline_spark.queries import all_queries  # noqa: E402
from gov_data_pipeline_spark.session import get_spark  # noqa: E402

SHJ_CONFS = {
    "spark.sql.join.preferSortMergeJoin": ("false", "true"),
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": (
        str(64 * 1024 * 1024),
        "0",
    ),
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r14_ab")
    registry = all_queries()

    def set_arm(shj: bool) -> None:
        for k, (on, off) in SHJ_CONFS.items():
            spark.conf.set(k, on if shj else off)

    def timed(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        registry[name](spark, sf_dir).collect()
        return round(time.perf_counter() - t0, 3)

    # warm both plans once (codegen/JIT is per-plan)
    for shj in (True, False):
        set_arm(shj)
        registry["q02_revenue_by_nation"](spark, sf_dir).collect()
    set_arm(True)
    registry["q09_group_concat"](spark, sf_dir).collect()

    q02_shj, q02_smj, q09 = [], [], []
    for i in range(n):
        set_arm(True)
        q02_shj.append(timed("q02_revenue_by_nation"))
        set_arm(False)
        q02_smj.append(timed("q02_revenue_by_nation"))
        set_arm(True)
        q09.append(timed("q09_group_concat"))
        print(
            f"round {i}: q02 shj={q02_shj[-1]} smj={q02_smj[-1]} "
            f"q09={q09[-1]}",
            flush=True,
        )
    print(f"loadavg: {[round(x, 2) for x in os.getloadavg()]}")
    print(f"q02 SHJ arm: best={min(q02_shj)} all={q02_shj}")
    print(f"q02 SMJ arm: best={min(q02_smj)} all={q02_smj}")
    print(f"q09       : best={min(q09)} all={q09}")


if __name__ == "__main__":
    main()
