"""Round-14 optimization measurement harness.

Two subcommands:

``plans [before|after] [names...]``
    Dump ``explain("formatted")`` for each headline query (or the given
    names) to ``plans/r14/<name>_{before,after}.txt`` and print a
    one-line plan-shape summary (Exchange count, join strategies,
    Python-eval nodes) per query.

``time [names...]``
    Per-query steady-state timing with the NOOP SINK (guide §1.4): one
    warm-up execution, then best-of-3 ``df.write.format("noop")`` runs,
    labelled via ``setJobDescription``. This times the computation, not
    the collect; bench.py's collect-based numbers stay the comparable
    record.

Usage::

    python scripts/r14_measure.py plans before
    python scripts/r14_measure.py time q155_sparse_cosine_topk ...
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gov_data_pipeline_spark.queries import all_queries  # noqa: E402
from gov_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q06_asof_join",
    "q09_group_concat",
    "q10_window_rank",
    "q13_sessionize",
    "q41_jaccard_pairs",
    "q42_minhash_lsh",
    "q44_cosine_topk",
    "q47_text_stats",
    "q50_llm_enrich",
    "q57_winnowing",
    "q60_tumbling",
    "q66_cumulative_alerts",
    "q155_sparse_cosine_topk",
    "q154_decontaminate_bloom",
    "q168_quality_trained",
    "q171_bigram_logprob",
    "q190_ann_multiprobe_recall",
    "q193_bpe_ranks_count",
    "q196_shuffled_export",
    "q198_multiclass_route",
]


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _shape(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_reuse = len(re.findall(r"ReusedExchange", plan))
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    pyth = re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow)", plan)
    from collections import Counter

    jc = dict(Counter(joins))
    pc = dict(Counter(pyth))
    return (
        f"Exchange={n_ex} (reused={n_reuse}) joins={jc or '{}'} "
        f"python={pc or '{}'}"
    )


def cmd_plans(tag: str, names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"r14-plans-{tag}")
    registry = all_queries()
    os.makedirs(os.path.join(REPO, "plans", "r14"), exist_ok=True)
    for name in names or HEADLINE:
        df = registry[name](spark, sf_dir)
        plan = _formatted(df)
        path = os.path.join(REPO, "plans", "r14", f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {_shape(plan)}")


def cmd_time(names: list[str], n_runs: int = 3) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r14-time")
    registry = all_queries()
    names = names or HEADLINE
    # Warm JVM + python worker pool (mirrors bench.py)
    try:
        registry[names[0]](spark, sf_dir).collect()
    except Exception:
        pass

    def _identity(it):
        yield from it

    spark.range(32).repartition(32).mapInPandas(
        _identity, schema="id long"
    ).collect()

    out: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"r14: {name} warmup")
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(n_runs):
            spark.catalog.clearCache()
            sc.setJobDescription(f"r14: {name} run {i}")
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"best": min(samples), "runs": samples}
        print(f"{name}: best={min(samples)} runs={samples}", flush=True)
    print(json.dumps({"noop_timings": out, "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cmd = sys.argv[1]
    if cmd == "plans":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        cmd_plans(tag, sys.argv[3:])
    elif cmd == "time":
        cmd_time(sys.argv[2:])
    else:
        sys.exit(__doc__)
