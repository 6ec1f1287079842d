"""SparkSession factory.

One place that owns the engine's Spark configuration so every entry point
(tests, bench, driver contract) gets the same tuned session.

Scale notes (the config is written for a real cluster; local[] only
changes master/memory):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast-join demotion/promotion are all decided from observed stats,
  which is the only thing that survives a 100x data scale-up.
- ``spark.sql.shuffle.partitions`` is a *default*, not a plan: AQE
  coalesces it down for small stages and splits skewed partitions up.
  On a 1000-executor cluster you would raise the default (e.g. 2000+)
  and let AQE trim; locally 32 matches the core count.
- Arrow on: every pandas_udf / mapInPandas / toPandas crossing is
  Arrow-batched, never row-at-a-time pickle.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "gov_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Parameters are overridable for tests; defaults target the
    local[32] / 128 GiB harness while keeping every setting valid for a
    multi-executor cluster.
    """
    cpus = int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- planner / optimizer -------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan (coalesce/skew-split) underneath persisted
        # plans too: cache materialization otherwise runs at the raw
        # shuffle-partition default with no runtime coalescing, which
        # both wastes tasks locally and pins cluster cache writes at
        # whatever width the static plan guessed (q42's profile cache).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let the planner pick shuffled-hash over sort-merge (guide
        # §3.1 both knobs, §9 baseline): most engine joins key id-only
        # relations whose per-partition hash table is tiny, and SHJ
        # skips both sort passes. Two gates with DIFFERENT guarantees
        # (ADVICE r13): the AQE SMJ->SHJ rewrite is bounded by REAL
        # runtime partition sizes (every post-shuffle partition under
        # 64 MiB); the static preferSortMergeJoin=false path is only
        # ESTIMATE-gated (canBuildLocalHashMap: estimated plan size
        # under threshold x numShufflePartitions), so a badly
        # underestimated build side could in principle hand SHJ a
        # partition it must hold fully in memory. In this engine the
        # static picks come from localCheckpointed inputs whose sizes
        # are KNOWN (q168/q198 pins), not estimated, and everything
        # else resolves at runtime under AQE; joins above the bounds
        # stay sort-merge (spill-safe). Measured -8% on the join-heavy
        # headline subset at sf0.1 (interleaved best-of-6,
        # OPTIMIZATION_r13.md; re-confirmed on q02's shape in r14).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Joins accept co-partitioning on a SUBSET of their keys (r14):
        # two pins hash-partitioned on qid join on (qid, cid) without
        # re-shuffling — equal join keys imply equal qid imply the same
        # partition, so this is planner-only (never wrong results).
        # The default (true) is skew conservatism: clustering on fewer
        # keys concentrates rows. The engine's subset-keyed pins
        # (q190's per-query relations) are keyed by the SAME column
        # the downstream windows/aggregates partition by anyway, so
        # the parallelism ceiling is the query's own shape, not this
        # flag.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # --- python <-> jvm ------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- semantics ----------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # NOTE: spark.sql.legacy.parquet.nanosAsLong is deliberately NOT
        # set here. catalog.read_table enables it only after a read of a
        # TIMESTAMP(NANOS) fixture actually fails without it — setting
        # it session-wide would make every OTHER parquet read silently
        # load nanos columns as epoch-nanos longs instead of erroring.
        # --- local-mode niceties (harmless on a cluster) -------------
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
