"""Connected components over candidate-pair edges — the clustering
stage that turns near-duplicate PAIRS (MinHash/SimHash/cosine output)
into canonical duplicate GROUPS, so a 100 TB dedup pipeline can keep
exactly one representative per cluster.

The reference has no graph operator (its dedup story stops at cell
cleaning); this is part of the engine's LLM-data-pipeline extension
(SURVEY §2.2 L5/L6 downstream stage).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
standard shuffle-bounded CC for Spark:

- ``large-star``: every node points its LARGER neighbors at its
  current minimum neighbor (or itself);
- ``small-star``: every node points its smaller-or-equal neighbors at
  its minimum neighbor;
- iterate to fixpoint; edges converge to (min-of-component -> member)
  stars in O(log^2 n) rounds on real graphs.

Each round is a min-aggregate plus an equi-join on the node id (the
join reuses the aggregate's hash partitioning, so one real shuffle)
followed by a distinct. Everything stays in the EDGE domain — no
per-component array is ever materialized, so a giant skewed component
spreads across the cluster instead of landing in one task's memory
(this is why the implementation deliberately avoids ``collect_set``).
The driver-side loop only checks scalar convergence counts per round,
never collecting data rows.

At 100 TB the edge set from LSH candidates is orders of magnitude
smaller than the corpus. Iterative plans double their lineage every
round — left unchecked the optimizer itself OOMs after ~10 rounds —
so every round is cut with ``localCheckpoint`` (executor-storage
materialization; the edge set is the small relation here). Set
``reliable_checkpoint=True`` (plus ``setCheckpointDir``) on clusters
where executor loss mid-computation must be survivable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round over (u, v) edges."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least(F.col("__mv"), F.col("u")).alias("m"))
    )
    joined = sym.join(mins, "u")  # co-partitioned with the aggregate
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = joined.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).union(mins.select(F.col("u"), F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Component id (minimum member id) per node: (node, component).

    Isolated nodes don't appear in ``pairs`` and so don't appear here;
    union them in as (id, id) downstream if every doc needs a label.
    Converges when a large+small round leaves the edge set unchanged
    (count compare first — a scalar — then a set compare only on
    count equality).
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = edges.checkpoint() if reliable_checkpoint else edges.localCheckpoint()
    converged = False
    for _ in range(max_rounds):
        after = _star_round(_star_round(edges, large=True), large=False)
        # Cut lineage every round: iterative plans double otherwise and
        # the optimizer itself becomes the bottleneck (or OOMs).
        after = after.checkpoint() if reliable_checkpoint else after.localCheckpoint()
        if after.count() == edges.count() and after.exceptAll(edges).isEmpty():
            edges = after
            converged = True
            break
        edges = after
    if not converged:
        # Unconverged stars would yield multiple labels per true
        # component — silently wrong dedup. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds (convergence is O(log^2 n) rounds)"
        )
    # Fixpoint edges are (member -> component-min) stars.
    comp = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
    return comp.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Full-corpus duplicate-cluster labels: every document gets a
    ``component`` (its cluster's minimum doc id — singletons label
    themselves) and a ``is_canonical`` flag (the kept representative).

    This is the keep-one-per-cluster stage of a corpus dedup pipeline:
    ``corpus.join(..., 'left')`` keeps isolated docs without shuffling
    the corpus twice, and downstream keeps ``is_canonical`` rows.
    """
    comp = connected_components(pairs, a_col, b_col)
    out = corpus.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    return out.withColumn("is_canonical", F.col("component") == F.col(id_col))
