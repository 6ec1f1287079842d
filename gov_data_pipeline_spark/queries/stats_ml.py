"""Statistical profiling + ML-adjacent operators: exact grouped
percentiles, correlation matrices, fixed-iteration k-means with
broadcast model state, PSI distribution-drift detection, weighted
(probability-proportional-to-size) sampling, and MAD robust outliers.

These are the data-quality / dataset-curation statistics a training
pipeline runs continuously over its corpus and event telemetry — the
reference has none of them (its quality surface is lint-only,
``/root/reference/Justfile:1-14``), so this family extends SURVEY
§2.2's L8 block the same way q93-q110 did.

Scale shapes: every query is aggregate-dominant — grouped sketches of
a single scan, a tiny (k rows / deciles) model broadcast back, never a
self-join of the fact table. The k-means model state is a k-row
centroid table collected to the driver and re-broadcast as literals:
the canonical iterative-ML loop on Spark (model tiny, data huge) — at
100 TB each Lloyd iteration is one scan + one k-group aggregate.

Float policy (cross-engine value-hash oracles): every comparison that
decides a row's fate is either pure integer (q115's keep decision),
or pins its operands first (q113 rounds centroids to 4 dp before they
re-enter distance arithmetic; q116 rounds median/MAD to 6 dp before
the z-score) so both engines run bit-identical IEEE expressions.
Output-only floats round to 2-6 dp, far above double ULP noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t


# ---------------------------------------------------------------------------
# q111 — exact grouped percentiles (interpolated), lineitem prices.
# ---------------------------------------------------------------------------


def q111_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (p25/p50/p75/p90/p99) of
    the extended price per return flag — Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` share the type-7 definition (index
    ``p*(n-1)``, interpolate between neighbors), so the values agree
    to double precision and round(4) pins the hash.

    Spark computes all five points in ONE aggregate over a single
    scan (the percentage argument is an array); no per-percentile
    re-sort, no window.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pct = F.expr(
        "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.9D, 0.99D))"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), pct.alias("pcts")
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(F.col("pcts")[0], 4).alias("p25"),
        F.round(F.col("pcts")[1], 4).alias("p50"),
        F.round(F.col("pcts")[2], 4).alias("p75"),
        F.round(F.col("pcts")[3], 4).alias("p90"),
        F.round(F.col("pcts")[4], 4).alias("p99"),
    ).orderBy("l_returnflag")


_Q111_SQL = """
SELECT l_returnflag,
       count(*) AS n,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q112 — pairwise correlation / covariance profile.
# ---------------------------------------------------------------------------


def q112_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-relationship profile per line status: Pearson
    correlation for each measure pair plus sample covariance and
    stddevs — the screening stats a feature-selection pass computes
    before training. One grouped aggregate, one scan; the co-moment
    sketches merge associatively so the plan is a plain partial+final
    hash aggregate (no window, no join).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"
    )

    def _corr(a: str, b: str):
        # degenerate group (zero variance): Spark's corr yields NaN,
        # DuckDB yields NULL — pin NULL so engines can never diverge
        return F.nanvl(F.corr(a, b), F.lit(None).cast("double"))

    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(_corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(_corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
            F.round(_corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        )
        .orderBy("l_linestatus")
    )


_Q112_SQL = """
SELECT l_linestatus,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
       round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(stddev_samp(l_extendedprice), 2) AS sd_price
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q113 — k-means (Lloyd), k=4, deterministic init, 2 updates.
# ---------------------------------------------------------------------------

_KM_K = 4


def _km_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rid, x, y) feature projection over the event log: value vs
    hour-of-day×10 (events because ``event_id`` is the one fixture key
    that is genuinely unique — lineitem's (orderkey, linenumber) is
    not, and a colliding rid would make the seed order ambiguous)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("rid"),
        F.col("value").alias("x"),
        (F.hour("ts") * F.lit(10.0)).alias("y"),
    )


def _km_assign(feats: DataFrame, cents: list[tuple[int, float, float]]) -> DataFrame:
    """Nearest-centroid id per row, as a PURE PROJECTION: the k-row
    model enters as literals (the degenerate broadcast), distances
    sort inside one codegen'd ``array_sort`` over struct(dist, cid) —
    lexicographic struct order makes the tie-break (lowest cid)
    explicit and engine-portable. No join, no shuffle."""
    dists = F.array(
        *[
            F.struct(
                (
                    (F.col("x") - F.lit(cx)) * (F.col("x") - F.lit(cx))
                    + (F.col("y") - F.lit(cy)) * (F.col("y") - F.lit(cy))
                ).alias("dist"),
                F.lit(cid).alias("cid"),
            )
            for cid, cx, cy in cents
        ]
    )
    return feats.withColumn("cid", F.array_sort(dists)[0]["cid"])


def q113_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration Lloyd's k-means over (value, hour-of-day×10):
    deterministic seeding (the k=4 rows with the smallest
    ``(md5(rid), rid)``), two centroid updates, then a final
    assignment census under the updated model.

    This is the canonical iterative-ML shape on Spark: the MODEL is k
    rows (collected to the driver each iteration — the one place a
    ``collect`` is the right call, it IS the broadcast of model
    state), the DATA never leaves the cluster, and each iteration is
    one scan + one k-group aggregate. Cross-engine determinism:
    centroids are rounded to 4 dp *before* re-entering the distance
    expression, so both engines run identical IEEE arithmetic on
    identical literals; an emptied cluster keeps its previous
    centroid (the left-join/coalesce rule, mirrored in the oracle).

    Oracle: the same two unrolled Lloyd iterations as recursive CTEs
    (assignment via ``row_number() OVER (ORDER BY dist, cid)``).
    """
    import math

    def _round4(v: float) -> float:
        # SQL ROUND (half away from zero), NOT Python's banker's round:
        # a seed coordinate on a representable .xxxx5 boundary must
        # produce the same literal both engines' c0 computes.
        return math.copysign(math.floor(abs(v) * 10**4 + 0.5) / 10**4, v)

    feats = _km_feats(spark, sf_dir)

    seed_rows = (
        feats.orderBy(F.md5(F.col("rid").cast("string")), "rid")
        .limit(_KM_K)
        .select("x", "y")
        .collect()
    )
    cents = [
        (i, _round4(r["x"]), _round4(r["y"])) for i, r in enumerate(seed_rows)
    ]
    if not cents:
        # nothing to seed from: schema-stable empty model (an empty
        # input slice must not blow up in the array-of-centroids expr)
        return spark.createDataFrame(
            [], "cid int, cx double, cy double, n_points bigint"
        )

    for _ in range(2):  # Lloyd updates
        assigned = _km_assign(feats, cents)
        new = {
            r["cid"]: (r["cx"], r["cy"])
            for r in assigned.groupBy("cid")
            .agg(
                F.round(F.avg("x"), 4).alias("cx"),
                F.round(F.avg("y"), 4).alias("cy"),
            )
            .collect()
        }
        cents = [
            (cid, *new.get(cid, (cx, cy))) for cid, cx, cy in cents
        ]

    final = _km_assign(feats, cents)
    counts = final.groupBy("cid").agg(F.count(F.lit(1)).alias("n_points"))
    model = spark.createDataFrame(cents, "cid int, cx double, cy double")
    return (
        model.join(counts, "cid", "left")
        .select(
            "cid",
            "cx",
            "cy",
            F.coalesce(F.col("n_points"), F.lit(0)).alias("n_points"),
        )
        .orderBy("cid")
    )


# Two unrolled Lloyd iterations; assignment tie-break = lowest cid,
# identical to the struct-sort on the Spark side.
_Q113_SQL = """
WITH feats AS (
  SELECT event_id AS rid,
         value AS x, extract(hour FROM ts) * 10.0 AS y
  FROM events),
c0 AS (
  SELECT (row_number() OVER (ORDER BY md5(CAST(rid AS VARCHAR)), rid) - 1)
           AS cid,
         round(x, 4) AS cx, round(y, 4) AS cy
  FROM feats
  ORDER BY md5(CAST(rid AS VARCHAR)), rid
  LIMIT 4),
a1 AS (
  SELECT rid, x, y, cid,
         row_number() OVER (
           PARTITION BY rid
           ORDER BY (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rk
  FROM feats CROSS JOIN c0),
c1 AS (
  SELECT c0.cid,
         coalesce(round(avg(a.x), 4), c0.cx) AS cx,
         coalesce(round(avg(a.y), 4), c0.cy) AS cy
  FROM c0 LEFT JOIN (SELECT * FROM a1 WHERE rk = 1) a ON a.cid = c0.cid
  GROUP BY c0.cid, c0.cx, c0.cy),
a2 AS (
  SELECT rid, x, y, cid,
         row_number() OVER (
           PARTITION BY rid
           ORDER BY (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rk
  FROM feats CROSS JOIN c1),
c2 AS (
  SELECT c1.cid,
         coalesce(round(avg(a.x), 4), c1.cx) AS cx,
         coalesce(round(avg(a.y), 4), c1.cy) AS cy
  FROM c1 LEFT JOIN (SELECT * FROM a2 WHERE rk = 1) a ON a.cid = c1.cid
  GROUP BY c1.cid, c1.cx, c1.cy),
a3 AS (
  SELECT rid, cid,
         row_number() OVER (
           PARTITION BY rid
           ORDER BY (x - cx) * (x - cx) + (y - cy) * (y - cy), cid) AS rk
  FROM feats CROSS JOIN c2)
SELECT c2.cid, c2.cx, c2.cy,
       coalesce(n.n_points, 0) AS n_points
FROM c2
LEFT JOIN (SELECT cid, count(*) AS n_points FROM a3 WHERE rk = 1
           GROUP BY cid) n ON n.cid = c2.cid
ORDER BY c2.cid
"""


# ---------------------------------------------------------------------------
# q114 — PSI distribution drift per event type.
# ---------------------------------------------------------------------------


def q114_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: the even-user half of
    the event log is the reference population, the odd-user half the
    current one; per event type, bucket ``value`` by the REFERENCE
    deciles and score PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref)
    (ln operands floored at 1e-6 so an emptied bucket contributes a
    large-but-finite term — the identical guard in both engines).

    Scale shape: the model is the per-type decile table (types × 9
    doubles) — one grouped ``percentile`` aggregate broadcast back
    over the scan; bucketing is a codegen'd array filter; the final
    PSI is a rollup of ≤ types×2×10 cells. The full
    (type, cohort, bucket) spine is generated so absent cells enter
    the formula as true zeros rather than silently dropping.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 2).alias("cohort")
    )
    edges = (
        ev.filter(F.col("cohort") == 0)
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,"
                "0.6D,0.7D,0.8D,0.9D))"
            ).alias("edges")
        )
    )
    from gov_data_pipeline_spark.functions.drift import (
        bucket_by_edges,
        psi_term,
    )

    bucketed = (
        ev.join(F.broadcast(edges), "event_type")
        .select(
            "event_type",
            "cohort",
            bucket_by_edges("edges").alias("bucket"),
        )
        .groupBy("event_type", "cohort", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        edges.select("event_type")
        .crossJoin(spark.range(2).select(F.col("id").cast("long").alias("cohort")))
        .crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bucket")))
    )
    cells = spine.join(bucketed, ["event_type", "cohort", "bucket"], "left").select(
        "event_type",
        "cohort",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    props = (
        cells.groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("cohort") == 0, F.col("n"))).alias("n_ref"),
            F.sum(F.when(F.col("cohort") == 1, F.col("n"))).alias("n_cur"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n_ref").alias("tot_ref"),
            F.sum("n_cur").alias("tot_cur"),
            F.collect_list(F.struct("bucket", "n_ref", "n_cur")).alias("cells"),
        )
    )
    return (
        props.select(
            "event_type",
            "tot_ref",
            "tot_cur",
            F.round(
                F.aggregate(
                    F.col("cells"),
                    F.lit(0.0),
                    lambda acc, c: acc
                    + psi_term(
                        c["n_cur"] / F.col("tot_cur"),
                        c["n_ref"] / F.col("tot_ref"),
                    ),
                ),
                4,
            ).alias("psi"),
        )
        .orderBy("event_type")
    )


_Q114_SQL = """
WITH ev AS (
  SELECT event_type, value, user_id % 2 AS cohort FROM events),
edges AS (
  SELECT event_type,
         quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges
  FROM ev WHERE cohort = 0 GROUP BY event_type),
bucketed AS (
  SELECT e.event_type, e.cohort,
         len(list_filter(x.edges, edge -> e.value > edge)) AS bucket,
         count(*) AS n
  FROM ev e JOIN edges x ON e.event_type = x.event_type
  GROUP BY e.event_type, e.cohort, bucket),
spine AS (
  SELECT x.event_type, c.cohort, b.bucket
  FROM edges x
  CROSS JOIN (SELECT unnest([0, 1]) AS cohort) c
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) b),
cells AS (
  SELECT s.event_type, s.cohort, s.bucket, coalesce(b.n, 0) AS n
  FROM spine s
  LEFT JOIN bucketed b
    ON b.event_type = s.event_type AND b.cohort = s.cohort
   AND b.bucket = s.bucket),
pivoted AS (
  SELECT event_type, bucket,
         sum(CASE WHEN cohort = 0 THEN n END) AS n_ref,
         sum(CASE WHEN cohort = 1 THEN n END) AS n_cur
  FROM cells GROUP BY event_type, bucket),
tot AS (
  SELECT event_type, sum(n_ref) AS tot_ref, sum(n_cur) AS tot_cur
  FROM pivoted GROUP BY event_type)
SELECT p.event_type,
       CAST(t.tot_ref AS BIGINT) AS tot_ref,
       CAST(t.tot_cur AS BIGINT) AS tot_cur,
       round(sum((p.n_cur / t.tot_cur - p.n_ref / t.tot_ref)
                 * ln(greatest(p.n_cur / t.tot_cur, 1e-6)
                      / greatest(p.n_ref / t.tot_ref, 1e-6))), 4) AS psi
FROM pivoted p JOIN tot t ON p.event_type = t.event_type
GROUP BY p.event_type, t.tot_ref, t.tot_cur
ORDER BY p.event_type
"""


# ---------------------------------------------------------------------------
# q115 — weighted (PPS / Poisson) corpus sampling, pure-integer.
# ---------------------------------------------------------------------------


def q115_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson sampling with inclusion probability proportional to
    document size (the PPS step of quality-weighted corpus mixing):
    target mean rate 1/5, so p_i = min(1, n_chars·N / (5·S)) with
    S = Σ n_chars. The keep decision is PURE fixed-point —
    ``bucket·5·S < n_chars·N·2^24`` with a 24-bit md5 bucket — so no
    float can ever disagree between engines, runs, or retries, and a
    document's fate is a stable function of its id (re-ingest safe).

    The cross-multiplication runs in DECIMAL(38,0) on both sides:
    int64 would wrap (silently, in Spark's non-ANSI mode) once
    S exceeds ~1.1e11 chars (2^63/(5·2^24)) while DuckDB promotes to
    HUGEINT — a silent cross-engine divergence at corpus scale.
    DECIMAL(38,0) keeps the decision exact to S ≈ 1e30, far past
    100 TB, at the cost of one widened comparison per row.

    Two-phase broadcast shape as q100: one 1-row total broadcast back
    over the scan; the corpus crosses no exchange before the filter.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    tot = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    bucket24 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    dec = "decimal(38,0)"
    kept = (
        docs.crossJoin(F.broadcast(tot))
        .filter(
            bucket24.cast(dec) * 5 * F.col("sum_chars").cast(dec)
            < F.col("n_chars").cast(dec)
            * F.col("n_docs").cast(dec)
            * F.lit(16777216)
        )
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("source")
    )


_Q115_SQL = """
WITH tot AS (
  SELECT count(*) AS n_docs, sum(n_chars) AS sum_chars FROM documents)
SELECT d.source,
       count(*) AS n_kept,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
FROM documents d CROSS JOIN tot
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::INT AS DECIMAL(38,0))
      * 5 * CAST(tot.sum_chars AS DECIMAL(38,0))
      < CAST(d.n_chars AS DECIMAL(38,0)) * CAST(tot.n_docs AS DECIMAL(38,0)) * 16777216
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# q116 — robust outliers via median absolute deviation.
# ---------------------------------------------------------------------------


def q116_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier census: modified z-score
    0.6745·(v − median)/MAD with |z| > 3.5 flagged — the
    outlier gate that, unlike q93's mean/stddev z-score, a few extreme
    values cannot drag. Two grouped exact-median aggregates (the
    second over deviations from the first, joined back as a broadcast
    of ≤ #types rows); median and MAD are rounded to 6 dp BEFORE the
    z expression so both engines threshold identical arithmetic.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.expr("percentile(abs(value - med), 0.5D)"), 6
            ).alias("mad")
        )
    )
    # Explicit NULL when MAD degenerates to 0 (>=50% of a type tied at
    # its median): pinned in BOTH engines so the result never depends
    # on an engine's x/0.0 convention (duckdb 1.0 -> NULL like Spark,
    # but >=1.1 defaults to IEEE inf — the guard makes that irrelevant)
    z = F.when(
        F.col("mad") != 0,
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"),
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .select("event_type", "med", "mad", z.alias("z"))
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.abs(F.col("z")) > 3.5, 1).otherwise(0)).alias(
                "n_outliers"
            ),
            F.round(F.max(F.abs(F.col("z"))), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


_Q116_SQL = """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type, m.med,
         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type, m.med)
SELECT e.event_type, x.med, x.mad,
       count(*) AS n,
       CAST(sum(CASE WHEN x.mad <> 0
                 AND abs(0.6745 * (e.value - x.med) / x.mad) > 3.5
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(CASE WHEN x.mad <> 0
                      THEN abs(0.6745 * (e.value - x.med) / x.mad) END),
             4) AS max_abs_z
FROM events e JOIN mad x ON e.event_type = x.event_type
GROUP BY e.event_type, x.med, x.mad
ORDER BY e.event_type
"""


# ---------------------------------------------------------------------------
# q118 — int8 embedding quantization + reconstruction error.
# ---------------------------------------------------------------------------


def q118_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    max-abs scale, the storage/ANN-memory shrink every 100 TB vector
    corpus applies) with the reconstruction-error audit that decides
    whether the quantized index is servable.

    Everything is a PROJECTION over one scan — elementwise transform /
    aggregate lambdas stay in codegen; no UDF, no shuffle before the
    per-label rollup. Cross-engine determinism: elements are widened
    float32→double (exact), the quantizer is ``floor(x·127/scale+0.5)``
    (identical IEEE ops; no engine-specific round-half rule), and the
    per-vector error sums run in array order in both engines.
    """
    # Malformed vectors (null / empty / null element) are excluded with
    # the IDENTICAL predicate in both engines: the engines' fold
    # semantics differ exactly there (Spark's aggregate returns 0.0 on
    # an empty array and NULL-poisons on a null element; DuckDB's
    # list sum returns NULL on empty and SKIPS null elements), so the
    # only portable contract is to gate them out before the math.
    emb = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .filter(
            F.col("embedding").isNotNull()
            & (F.size("embedding") > 0)
            & ~F.exists("embedding", lambda x: x.isNull())
        )
    )
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec = emb.select(
        "label",
        xd.alias("xd"),
        F.array_max(F.transform(xd, lambda x: F.abs(x))).alias("scale"),
    )
    # per-element squared reconstruction error; a zero-scale (all-zero)
    # vector quantizes to zeros, so its term is x² — same CASE in SQL
    sq_err = F.transform(
        F.col("xd"),
        lambda x: F.when(F.col("scale") == 0, x * x).otherwise(
            (x - F.floor(x * 127 / F.col("scale") + 0.5) * F.col("scale") / 127)
            * (x - F.floor(x * 127 / F.col("scale") + 0.5) * F.col("scale") / 127)
        ),
    )
    per_vec = vec.select(
        "label",
        "scale",
        F.sqrt(
            F.aggregate(sq_err, F.lit(0.0), lambda acc, e: acc + e)
        ).alias("err"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
            F.round(F.avg("err"), 6).alias("avg_l2_err"),
            F.round(F.max("err"), 6).alias("max_l2_err"),
        )
        .orderBy("label")
    )


_Q118_SQL = """
WITH vec AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
  FROM embeddings
  WHERE embedding IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
scaled AS (
  SELECT vec_id, label, xd,
         list_aggregate(list_transform(xd, x -> abs(x)), 'max') AS scale
  FROM vec),
quant AS (
  SELECT vec_id, label, scale,
         sqrt(list_aggregate(
           list_transform(xd,
             x -> CASE WHEN scale = 0 THEN x * x
                       ELSE (x - floor(x * 127 / scale + 0.5) * scale / 127)
                            * (x - floor(x * 127 / scale + 0.5) * scale / 127)
                  END),
           'sum')) AS err
  FROM scaled)
SELECT label,
       count(*) AS n,
       round(avg(scale), 6) AS avg_scale,
       round(avg(err), 6) AS avg_l2_err,
       round(max(err), 6) AS max_l2_err
FROM quant
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# q147 — data card: the per-column profile a dataset release ships
# (row count, null count, exact distinct count, numeric/time range)
# computed in ONE scan of the table. Min/max are emitted as DOUBLE
# (timestamps as floor-of-epoch-seconds) so the long format stays a
# single sortable type; string columns carry NULL range. Exact
# count_distinct over k columns costs one Expand(xk+1) on the single
# scan — the right trade at fixture scale and for the oracle; at
# 100 TB flip to approx_count_distinct with a q26-style bounds oracle
# (documented, not silently substituted).
# ---------------------------------------------------------------------------

_Q147_COLS: tuple[tuple[str, str], ...] = (
    # (column, kind): num -> min/max as double; ts -> epoch seconds;
    # str -> no range
    ("o_custkey", "num"),
    ("o_orderdate", "ts"),
    ("o_orderkey", "num"),
    ("o_orderpriority", "str"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
)


def q147_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def _rng(c: str, kind: str, agg) -> F.Column:
        if kind == "num":
            v = agg(F.col(c)).cast("double")
        elif kind == "ts":
            v = agg(F.unix_timestamp(F.col(c))).cast("double")
        else:
            return F.lit(None).cast("double")
        return F.round(v, 4)

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _Q147_COLS:
        aggs += [
            # count(when(...)), not sum(cast): sum over zero rows is
            # NULL, but the card (and the oracle's count(*)-count(c))
            # must report 0 nulls for an empty table
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            _rng(c, kind, F.min).alias(f"__lo_{c}"),
            _rng(c, kind, F.max).alias(f"__hi_{c}"),
        ]
    one = orders.agg(*aggs)
    card = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__lo_{c}").alias("min_num"),
                F.col(f"__hi_{c}").alias("max_num"),
            )
            for c, _ in _Q147_COLS
        ]
    )
    return (
        one.select(F.explode(card).alias("r"))
        .select("r.*")
        .orderBy("col_name")
    )


def _q147_oracle() -> str:
    parts = []
    for c, kind in _Q147_COLS:
        if kind == "num":
            lo, hi = f"round(CAST(min({c}) AS DOUBLE), 4)", f"round(CAST(max({c}) AS DOUBLE), 4)"
        elif kind == "ts":
            lo = f"round(CAST(floor(epoch(min({c}))) AS DOUBLE), 4)"
            hi = f"round(CAST(floor(epoch(max({c}))) AS DOUBLE), 4)"
        else:
            lo = hi = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {lo} AS min_num, {hi} AS max_num FROM orders"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


_Q147_SQL = _q147_oracle()


QUERIES = {
    "q111_grouped_percentiles": q111_grouped_percentiles,
    "q147_data_card": q147_data_card,
    "q112_correlation": q112_correlation,
    "q113_kmeans": q113_kmeans,
    "q114_psi_drift": q114_psi_drift,
    "q115_weighted_sample": q115_weighted_sample,
    "q116_mad_outliers": q116_mad_outliers,
    "q118_embed_quantize": q118_embed_quantize,
}

ORACLE = {
    "q111_grouped_percentiles": _Q111_SQL,
    "q112_correlation": _Q112_SQL,
    "q113_kmeans": _Q113_SQL,
    "q114_psi_drift": _Q114_SQL,
    "q115_weighted_sample": _Q115_SQL,
    "q116_mad_outliers": _Q116_SQL,
    "q147_data_card": _Q147_SQL,
    "q118_embed_quantize": _Q118_SQL,
}
