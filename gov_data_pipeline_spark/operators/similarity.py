"""Vector similarity search over embedding columns (SURVEY L7).

Two paths, same contract:

- ``cosine_topk``: exact brute-force — broadcast the (small) query set
  against the corpus, dot products via ``zip_with``/``aggregate``
  (native, codegen'd), per-query top-k via window. Correctness
  baseline and the right plan when |queries| is small.
- ``ann_topk`` / ``lsh_cosine_pairs`` (over ``_with_lsh_buckets``):
  random-hyperplane LSH. Each vector gets b-bit signatures (sign of
  dot with pseudo-random hyperplanes derived deterministically from
  xxhash64 or md5 of (plane, dim) — no stored model, reproducible on
  any cluster). ANN search joins on bucket equality, so the corpus
  side is partitioned by bucket and only same-bucket candidates are
  scored: the scale path for large query sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With ``dim`` (the known vector width), unrolls into
    a flat codegen'd expression — 3x faster EXECUTION than the
    interpreted higher-order ``aggregate`` fold and BIT-IDENTICAL to it
    (same left-to-right float summation order; verified 0 differing
    values over 800k pairs). The unrolled tree costs ~1 s of extra
    Catalyst analysis per fresh plan, so it is strictly opt-in: pass
    ``dim`` when the pair count is large (the q46/q74 cross joins),
    leave it None for small reranks where analysis would dominate."""
    if dim is not None:
        # try_element_at: a ragged/truncated vector yields null (which
        # propagates to a null cosine and drops at the threshold) —
        # plain element_at would THROW under ANSI mode, failing the job
        # on one malformed row. Well-formed vectors are unaffected.
        e = F.try_element_at(a, F.lit(1)).cast("double") * F.try_element_at(
            b, F.lit(1)
        ).cast("double")
        for i in range(2, dim + 1):
            e = e + F.try_element_at(a, F.lit(i)).cast("double") * F.try_element_at(
                b, F.lit(i)
            ).cast("double")
        return e
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        return F.sqrt(_dot(a, a, dim))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    # try_divide, not '/': under Spark 4's default ANSI mode a zero-norm
    # vector (empty doc, padding row) would throw DIVIDE_BY_ZERO and
    # kill the job; a null cosine instead propagates and drops at the
    # threshold/ranking — same contract as try_element_at above.
    return F.try_divide(_dot(a, b, dim), _norm(a, dim) * _norm(b, dim))


def _pair_cosine(a: Column, b: Column, a_norm: Column, b_norm: Column,
                 dim: int | None = None) -> Column:
    """``cosine`` with the norms PRECOMPUTED per side, for pair stages.

    Bit-identical to ``cosine`` (the norm is the same IEEE expression
    over the same doubles, just evaluated in the per-vector projection
    instead of per pair), but (a) each vector's norm is computed once,
    not once per candidate pair, and (b) the pair stage's generated
    code shrinks ~3x — the full unrolled cosine (dot + 2 norms, ~3*dim
    chained ops) inside a join stage is what pushed q80's whole-stage
    method past the JVM's 64 KB limit and silently dropped that stage
    to interpreted evaluation."""
    return F.try_divide(_dot(a, b, dim), a_norm * b_norm)


def embedding_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector width from one row — the one tiny driver action that buys
    the unrolled codegen'd dot product everywhere downstream. Returns
    None on an empty relation (callers fall back to the generic fold)."""
    row = df.select(vec_col).first()
    return len(row[0]) if row is not None and row[0] is not None else None


def _int8_vec_side(df: DataFrame, idc: str, vecc: str, ida: str,
                   veca: str, norma: str) -> DataFrame:
    """The int8-QUANTIZED per-vector side for candidate scoring — the
    search half of q118's storage quantizer, bit-for-bit the same
    scheme (symmetric per-vector max-abs scale, ``floor(x·127/scale +
    0.5)``; zero-scale vectors quantize to zeros). Returns (id, int8
    codes as a long array, L2 norm of the CODES): per-vector scales
    cancel in cosine, so ranking candidates by ``dot(qa, qb) /
    (|qa|·|qb|)`` over the integer codes needs no dequantization and
    no stored scale — the 100 TB ANN memory win (1 byte/dim in the
    serving index vs 4) with the recall cost measured by q202, not
    asserted. The integer self-dot is exact (≤ dim·127² ≪ 2^53), so
    the only floats are one sqrt per vector and one divide per pair.
    Malformed vectors: null/ragged elements null-poison the fold →
    null norm → null cosine, dropped at the ranking filter like the
    float path."""
    xd = F.transform(F.col(vecc), lambda x: x.cast("double"))
    base = df.select(
        F.col(idc).alias(ida),
        xd.alias("__xd"),
        F.array_max(F.transform(xd, lambda x: F.abs(x))).alias("__sc"),
    )
    qv = F.transform(
        F.col("__xd"),
        lambda x: F.when(F.col("__sc") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x * 127 / F.col("__sc") + 0.5)
        ),
    )
    quant = base.select(F.col(ida), qv.alias(veca))
    return quant.select(
        F.col(ida),
        F.col(veca),
        F.sqrt(
            F.aggregate(
                F.transform(F.col(veca), lambda e: e * e),
                F.lit(0).cast("long"),
                lambda acc, e: acc + e,
            ).cast("double")
        ).alias(norma),
    )


def _int8_pair_cosine(qa: Column, qb: Column, a_norm: Column,
                      b_norm: Column) -> Column:
    """Cosine over int8 codes from ``_int8_vec_side``: exact integer
    dot (long accumulate — no overflow below ~5·10^8 dims), one float
    divide against the precomputed code norms. ``try_divide`` so a
    zero-norm (all-zero) vector yields null and drops at ranking."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    return F.try_divide(dot.cast("double"), a_norm * b_norm)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (broadcast nested-loop).

    Output: (query_id, neighbor_id, cosine_sim, rk). Ties break by
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).alias("__qv"),
        _norm(F.col(query_vec), dim).alias("__qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        _norm(F.col(corpus_vec), dim).alias("__cn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("__qid") != F.col("neighbor_id"))
    scored = joined.select(
        F.col("__qid").alias(query_id),
        "neighbor_id",
        F.round(
            _pair_cosine(F.col("__qv"), F.col("__cv"),
                         F.col("__qn"), F.col("__cn"), dim),
            4,
        ).alias("cosine_sim"),
    )
    # A malformed vector (ragged row, zero norm) yields a NULL
    # cosine_sim; without a threshold stage NULLs would otherwise rank
    # into the tail of a small candidate set — drop them explicitly.
    scored = scored.filter(F.col("cosine_sim").isNotNull())
    w = W.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, "neighbor_id", "cosine_sim", F.col("rk").cast("int").alias("rk"))
    )


def cosine_pairs_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    threshold: float,
    exclude_self: bool = True,
) -> DataFrame:
    """All (query, corpus) pairs with cosine >= threshold, computed as
    a numpy matrix product per Arrow batch.

    This is the documented exception to "stay native": a dense
    all-pairs similarity is a GEMM, and BLAS beats interpreted
    expression evaluation by an order of magnitude (13x measured
    end-to-end on this harness). The query side is collected and
    broadcast (it must be the small side — thousands, not millions);
    the corpus streams through ``mapInPandas``, so the scan stays
    distributed and cost scales linearly with |corpus|. Output sims are
    float64 rounded to 4 decimals, matching the exact operators'
    convention (summation order differs from sequential evaluation by
    ulps — use the exact path when bit-parity with an oracle matters).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    for side, name in ((queries, query_id), (corpus, corpus_id)):
        dt = side.schema[name].dataType
        if not isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            raise TypeError(
                f"cosine_pairs_gemm requires integral ids (got {name}: "
                f"{dt.simpleString()}); use cosine_topk/lsh_cosine_pairs "
                "for arbitrary id types"
            )

    spark = queries.sparkSession
    # Malformed vectors (NULL, ragged length) are DROPPED on both sides
    # before the kernel — same policy as ann_topk's NULL-cosine filter;
    # a NULL row would crash the numpy stack and a ragged one would
    # silently build an object array. Zero-norm vectors survive to the
    # kernel but produce NaN sims, which fail the threshold (NaN >= t
    # is False in numpy) — excluded, not matched-to-everything.
    qrows = (
        queries.filter(F.col(query_vec).isNotNull())
        .select(query_id, query_vec)
        .collect()
    )
    if not qrows:
        return spark.createDataFrame([], "a_id long, b_id long, cosine_sim double")
    # expected dim = the MODAL query length (ties broken smaller), not
    # row 0's — a ragged first row must not silently veto every
    # well-formed vector on both sides
    from collections import Counter

    sizes = Counter(len(r[1]) for r in qrows)
    top = max(sizes.values())
    modal = sorted(d for d, c in sizes.items() if c == top)
    # A modal-frequency TIE (e.g. half len-3, half len-4) is a genuinely
    # mixed-dim input, not a few ragged rows — picking either dim would
    # silently erase the other half from BOTH sides. Same if the "modal"
    # dim covers under 2/3 of the queries. Refuse loudly instead.
    if len(modal) > 1 or top * 3 < len(qrows) * 2:
        raise ValueError(
            "cosine_pairs_gemm: query vectors are mixed-dimension "
            f"(length histogram {dict(sorted(sizes.items()))}); split the "
            "input by vector length and run one call per dimension"
        )
    dim = modal[0]
    qrows = [r for r in qrows if len(r[1]) == dim]
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):  # zero norm -> NaN row
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qmat))

    src = corpus.filter(
        F.col(corpus_vec).isNotNull() & (F.size(corpus_vec) == dim)
    ).select(F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv"))

    def mapper(batches):
        q_ids, q_norm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.array([list(v) for v in pdf["__cv"]], dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ q_norm.T  # (n_corpus_batch, n_queries)
            # Round BEFORE thresholding (HALF_UP, matching F.round —
            # np.round is half-to-even and diverges on .00005
            # boundaries): the exact operators and the differential
            # oracle filter on the rounded value, so the kept set is
            # identical across engines instead of diverging for sims
            # in [threshold - 5e-5, threshold).
            sims_r = np.sign(sims) * np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4
            ci, qi = np.nonzero(sims_r >= threshold)
            rounded = sims_r[ci, qi]
            out = pd.DataFrame(
                {
                    "a_id": q_ids[qi],
                    "b_id": pdf["__cid"].to_numpy()[ci],
                    "cosine_sim": rounded,
                }
            )
            if exclude_self:
                out = out[out["a_id"] != out["b_id"]]
            yield out

    return src.mapInPandas(
        mapper, schema="a_id long, b_id long, cosine_sim double"
    )


def semdedup_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_target: int = 256,
    k_min: int = 8,
) -> DataFrame:
    """SemDeDup's clustering partitioner: assign every vector to its
    nearest of k deterministic seeds (the smallest ``(md5(id), id)``
    rows — the q113 seeding convention), with k = max(k_min,
    n // cell_target) so cell occupancy — and the per-cell pairwise
    work downstream — stays bounded as the corpus grows. Returns
    ``(id, cell, vec)`` rows; feed them to ``cell_cosine_pairs_gemm``.

    Determinism (the oracle contract shared with q181): squared
    distances fold left-to-right over the same doubles in both engines
    (zip_with + aggregate ⟷ list_transform + list_sum), rounded to 4
    before the argmin with the seed id as tiebreak. The corpus count
    is ONE scalar of model state (fixes k; the oracle's cnt CTE
    mirrors it); seeds are a k-row TakeOrdered + broadcast.

    NULL handling (the ``cell_cosine_pairs_gemm`` convention): rows
    with a NULL vector are DROPPED before partitioning. Without the
    filter a NULL vector yields NULL ``__d2``, and Spark's default
    ascending window order sorts NULLs FIRST — silently assigning the
    row to the lowest cell id — while the oracle's ``ORDER BY d2``
    sorts NULLs LAST: a divergence, not a policy. A RAGGED vector
    (length ≠ seed length) survives the filter but also yields NULL
    ``__d2`` against every seed (zip_with pads with NULLs), so the
    argmin window additionally orders ``asc_nulls_last`` — both
    engines then assign such a row to the lowest cell id via the
    seed-id tiebreak, deterministically, instead of diverging on NULL
    placement.
    """
    from pyspark.sql import Window as W

    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).filter(F.col(vec_col).isNotNull())
    n = vecs.count()
    k = max(k_min, n // cell_target)
    seed_order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    seeds = (
        vecs.orderBy(*seed_order)
        .limit(k)
        .withColumn("__cid", F.row_number().over(W.orderBy(*seed_order)))
        .select("__cid", F.col(vec_col).alias("__c"))
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("__c"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(
            F.col("__d2").asc_nulls_last(), F.col("__cid")
        )
    )
    return (
        vecs.crossJoin(F.broadcast(seeds))
        .select(id_col, vec_col, "__cid", F.round(d2, 4).alias("__d2"))
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("__cid").alias("cell"), vec_col)
    )


def cell_cosine_pairs_gemm(
    cells: DataFrame,
    id_col: str,
    cell_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """All (a, b) pairs with cosine >= threshold WITHIN each cell
    (a < b), one numpy GEMM per cell — the SemDeDup/FAISS per-cluster
    kernel. ``cosine_pairs_gemm``'s sibling for the partitioned case:
    there the small side broadcasts against the whole corpus; here the
    cell id partitions the corpus and each group runs its own
    all-pairs product, so total cost is Σ|cell|² — linear in corpus
    size when the partitioner scales cell count with the corpus
    (bounded occupancy), never |corpus|².

    One shuffle (groupBy cell), one Arrow crossing. The expression-
    based exact path (``_pair_cosine`` inside a self-join) is the
    bit-parity tier, but an unrolled cosine inside a join stage falls
    out of whole-stage codegen (the q80 64 KB lesson) and evaluates
    interpreted at ~20 µs/pair — BLAS is ~50x that throughput here.
    Rounding is HALF_UP before thresholding, matching F.round and the
    differential oracles (np.round is half-to-even). Zero-norm vectors
    produce NaN sims and fail the threshold; NULL vectors are dropped;
    vectors within a cell must share one dimension (callers route
    mixed-dim corpora per dimension, the ``cosine_pairs_gemm`` rule).
    """
    import numpy as np
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64")}
        )
        pdf = pdf[pdf[vec_col].notna()]
        if len(pdf) < 2:
            return empty
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(
            [list(v) for v in pdf[vec_col].to_numpy()[order]],
            dtype=np.float64,
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        s = sims[iu]
        s_r = np.sign(s) * np.floor(np.abs(s) * 1e4 + 0.5) / 1e4
        m = s_r >= threshold
        if not m.any():
            return empty
        return pd.DataFrame(
            {"a_id": ids[iu[0][m]], "b_id": ids[iu[1][m]]}
        )

    return (
        cells.select(
            F.col(cell_col).alias("__cell"),
            F.col(id_col).alias(id_col),
            F.col(vec_col).alias(vec_col),
        )
        .groupBy("__cell")
        .applyInPandas(kernel, schema="a_id long, b_id long")
    )


def ivf_cell_assign(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    n_centroids: int = 16,
    n_probe: int = 2,
    with_rank: bool = False,
    centroids: DataFrame | None = None,
    centroid_id: str = "cid",
    centroid_vec: str = "centroid",
) -> tuple[DataFrame, DataFrame]:
    """The IVF coarse-quantization stage shared by ``ivf_topk`` and
    the n_probe sweep report (q197): Voronoi cells around
    ``n_centroids`` deterministic centroids (the lowest-id corpus
    vectors — no training state, reproducible anywhere). Returns
    ``(q_cells, c_cells)`` — ``q_cells`` is (``__qid``, cid) with the
    ``n_probe`` nearest cells per query, ``c_cells`` is
    (``neighbor_id``, cid) with exactly ONE cell per corpus vector.
    ``with_rank`` adds the query-side probe rank as ``q_rn`` (1 =
    nearest cell), letting a sweep run ONE assignment at the widest
    depth and carve every shallower operating point as a prefix
    filter.

    ``centroids`` (r12): an externally TRAINED centroid table —
    (``centroid_id``, ``centroid_vec`` array) — replaces the lowest-id
    default (``n_centroids`` is then ignored; cell count = centroid
    rows). The production IVF recipe is exactly this: k-means a
    sampled slice of the corpus once, persist the k centroid vectors,
    and pass them here — assignment quality then reflects the data's
    actual cluster structure instead of whichever vectors happened to
    carry the lowest ids, while the plan (broadcast
    centroid-dimension table, one hash-aggregate of dot products)
    is unchanged.

    Assignment is codegen'd end-to-end: vectors posexplode into
    (id, dim, x) rows, join the broadcast centroid-dimension table, and
    one hash-aggregate computes every vector-centroid dot product; the
    distance ranking uses ||v-c||^2 = ||v||^2 - 2<v,c> + ||c||^2 with
    the ||v||^2 term dropped (constant per vector)."""
    if centroids is not None:
        cents = centroids.select(
            F.col(centroid_id).alias("cid"),
            F.posexplode(F.col(centroid_vec)).alias("__d", "__c"),
        )
    else:
        cents = (
            corpus.orderBy(F.col(corpus_id).asc())
            .limit(n_centroids)
            .select(
                F.col(corpus_id).alias("cid"),
                F.posexplode(F.col(corpus_vec)).alias("__d", "__c"),
            )
        )
    cent_dims = cents.select("cid", "__d", F.col("__c").cast("double").alias("__c"))
    cent_norms = cent_dims.groupBy("cid").agg(
        F.sum(F.col("__c") * F.col("__c")).alias("c2")
    )

    def assign(
        df: DataFrame, idc: str, vecc: str, ida: str, probes: int,
        rank: bool = False,
    ) -> DataFrame:
        ex = df.select(
            F.col(idc).alias(ida), F.posexplode(F.col(vecc)).alias("__d", "__x")
        )
        dots = (
            ex.join(F.broadcast(cent_dims), "__d")
            .groupBy(ida, "cid")
            .agg(F.sum(F.col("__x").cast("double") * F.col("__c")).alias("dot"))
        )
        scored = dots.join(F.broadcast(cent_norms), "cid").withColumn(
            "__dist", F.col("c2") - 2 * F.col("dot")
        )
        w = W.partitionBy(ida).orderBy(F.col("__dist").asc(), F.col("cid").asc())
        ranked = scored.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= probes
        )
        if rank:
            return ranked.select(ida, "cid", F.col("__rn").alias("q_rn"))
        return ranked.select(ida, "cid")

    return (
        assign(queries, query_id, query_vec, "__qid", n_probe, rank=with_rank),
        assign(corpus, corpus_id, corpus_vec, "neighbor_id", 1),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
    dim: int | None = None,
    centroids: DataFrame | None = None,
    centroid_id: str = "cid",
    centroid_vec: str = "centroid",
    int8: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize with
    ``ivf_cell_assign`` (see its docstring for the plan shape — and
    for ``centroids``, the externally-trained-centroid hook), then
    score only query-cell co-residents. Search cost scales with cell
    occupancy x n_probe, not |corpus|.

    ``int8=True`` is the IVF-SQ8 shape (FAISS's workhorse index at
    corpus scale): cell ASSIGNMENT stays float against the float
    centroids, but candidate SCORING runs over int8-quantized codes
    (``_int8_vec_side`` — q118's quantizer; integer dots, scales
    cancel in cosine), so the serving index stores 1 byte/dim. The
    recall cost of the quantized tier is measured by q202 (the
    q186/q197 honesty pattern), not asserted.

    Default ``n_probe=4`` is MEASURED, not guessed: the q197 sweep
    (16 centroids, k=5, 20 queries) recorded recall@5 AND candidate
    count per n_probe — sf0.1 (50k corpus): 1 probe 0.85 recall at
    2.5k candidates, 2 -> 0.86 @ 4.9k, 4 -> 0.89 @ 9.9k, 8 -> 0.92 @
    19.8k; sf0.01 (5k): 0.78/0.81/0.85/0.93 at 0.6k/1.2k/2.4k/5k.
    Candidates double per step while recall climbs a few points —
    n_probe=4 buys most of the probing gain at ~1% of the corpus
    scanned per query. Callers trade recall for cost by overriding
    (the q55/q188 queries pin their own values); the sweep itself
    stays registered (q197), so the table re-derives on any fixture."""
    q_cells, c_cells = ivf_cell_assign(
        queries, corpus, query_id, corpus_id, query_vec, corpus_vec,
        n_centroids=n_centroids, n_probe=n_probe, centroids=centroids,
        centroid_id=centroid_id, centroid_vec=centroid_vec,
    )
    if int8:
        q_side = _int8_vec_side(
            queries, query_id, query_vec, "__qid", "__qv", "__qn"
        )
        c_side = _int8_vec_side(
            corpus, corpus_id, corpus_vec, "neighbor_id", "__cv", "__cn"
        )
    else:
        q_side = queries.select(
            F.col(query_id).alias("__qid"),
            F.col(query_vec).alias("__qv"),
            _norm(F.col(query_vec), dim).alias("__qn"),
        )
        c_side = corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_vec).alias("__cv"),
            _norm(F.col(corpus_vec), dim).alias("__cn"),
        )
    q = q_side.join(q_cells, "__qid")
    c = c_side.join(c_cells, "neighbor_id")
    joined = c.join(q, "cid")
    if exclude_self:
        joined = joined.filter(F.col("__qid") != F.col("neighbor_id"))
    # No distinct: the corpus side is assigned exactly ONE cell, so a
    # (query, neighbor) pair can arise from at most one shared cell —
    # the dedup shuffle the multi-table LSH path needs would be a pure
    # wasted exchange here.
    cand = joined.select(
        "__qid", "__qv", "__qn", "neighbor_id", "__cv", "__cn"
    )
    pair_sim = (
        _int8_pair_cosine(F.col("__qv"), F.col("__cv"),
                          F.col("__qn"), F.col("__cn"))
        if int8
        else _pair_cosine(F.col("__qv"), F.col("__cv"),
                          F.col("__qn"), F.col("__cn"), dim)
    )
    scored = cand.select(
        F.col("__qid").alias(query_id),
        "neighbor_id",
        F.round(pair_sim, 4).alias("cosine_sim"),
    )
    # A malformed vector (ragged row, zero norm) yields a NULL
    # cosine_sim; without a threshold stage NULLs would otherwise rank
    # into the tail of a small candidate set — drop them explicitly.
    scored = scored.filter(F.col("cosine_sim").isNotNull())
    w = W.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, "neighbor_id", "cosine_sim", F.col("rk").cast("int").alias("rk"))
    )


def _with_lsh_buckets(
    df: DataFrame,
    idc: str,
    vecc: str,
    ida: str,
    veca: str,
    bits: int,
    tables: int,
    hash_family: str,
    norma: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Attach (table, bucket) rows to each vector — the shared
    hyperplane-LSH stage behind ``ann_topk`` and ``lsh_cosine_pairs``.

    Signatures via posexplode + codegen'd sum-aggregates (the
    interpreted higher-order-lambda version is ~10x slower at corpus
    scale): one shuffle on the vector id computes all tables*bits plane
    dot-products in a single hash-aggregate. With ``norma``, the
    vector's L2 norm rides along from this per-vector projection so the
    downstream pair stage never recomputes it per candidate.

    The plane dots are computed in INTEGER fixed-point (elements
    quantized ``floor(x·10^6 + 0.5)`` before the ±1 multiply, long
    accumulate) — r13, after the sf1.0 sweep caught the float form's
    boundary: a vector whose plane dot is within float-summation noise
    of zero gets a bucket bit that depends on ACCUMULATION ORDER,
    which neither Spark's hash-aggregate nor DuckDB's group sum pins —
    the planted q80 mutant pair collided in one engine and not the
    other. The integer sum is exact and order-free in both engines
    (|dot| ≤ dims·10^6·max|x| ≪ 2^63), so the sign — hence every
    bucket, candidate set, and downstream cluster — is deterministic.
    The 10^-6 quantization is far below any embedding's meaningful
    precision; it only REDEFINES the hash family (any deterministic
    sign rule is a valid LSH), it does not approximate it.
    """
    cols = [F.col(idc).alias(ida), F.col(vecc).alias(veca)]
    if norma is not None:
        cols.append(_norm(F.col(vecc), dim).alias(norma))
    base = df.select(*cols)
    ex = base.select(ida, F.posexplode(veca).alias("__d", "__x"))
    total = tables * bits
    if hash_family == "md5":
        # Broadcast (dim -> 1 sign per plane) table: tables*bits
        # digests per distinct dimension, zero per-row hashing.
        signs = F.transform(
            F.sequence(F.lit(0), F.lit(total - 1)),
            lambda p: F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.col("__d").cast("string"),
                                p.cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                )
                .cast("int")
                .bitwiseAND(F.lit(1))
                == 1,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        )
        if dim is not None:
            # Vector width known: the dimension domain is 0..dim-1 by
            # construction — build the sign table from range() instead
            # of distinct-scanning the exploded (rows x dims) relation.
            dims_df = df.sparkSession.range(dim).select(
                F.col("id").cast("int").alias("__d")
            )
        else:
            dims_df = ex.select("__d").distinct()
        dim_signs = dims_df.select("__d", signs.alias("__sg"))
        ex = ex.join(F.broadcast(dim_signs), "__d")
        qx = F.floor(
            F.col("__x").cast("double") * F.lit(1000000.0) + F.lit(0.5)
        )
        aggs = [
            F.sum(qx * F.element_at(F.col("__sg"), p + 1)).alias(f"__p{p}")
            for p in range(total)
        ]
    elif hash_family == "xxhash64":
        qx = F.floor(
            F.col("__x").cast("double") * F.lit(1000000.0) + F.lit(0.5)
        )
        aggs = [
            F.sum(
                qx
                * F.when(
                    F.xxhash64(F.lit(p), F.col("__d")).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
            ).alias(f"__p{p}")
            for p in range(total)
        ]
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    dots = ex.groupBy(ida).agg(*aggs)
    bucket_exprs = []
    for t in range(tables):
        b = F.lit(0).cast("long")
        for i in range(bits):
            b = b + F.when(
                F.col(f"__p{t * bits + i}") > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        bucket_exprs.append(F.struct(F.lit(t).alias("t"), b.alias("b")))
    sigs = dots.select(
        ida, F.explode(F.array(*bucket_exprs)).alias("__tb")
    ).select(ida, F.col("__tb.t").alias("__t"), F.col("__tb.b").alias("__b"))
    return base.join(sigs, ida)


def _lsh_candidate_ids(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    bits: int,
    tables: int,
    hash_family: str,
    dim: int | None,
    exclude_self: bool,
    probe_masks: list[int] | None = None,
) -> DataFrame:
    """Distinct (``__qid``, ``__cid``) LSH candidate pairs — the shared
    id-only stage behind ``ann_topk`` and ``lsh_cosine_pairs``. The
    bucket relations carry ids + (t, b) ONLY and the dedup aggregate
    shuffles two ids per row, never vectors: the multi-table join
    emits up to ``tables`` (× probes) copies of each pair, and with
    vectors riding the distinct the exchange payload multiplied with
    both knobs (review-caught r11 — the probing default made it
    ~(1+bits)× worse). Vectors join back per side AFTER the dedup.
    ``probe_masks`` (e.g. ``[0, 1, 2, 4]``) XOR-expands the QUERY side
    only; the corpus side always keeps one (t, b) row per table."""
    qb = _with_lsh_buckets(
        queries, query_id, query_vec, "__qid", "__qv", bits, tables,
        hash_family, dim=dim,
    ).select("__qid", "__t", "__b")
    cb = _with_lsh_buckets(
        corpus, corpus_id, corpus_vec, "__cid", "__cv", bits, tables,
        hash_family, dim=dim,
    ).select("__cid", "__t", "__b")
    if probe_masks:
        qb = qb.select(
            "__qid",
            "__t",
            F.explode(
                F.array(*[
                    F.col("__b").bitwiseXOR(F.lit(m).cast("long"))
                    for m in probe_masks
                ])
            ).alias("__b"),
        )
    joined = cb.join(qb, ["__t", "__b"])
    if exclude_self:
        joined = joined.filter(F.col("__qid") != F.col("__cid"))
    return joined.select("__qid", "__cid").distinct()


def _vec_side(df: DataFrame, idc: str, vecc: str, ida: str, veca: str,
              norma: str, dim: int | None) -> DataFrame:
    return df.select(
        F.col(idc).alias(ida),
        F.col(vecc).alias(veca),
        _norm(F.col(vecc), dim).alias(norma),
    )


def lsh_cosine_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    threshold: float,
    bits: int = 8,
    tables: int = 4,
    exclude_self: bool = True,
    hash_family: str = "xxhash64",
    dim: int | None = None,
) -> DataFrame:
    """All (query, corpus) pairs with rounded cosine >= ``threshold``,
    candidates restricted to same-LSH-bucket vectors.

    The scale-path replacement for a crossJoin pair stage (q46/q74's
    flagged all-pairs plan): candidate generation is an equi-join on
    (table, bucket), so cost scales with bucket occupancy instead of
    |queries| x |corpus|. Candidate dedup is id-only and the vectors
    join back per side afterwards (``_lsh_candidate_ids`` — the
    multi-table pair copies never carry embeddings through an
    exchange). Thresholding happens on the 4-decimal-ROUNDED
    similarity, matching the exact operators' convention so a DuckDB
    oracle that replicates the bucket arithmetic (md5 family) agrees
    value-for-value. Output: (a_id, b_id, cosine_sim).
    """
    cand = _lsh_candidate_ids(
        queries, corpus, query_id, corpus_id, query_vec, corpus_vec,
        bits, tables, hash_family, dim, exclude_self,
    )
    qv = _vec_side(queries, query_id, query_vec, "__qid", "__qv", "__qn", dim)
    cv = _vec_side(corpus, corpus_id, corpus_vec, "__cid", "__cv", "__cn", dim)
    return (
        cand.join(qv, "__qid")
        .join(cv, "__cid")
        .select(
            F.col("__qid").alias("a_id"),
            F.col("__cid").alias("b_id"),
            F.round(
                _pair_cosine(F.col("__qv"), F.col("__cv"),
                             F.col("__qn"), F.col("__cn"), dim),
                4,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    bits: int = 8,
    tables: int = 4,
    exclude_self: bool = True,
    hash_family: str = "xxhash64",
    dim: int | None = None,
    probe_flips: int | None = None,
    probe_radius: int = 1,
    int8: bool = False,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket candidates.

    ``int8=True``: bucket assignment stays float (the hyperplane
    signatures are sign bits of float dots — quantization would only
    perturb them), but candidate SCORING runs over int8-quantized
    codes (``_int8_vec_side``) — 1 byte/dim in the scoring index;
    recall cost measured by q202.

    Multi-table LSH: ``tables`` independent plane sets; a candidate is
    any corpus vector sharing a bucket with the query in >=1 table
    (candidates are dedup'd before scoring so each pair is scored
    once). Recall for a pair at angle θ is 1-(1-p^bits)^tables with
    p = 1-θ/π. The bucket join replaces the cross join, so cost scales
    with bucket occupancy, not |corpus|×|queries|.

    ``probe_flips``: MULTI-PROBE (Lv et al., VLDB 2007) — additionally
    probe, per table, every bucket obtained by flipping any non-empty
    subset (of size <= ``probe_radius``) of the first ``probe_flips``
    signature bits. The DEFAULT is ``None`` = ``bits`` (full radius-1
    ball: 1+bits buckets per table): the plain single-bucket tier
    measured recall@5 at only 0.3-0.6 on the 64-dim fixture (q186, the
    r10 verdict's #2 item) — a default that misses half the true
    neighbors is the wrong default. Pass ``probe_flips=0`` for the
    plain tier (q45/q186 pin it to keep measuring that baseline). A
    near neighbor lost to ONE wrong side of ONE hyperplane is
    recovered without re-hashing or more tables; per-pair recall
    rises to 1-(1-p^bits-bits·p^(bits-1)(1-p))^tables at radius-1.
    Cost model at 100 TB: the CORPUS side is untouched (still one
    (t, b) row per table per vector — the big side never fans out);
    only query-side bucket rows multiply by the probe count, so the
    equi-join stays bucket-occupancy-bound. Measured on the sf0.1
    embeddings fixture (q190): recall@5 0.40 -> 0.89 for 6x6 md5 at
    5.0x the candidate pairs of the plain tier (20,799 vs 4,159 —
    still ~6x under the 20x6,000 brute-force pair count, a margin
    that widens with corpus size since probe cost tracks bucket
    occupancy). ``probe_radius=2`` adds the C(probe_flips, 2) two-bit
    flips per table (measured 0.98-1.0 recall on the same fixture at
    ~1.8x the radius-1 candidates). Prefer probing or IVF n_probe
    (q188: 0.87) over raising ``tables`` — more tables re-hash the
    corpus; probing is query-side only.

    ``hash_family="md5"`` derives the ±1 plane components from
    ``md5(dim ',' plane)`` via a tiny broadcast sign table (one digest
    per (dim, plane), not per row) — reproducible in any md5-capable
    engine, so q45 carries a full DuckDB oracle. The xxhash64 default
    computes signs inline per row; both stay entirely JVM-side.
    """
    if probe_flips is None:
        probe_flips = bits
    if not 0 <= probe_flips <= bits:
        raise ValueError(
            f"probe_flips must be in [0, bits]; got {probe_flips} with "
            f"bits={bits}"
        )
    if probe_radius not in (1, 2):
        raise ValueError(f"probe_radius must be 1 or 2; got {probe_radius}")
    masks = None
    if probe_flips:
        masks = [0] + [1 << i for i in range(probe_flips)]
        if probe_radius == 2:
            from itertools import combinations

            masks += [
                (1 << a) | (1 << b)
                for a, b in combinations(range(probe_flips), 2)
            ]
    cand = _lsh_candidate_ids(
        queries, corpus, query_id, corpus_id, query_vec, corpus_vec,
        bits, tables, hash_family, dim, exclude_self, probe_masks=masks,
    )
    if int8:
        qv = _int8_vec_side(queries, query_id, query_vec,
                            "__qid", "__qv", "__qn")
        cv = _int8_vec_side(corpus, corpus_id, corpus_vec,
                            "__cid", "__cv", "__cn")
        pair_sim = _int8_pair_cosine(
            F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
        )
    else:
        qv = _vec_side(queries, query_id, query_vec,
                       "__qid", "__qv", "__qn", dim)
        cv = _vec_side(corpus, corpus_id, corpus_vec,
                       "__cid", "__cv", "__cn", dim)
        pair_sim = _pair_cosine(
            F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn"), dim
        )
    scored = (
        cand.join(qv, "__qid")
        .join(cv, "__cid")
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            F.round(pair_sim, 4).alias("cosine_sim"),
        )
    )
    # A malformed vector (ragged row, zero norm) yields a NULL
    # cosine_sim; without a threshold stage NULLs would otherwise rank
    # into the tail of a small candidate set — drop them explicitly.
    scored = scored.filter(F.col("cosine_sim").isNotNull())
    w = W.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, "neighbor_id", "cosine_sim", F.col("rk").cast("int").alias("rk"))
    )
