"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_topk``: exact brute force — broadcast the (small) query set,
  JVM-side dot products via ``zip_with``/``aggregate``, per-query top-k with
  a window. The baseline and the verifier for the approximate path.
- ``rhp_ann_topk``: random-hyperplane LSH (SimHash for vectors, Charikar
  2002). Every vector gets a ``n_planes``-bit signature from FIXED
  Rademacher (±1) hyperplanes; candidates = vectors sharing a signature
  band with the query; exact cosine re-rank inside the bucket. At 10^11
  vectors the bucket join replaces the full cross product — that is the
  scale path. The hyperplanes are deterministic literals (seeded), so
  results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _quant(vec_col: str) -> Column:
    """floor(x*1000) long quantization — shared by the IVF trainer and
    operator so assignment arithmetic is identical in both."""
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Integer squared L2 over quantized-long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _idot(a: Column, b: Column) -> Column:
    """Integer dot product over quantized-long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, vec_id, cosine_sim, rank)``.

    ``queries``: (query_id, embedding). Broadcast — the query set must be
    small (the usual case: probe queries against a huge corpus).
    """
    from .parallelism import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors, multiplier=1)
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
        )
    )
    scored = vectors.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("_qv")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_ivf_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[int]]]:
    """Lloyd-refined IVF centroids as a bounded DataFrame loop.

    Initialization = deterministic farthest-first traversal (Gonzalez):
    start from the lowest-id vector, then repeatedly add the vector
    farthest from its nearest chosen centroid (ties → lowest vec_id).
    Plain Lloyd from the naive lowest-id sample cannot escape a degenerate
    init (measured: 0.72 recall from an all-one-cluster init where
    farthest-first reaches ~1.0) — farthest-first provably covers every
    well-separated cluster before refinement even starts. Each Lloyd
    iteration then assigns every vector with the SAME literal-argmin
    projection the operator uses (one job over the persisted quantized
    corpus — centroids are literals, so plan lineage does NOT grow with
    iterations and no checkpoint discipline is needed) and recomputes each
    centroid as the per-dimension mean of its members (empty cells keep
    their previous centroid). Everything is deterministic: quantized-long
    input, first-match argmin tie-break, ``round()`` on the means.

    Returns ``[(cell_id, centroid_longs)]`` for ``ivf_topk``'s
    ``centroids`` parameter — cell ids are ``0..n_cells-1``. Per-step
    driver traffic is O(n_cells·dim) — dimension reads; the init costs
    ``n_cells`` small take-ordered jobs, the loop one job per iteration.
    """
    from pyspark import StorageLevel

    v = (
        vectors.select(F.col(id_col).alias("vec_id"), _quant(vec_col).alias("_v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    first = v.orderBy("vec_id").limit(1).collect()
    if not first:
        v.unpersist()
        return []
    dim = len(first[0]._v)

    cents: list[list[int]] = [[int(x) for x in first[0]._v]]
    while len(cents) < n_cells:
        cents_lit = F.array(
            *[F.array(*[F.lit(c).cast("long") for c in cent]) for cent in cents]
        )
        far = (
            v.withColumn(
                "_md",
                F.array_min(
                    F.transform(cents_lit, lambda c: _l2sq(F.col("_v"), c))
                ),
            )
            .orderBy(F.desc("_md"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not far or far[0]._md == 0:
            break  # fewer distinct vectors than cells
        cents.append([int(x) for x in far[0]._v])
    for _ in range(n_iters):
        cents_lit = F.array(
            *[F.array(*[F.lit(c).cast("long") for c in cent]) for cent in cents]
        )
        ids_lit = F.array(*[F.lit(i).cast("long") for i in range(len(cents))])
        assigned = _assign_cells(v, cents_lit, ids_lit)
        new_rows = (
            assigned.groupBy("_cell")
            .agg(
                F.array(
                    *[
                        F.round(F.avg(F.element_at("_v", i + 1))).cast("long")
                        for i in range(dim)
                    ]
                ).alias("_c")
            )
            .collect()
        )
        by_cell = {int(r._cell): [int(x) for x in r._c] for r in new_rows}
        nxt = [by_cell.get(i, cents[i]) for i in range(len(cents))]
        if nxt == cents:
            break
        cents = nxt
    v.unpersist()
    return list(enumerate(cents))


def _assign_cells(
    v: DataFrame,
    cents_lit: Column,
    cell_ids_lit: Column,
    keep_dist: bool = False,
) -> DataFrame:
    """``(vec_id, _v, _cell[, _m])`` — nearest-centroid assignment as ONE
    literal argmin projection, zero shuffles. Ties → first (lowest) cell
    id via ``array_position``'s first-match rule. The distance array and
    its min are projected into NAMED columns first: higher-order
    functions evaluate interpreted with no common-subexpression sharing,
    so referencing the distance expression twice would compute the
    n_cells × dim aggregate twice per corpus row. ``keep_dist`` retains
    the min L2² as ``_m`` (the within-cluster tightness signal
    :func:`kmeans_assign` returns)."""
    out = (
        v.withColumn(
            "_d", F.transform(cents_lit, lambda c: _l2sq(F.col("_v"), c))
        )
        .withColumn("_m", F.array_min("_d"))
        .withColumn(
            "_cell",
            F.element_at(
                cell_ids_lit,
                F.array_position(F.col("_d"), F.col("_m")).cast("int"),
            ),
        )
        .drop("_d")
    )
    return out if keep_dist else out.drop("_m")


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[int]]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: coarse quantizer + probed-cell re-rank.

    The scale shape of inverted-file ANN: every vector is assigned to its
    nearest of ``n_cells`` centroids (one narrow broadcast pass — no
    shuffle), a query probes its ``n_probe`` nearest cells, and only those
    cells' members get the exact cosine re-rank. At 10^11 vectors the
    per-query candidate set is ~``n_probe/n_cells`` of the corpus instead
    of all of it, and the cell assignment partitions ship with the data.

    Default centroids are SAMPLED deterministically (the ``n_cells``
    lowest ``id_col`` vectors) — a valid coarse quantizer (k-means init
    without refinement), chosen so every value in the operator is
    integer-exact: vectors quantize to ``floor(x*1000)`` longs, cell
    assignment = integer L2² argmin (ties → lowest cell id), re-rank =
    single-division quantized cosine. That makes the whole operator
    byte-checkable against a SQL oracle (the contract query keeps this
    path). Pass ``centroids`` — e.g. from :func:`train_ivf_centroids`'s
    Lloyd refinement — to swap in a trained quantizer: only the
    ``(cell_id, centroid_longs)`` input changes, the plan is identical
    (recall gate: ``test_similarity`` asserts ≥0.95 @ n_probe 4/16 with
    trained centroids on the fixture vs exact).

    Returns ``(query_id, vec_id, cosine_sim, rank)``.
    """
    from .parallelism import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors, multiplier=n_cells)
    v = vectors.select(F.col(id_col).alias("vec_id"), _quant(vec_col).alias("_v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _quant(vec_col).alias("_qv")
    )
    # The centroids are broadcast-scale BY CONSTRUCTION (n_cells rows), so
    # fold them into literal arrays — the rhp_signature plane-matrix trick —
    # and compute cell assignment as a single projection (_assign_cells).
    # The previous crossJoin(cents) + row_number() formulation shuffled
    # corpus×n_cells rows just to take an argmin: a 16× amplification of
    # the full corpus through an exchange, the exact shape that dies at
    # 10^11 vectors. The sampling collect is O(n_cells) — a dimension
    # read, not a data read.
    if centroids is not None:
        cent_pairs = list(centroids)
    else:
        cent_rows = v.orderBy("vec_id").limit(n_cells).collect()
        cent_pairs = [(r.vec_id, [int(c) for c in r._v]) for r in cent_rows]
    if not cent_pairs:
        # empty corpus: no centroids → no candidates. Return the empty
        # result explicitly — sequence(1, 0) below would step BACKWARDS to
        # [1, 0] and element_at(…, 0) raises in every SQL mode.
        return v.sparkSession.createDataFrame(
            [],
            "query_id long, vec_id long, cosine_sim double, rank int",
        )
    cents_lit = F.array(
        *[
            F.array(*[F.lit(int(c)).cast("long") for c in cent])
            for _, cent in cent_pairs
        ]
    )
    # NO cast on the ids: sampled cell ids keep the corpus id_col's native
    # type (a string id_col stays string — a long cast would NULL it and
    # silently empty the probe join); trained ids are plain ints
    cell_ids_lit = F.array(*[F.lit(cid) for cid, _ in cent_pairs])

    def dists(vec: str) -> Column:
        return F.transform(cents_lit, lambda c: _l2sq(F.col(vec), c))

    # argmin with ties → lowest cell id: cent_pairs are in ascending
    # cell-id order (sampled rows sorted by vec_id / trained ids 0..n-1),
    # so array_position's first-match rule implements the tie-break.
    assign = _assign_cells(v, cents_lit, cell_ids_lit)
    # probe sets: sort (distance, cell) structs — array_sort orders struct
    # fields lexicographically, matching the (dist asc, cell asc) tie-break.
    # Same named-column projection (_qd) so the per-element struct build
    # indexes one precomputed array instead of re-deriving the whole
    # distance array per element (O(n_cells²·dim) per query row otherwise).
    probe_structs = F.transform(
        F.sequence(F.lit(1), F.lit(len(cent_pairs))),
        lambda i: F.struct(
            F.element_at(F.col("_qd"), i).alias("d"),
            F.element_at(cell_ids_lit, i).alias("cell"),
        ),
    )
    probes = F.broadcast(
        q.withColumn("_qd", dists("_qv"))
        .select(
            "query_id",
            "_qv",
            F.explode(
                F.slice(F.array_sort(probe_structs), 1, n_probe)
            ).alias("_pc"),
        )
        .select("query_id", "_qv", F.col("_pc.cell").alias("_cell"))
    )
    cand = assign.join(probes, "_cell").select("query_id", "vec_id", "_v", "_qv")
    sim = _idot(F.col("_v"), F.col("_qv")).cast("double") / F.sqrt(
        (_idot(F.col("_v"), F.col("_v")) * _idot(F.col("_qv"), F.col("_qv")))
        .cast("double")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.select("query_id", "vec_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )


def rademacher_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — identical in any engine."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"rhp:{seed}:{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def rhp_signature(
    vec: Column, planes: list[list[int]], bands: int = 2, quantized: bool = False
) -> Column:
    """``array<string>`` of band keys: the signature bits split into bands.

    ``quantized=True`` expects an integer vector (``array<long>``) and keeps
    the plane dot products in pure integer arithmetic — the sign test is then
    bit-identical in any engine (a float32 dot could flip a near-zero sign
    between engines), which is what makes the ANN path oracle-checkable."""
    n = len(planes)
    per_band = n // bands
    # ONE array<array<…>> literal + transform, NOT n_planes copies of a
    # 64-literal dot expression: constant folding collapses the plane matrix
    # into a single literal, so Janino compiles a small expression (the
    # unrolled form cost ~20s of codegen compilation before any data moved)
    if quantized:
        planes_lit = F.array(
            *[
                F.array(*[F.lit(int(c)).cast("long") for c in plane])
                for plane in planes
            ]
        )
        zero = F.lit(0).cast("long")
    else:
        planes_lit = F.array(
            *[
                F.array(*[F.lit(float(c)) for c in plane])
                for plane in planes
            ]
        )
        zero = F.lit(0.0)
    bits_arr = F.transform(
        planes_lit,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, y: x * y),
                zero,
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise("0"),
    )
    # Band keys via ONE transform over slice(bits_arr, …) — NOT
    # bands × per_band element_at() calls: each element_at embeds a full
    # copy of bits_arr (and with it the whole plane-matrix literal), so the
    # unrolled form is O(n_planes² × dim) expression nodes — at 96 planes
    # that was a ~10 MiB task binary and ~200 s of Janino compilation
    # before any data moved. Here bits_arr appears exactly once.
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.array_join(
                F.slice(bits_arr, b * F.lit(per_band) + 1, F.lit(per_band)),
                "",
            ),
        ),
    )


def rhp_signature_np(
    planes: list[list[int]], bands: int = 2, quantized: bool = False
):
    """Arrow-batched numpy twin of :func:`rhp_signature`: one
    ``(batch × dim) @ (dim × n_planes)`` matmul per Arrow batch instead of
    ``n_planes × dim`` interpreted HOF lambda evaluations per row — 23×
    faster at 1M rows / 96 planes on a fully-subscribed local[32] (103.9 s
    → 4.5 s), where higher-order functions stay interpreted (they are
    outside whole-stage codegen).

    Key-identical to the expression version: with ``quantized=True`` the
    input is the already-floored ``array<long>`` vector and the plane dot
    is an int64 matmul — exact integer arithmetic, so the sign test is
    bit-identical regardless of summation order (this is the
    oracle-checked path). The float path uses float64 matmul, whose
    summation order differs from the HOF left fold — a sign could in
    principle flip when ``|dot|`` is below reordering error (~1e-13
    relative); measured 0 mismatches over 20k real vectors, and for
    near-dup banding a flipped boundary bit only moves one candidate
    probe, never correctness of the cosine filter downstream.

    The returned pandas UDF is a PYTHON PRODUCER: materialize its output
    (``localCheckpoint``) before feeding multi-consumer plans, or Catalyst
    clones the ArrowEvalPython per consumer (trap #3/#4 in PLANS.md).
    """
    n = len(planes)
    per_band = n // bands
    pm = np.array(planes, dtype=np.int64 if quantized else np.float64).T

    @F.pandas_udf("array<string>")
    def _sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(
            v.tolist(), dtype=np.int64 if quantized else np.float64
        )
        bits = (mat @ pm) >= 0
        chars = np.where(bits, "1", "0")
        out = []
        for row in chars:
            s = "".join(row)
            out.append(
                [
                    f"{b}:{s[b * per_band:(b + 1) * per_band]}"
                    for b in range(bands)
                ]
            )
        return pd.Series(out)

    return _sig


def rhp_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing + exact re-rank.

    Candidates = vectors sharing ≥1 signature band with the query. The
    bucket join shuffles on the band key (uniform by construction); the
    cross product never materializes.

    ``quantized=True`` floors each float to a ``floor(x*1000)`` long before
    both the signature and the cosine re-rank — integer dot products and a
    single final division make every value byte-identical to a SQL oracle
    (same trick as ``cosine_topk``'s oracle twin).
    """
    from .parallelism import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors, multiplier=n_planes)
    planes = rademacher_planes(n_planes, dim, seed)
    if quantized:
        quant = F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        )
        vectors = vectors.withColumn(vec_col, quant)
        queries = queries.withColumn(vec_col, quant)
    v_sig = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        F.explode(
            rhp_signature(F.col(vec_col), planes, bands, quantized)
        ).alias("band_key"),
    )
    q_sig = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(
                rhp_signature(F.col(vec_col), planes, bands, quantized)
            ).alias("band_key"),
        )
    )
    cand = (
        v_sig.join(q_sig, "band_key")
        .select("query_id", "vec_id", "_v", "_qv")
        .dropDuplicates(["query_id", "vec_id"])
    )
    if quantized:
        # single sqrt over the dot-product PRODUCT: sqrt(a·a × b·b) differs
        # from sqrt(a·a)×sqrt(b·b) by an ulp — the oracle uses the former,
        # so the Spark side must too (integer dots are exact in double)
        sim = _dot(F.col("_v"), F.col("_qv")) / F.sqrt(
            _dot(F.col("_v"), F.col("_v")) * _dot(F.col("_qv"), F.col("_qv"))
        )
    else:
        sim = cosine(F.col("_v"), F.col("_qv"))
    scored = cand.select("query_id", "vec_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmeans_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    centroids: list[tuple[int, list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "numpy",
) -> DataFrame:
    """Corpus clustering: nearest-centroid assignment of EVERY vector —
    the IVF coarse quantizer exposed as a standalone operator.

    This is the clustering stage real embedding pipelines run on its own:
    SemDeDup clusters the corpus before per-cluster near-dup search
    (Abbas et al. 2023 §3 — ``embedding_dedup``'s published shape),
    cluster-balanced sampling draws per-cell quotas, and domain discovery
    reads the cell histogram. Returns ``(vec_id, cell, l2sq_q)`` — the
    assigned cell and the integer quantized squared L2 to its centroid
    (the within-cluster tightness signal).

    Same integer-exact arithmetic and default sampled centroids as
    :func:`ivf_topk` (floor(x·1000) quantization, L2² argmin, ties →
    lowest cell id; pass :func:`train_ivf_centroids` output for a
    Lloyd-refined quantizer — identical plan). Scale shape: zero
    shuffles, no corpus×centroid exchange — one Arrow-batched int64
    numpy argmin per batch (default ``engine="numpy"``; the
    ``rhp_signature_np`` rationale — HOFs stay interpreted outside
    codegen, measured 55.7s → numpy at 1M vectors × 64 cells), or the
    pure-expression literal argmin projection (``engine="hof"``, no
    Python workers). Both are exact integer arithmetic on the same
    floor(x·1000) quantization, so they are bit-identical
    (path-equality test-pinned) and either one matches the oracle.
    """
    from .parallelism import ensure_min_parallelism

    vectors = ensure_min_parallelism(vectors, multiplier=n_cells)
    v = vectors.select(
        F.col(id_col).alias("vec_id"), _quant(vec_col).alias("_v")
    )
    if centroids is not None:
        cent_pairs = list(centroids)
    else:
        # O(n_cells) dimension read, same deterministic sampling as ivf_topk
        cent_rows = v.orderBy("vec_id").limit(n_cells).collect()
        cent_pairs = [(r.vec_id, [int(c) for c in r._v]) for r in cent_rows]
    if not cent_pairs:
        return v.select(
            "vec_id",
            F.col("vec_id").alias("cell"),
            F.lit(None).cast("long").alias("l2sq_q"),
        ).filter(F.lit(False))
    cell_ids_lit = F.array(*[F.lit(cid) for cid, _ in cent_pairs])
    if engine == "numpy":
        # int64 numpy argmin — bit-identical to the HOF fold (exact
        # integer arithmetic, order-insensitive; the rhp_signature_np
        # precedent measured 23× the interpreted HOF at this shape).
        # np.floor(float64·1000) is the same IEEE op as the _quant
        # expression, so quantization moves inside the batch too.
        # Overflow bound: |d| ≤ 4·dim·(1000·|x|max)² must fit int64 —
        # ~|x| ≤ 10⁴ at dim 64, far above any normalized embedding.
        cmat = np.array([c for _, c in cent_pairs], dtype=np.int64)
        cc = (cmat * cmat).sum(axis=1)

        @F.pandas_udf("struct<cell_idx: int, l2sq_q: long>")
        def _assign(vec: pd.Series) -> pd.DataFrame:
            if len(vec) == 0:
                return pd.DataFrame(
                    {
                        "cell_idx": pd.Series([], dtype="int32"),
                        "l2sq_q": pd.Series([], dtype="int64"),
                    }
                )
            q = np.floor(
                np.array(vec.tolist(), dtype=np.float64) * 1000
            ).astype(np.int64)
            d = (q * q).sum(axis=1)[:, None] - 2 * (q @ cmat.T) + cc[None, :]
            idx = d.argmin(axis=1)  # first min == lowest cell id
            return pd.DataFrame(
                {
                    "cell_idx": idx.astype("int32"),
                    "l2sq_q": d[np.arange(len(idx)), idx],
                }
            )

        return (
            vectors.select(
                F.col(id_col).alias("vec_id"),
                _assign(F.col(vec_col)).alias("_a"),
            )
            .select(
                "vec_id",
                F.element_at(
                    cell_ids_lit, F.col("_a.cell_idx") + F.lit(1)
                ).alias("cell"),
                F.col("_a.l2sq_q").alias("l2sq_q"),
            )
        )
    cents_lit = F.array(
        *[
            F.array(*[F.lit(int(c)).cast("long") for c in cent])
            for _, cent in cent_pairs
        ]
    )
    return _assign_cells(v, cents_lit, cell_ids_lit, keep_dist=True).select(
        "vec_id",
        F.col("_cell").alias("cell"),
        F.col("_m").cast("long").alias("l2sq_q"),
    )
