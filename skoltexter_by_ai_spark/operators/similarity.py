"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k against one query
  vector: the correctness baseline. One narrow pass + TakeOrdered.
- :func:`knn_join` — exact top-k neighbors for a (small) set of query
  rows via broadcast cross-join + per-query window.
- :func:`lsh_ann_topk` — random-hyperplane LSH: bucket prefilter, then
  exact re-rank inside nearby buckets. The 100 TB path: the scan
  touches only candidate buckets instead of the full corpus.

All dot products run through ``F.zip_with`` / ``F.aggregate``
(higher-order functions, JVM-side, codegen) — no Python UDFs. Elements
are cast to double *before* multiplication so results are bitwise
deterministic and match the DuckDB oracle's double arithmetic.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|) — formula mirrored exactly by the oracle SQL.

    Zero-norm vectors score 0.0 (ANSI mode would otherwise raise a
    divide-by-zero instead of producing NaN).
    """
    denom = norm(a) * norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _stack_valid(vecs: "pd.Series", ok: "pd.Series", where: str):
    """np.vstack over the ``ok``-masked rows with the shared NULL/dim
    contract: NULL rows are the caller's to skip (tolerated — dirty
    data), but rows whose dimensions disagree raise ``ValueError``
    (a systematically wrong embedding dim is a caller bug; silently
    dropping every row would return an empty result with no signal).

    Zero cost on the clean path: the all-valid batch goes straight to
    one vstack (no per-row Python dim checks) — ragged rows make the
    vstack itself raise, re-wrapped with a readable message; a
    UNIFORMLY wrong dim is the caller's to catch with one O(1)
    ``mat.shape[1]`` comparison against the expected dimension.
    """
    import numpy as np

    sub = vecs if ok.all() else vecs[ok]
    if not len(sub):
        return None
    try:
        return np.vstack(sub.map(lambda v: np.asarray(v, dtype=np.float64)))
    except ValueError as exc:
        raise ValueError(
            f"{where}: mixed embedding dims in one batch — the column "
            "must hold vectors of a single dimension"
        ) from exc


def cosine_vectorized(a: Column, b: Column) -> Column:
    """Arrow-batched numpy cosine for bulk pair verification.

    ~100x faster than :func:`cosine` on large candidate sets (HOF
    lambdas run interpreted), at the cost of numpy reduction order —
    equal to the sequential fold within float64 ulp, so use this where
    results feed a threshold, and :func:`cosine` where bitwise oracle
    parity matters (x05/x13).

    NULL contract: a NULL on either side yields a NULL cosine (the
    row drops out of any downstream threshold filter) instead of
    crashing the Arrow batch; a dimension mismatch between the two
    sides — or mixed dims within a side — raises ``ValueError``.
    """

    @F.pandas_udf("double")
    def cos_pd(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        if not len(va):
            return pd.Series([], dtype="float64")
        ok = ~(va.isnull().to_numpy() | vb.isnull().to_numpy())
        ok = pd.Series(ok, index=va.index)
        ma = _stack_valid(va, ok, "cosine_vectorized(a)")
        if ma is None:
            return pd.Series([None] * len(va), dtype="object")
        mb = _stack_valid(vb, ok, "cosine_vectorized(b)")
        if ma.shape[1] != mb.shape[1]:
            raise ValueError(
                f"cosine_vectorized: dim mismatch between sides "
                f"({ma.shape[1]} vs {mb.shape[1]})"
            )
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        out = np.divide(num, den, out=np.zeros_like(num), where=den != 0.0)
        if ok.all():
            return pd.Series(out)
        it = iter(out.tolist())
        return pd.Series([next(it) if o else None for o in ok], dtype="object")

    # asNondeterministic: the verify pattern is `select(cos AS cos_sim)
    # .filter(cos_sim >= t)`, and Catalyst pushes the filter below the
    # projection by DUPLICATING the UDF — two ArrowEvalPython nodes,
    # every surviving pair paying the cosine twice (optimization guide
    # §4.4; seen in the r11 x67/x15 plans). Marking it non-deterministic
    # forbids the copy, yielding one evaluation. The function is in fact
    # deterministic — this is purely an optimizer fence, results are
    # identical — and no other filter needs to push past it here.
    return cos_pd.asNondeterministic()(a, b)


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row ``query`` frame.

    ``query`` must have columns ``(id_col, vec_col)`` and exactly one
    row; it is broadcast, so the corpus side is a narrow scan and the
    top-k compiles to TakeOrderedAndProject (per-partition heaps, no
    global sort) — this survives any corpus size.
    """
    q = query.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = (
        embeddings.join(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            id_col,
            (F.round(cosine(F.col(vec_col), F.col("__qvec")), 6) + F.lit(0.0)).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), id_col).limit(k)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact k-NN for every query row: broadcast queries × corpus.

    Output: (query_id, vec_id, cos_sim, rank). Scale: cost is
    |queries| × |corpus| dot products distributed over corpus
    partitions — fine for small query batches; for large query sets
    use :func:`lsh_ann_topk` per partition instead.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        "query_id",
        id_col,
        (F.round(cosine(F.col(vec_col), F.col("__qvec")), 6) + F.lit(0.0)).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-Python LCG —
    no RNG dependency, reproducible across processes/versions)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        vals: list[float] = []
        acc = 0.0
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            u = state / float(1 << 31)
            state = (1103515245 * state + 12345) % (1 << 31)
            v = state / float(1 << 31)
            # Box-Muller for roughly Gaussian directions.
            g = math.sqrt(-2.0 * math.log(max(u, 1e-12))) * math.cos(2 * math.pi * v)
            vals.append(g)
            acc += g * g
        nrm = math.sqrt(acc) or 1.0
        planes.append([v / nrm for v in vals])
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit j = 1 iff dot(vec, plane_j) >= 0.

    Same NULL/dim contract as :func:`lsh_bucket_gemm`: a NULL vector
    gets a NULL bucket (drops out of bucket equi-joins), a non-NULL
    vector of the wrong dimension raises — a systematically wrong
    dim is a caller bug that must not silently empty the result.
    An empty plane list is likewise a caller bug (bucket 0 for every
    row would silently degrade LSH to an all-pairs join) and raises
    the same ``ValueError`` in both formulations.
    """
    if not planes:
        raise ValueError("lsh_bucket: planes must be non-empty")
    dim = len(planes[0])
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec_col, plane_col) >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return (
        F.when(vec_col.isNull(), F.lit(None).cast("long"))
        .when(
            F.size(vec_col) != dim,
            F.raise_error(
                F.concat(
                    F.lit(f"lsh_bucket: expected embedding dim {dim}, got "),
                    F.size(vec_col).cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(bucket)
    )


def lsh_bucket_gemm(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id as :func:`lsh_bucket`, computed with one
    numpy GEMM per Arrow batch instead of ``len(planes)`` interpreted
    higher-order dot products per row (measured ~40x on the
    near-dup path; same rationale as ``embedding_near_dups``'s
    multi-table variant). float64 both sides, ``>= 0`` sign
    convention identical to :func:`lsh_bucket` — including the NULL/
    dim contract: a NULL vector gets a NULL bucket (and thus drops
    out of any bucket equi-join) instead of crashing the task, while
    a non-NULL vector of the wrong dimension raises ``ValueError``
    (a dim mismatch is a caller bug, not dirty data — silently
    NULL-bucketing a systematically mis-dimensioned dataset would
    return an empty result with no signal).
    """
    from pyspark.sql.types import LongType

    if not planes:
        raise ValueError("lsh_bucket_gemm: planes must be non-empty")
    n_planes = len(planes)

    @F.pandas_udf(LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        import numpy as np

        planes_m = np.asarray(planes, dtype=np.float64)  # (P, dim)
        ok = vecs.notnull()
        computed: list = []
        mat = _stack_valid(vecs, ok, "lsh_bucket_gemm")
        if mat is not None:
            if mat.shape[1] != planes_m.shape[1]:
                raise ValueError(
                    f"lsh_bucket_gemm: expected embedding dim "
                    f"{planes_m.shape[1]}, got {mat.shape[1]}"
                )
            signs = (mat @ planes_m.T) >= 0.0  # (rows, P)
            weights = np.left_shift(
                np.int64(1), np.arange(n_planes, dtype=np.int64)
            )
            computed = (signs.astype(np.int64) @ weights).tolist()
        it = iter(computed)
        return pd.Series([next(it) if o else None for o in ok], dtype="object")

    # asNondeterministic: downstream bucket equi-joins add an
    # isnotnull filter on the computed bucket, which Catalyst pushes
    # below the projection by DUPLICATING the UDF (two GEMM towers per
    # join side in the r11 x06 plan — guide §4.4). Deterministic in
    # fact; the mark is an optimizer fence only, results identical.
    return bucket_of.asNondeterministic()(vec_col)


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.8,
    n_tables: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: multi-table hyperplane
    LSH candidate generation + exact cosine verification.

    ``n_tables`` independent bucket tables of ``n_planes`` sign bits
    each; a pair is a candidate iff it shares an exact bucket in ANY
    table (recall grows with tables, bucket size shrinks with planes).
    Every returned pair is exact-verified: cos >= ``threshold``.

    Scale posture: bucketing is one narrow pass; candidates come from
    one shuffle keyed by (table, bucket) — same shape as MinHash-LSH
    (dedup.minhash_lsh_candidates), which is the proven 100 TB layout.
    The verify join only touches candidate ids.
    """
    from pyspark.sql.types import ArrayType, LongType

    all_planes = hyperplanes(dim, n_tables * n_planes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def all_buckets(vecs: pd.Series) -> pd.Series:
        # One numpy GEMM per Arrow batch computes every table's sign
        # bits at once — 48 interpreted higher-order-function dot
        # products per row (the pure-Column formulation) is ~40x
        # slower; this is the documented Arrow-batched escape hatch.
        import numpy as np

        planes_m = np.asarray(all_planes, dtype=np.float64)  # (T*P, dim)
        ok = vecs.notnull()
        computed: list = []
        mat = _stack_valid(vecs, ok, "embedding_near_dups")
        if mat is not None:
            if mat.shape[1] != planes_m.shape[1]:
                raise ValueError(
                    f"embedding_near_dups: expected embedding dim "
                    f"{planes_m.shape[1]}, got {mat.shape[1]}"
                )
            signs = (mat @ planes_m.T) >= 0.0  # (rows, T*P)
            weights = np.left_shift(
                np.int64(1), np.arange(n_planes, dtype=np.int64)
            )
            computed = [
                [
                    int(chunk @ weights)
                    for chunk in row.reshape(n_tables, n_planes).astype(np.int64)
                ]
                for row in signs
            ]
        # NULL bucket array -> posexplode drops the row: a NULL vector
        # silently yields no candidates, matching lsh_bucket semantics.
        it = iter(computed)
        return pd.Series([next(it) if o else None for o in ok], dtype="object")

    # Pin the narrow (id, table, bucket) frame: it feeds BOTH sides of
    # the candidate self-join, and without the checkpoint each side
    # re-ran the whole scan + hyperplane-GEMM Arrow UDF (two
    # ArrowEvalPython towers in the r11 x15 plan). Linear and narrow
    # (n_tables longs per vector), lazily materialized on first action.
    from skoltexter_by_ai_spark.operators.pinning import pin

    buckets = pin(
        embeddings.select(
            F.col(id_col).alias("__id"), F.posexplode(all_buckets(F.col(vec_col)))
        ).withColumnsRenamed({"pos": "__tab", "col": "__bucket"}),
        eager=False,
    )
    cands = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["__tab", "__bucket"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    vecs = embeddings.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec"))
    return (
        cands.join(vecs.withColumnsRenamed({"__vid": "id_a", "__vec": "__va"}), "id_a")
        .join(vecs.withColumnsRenamed({"__vid": "id_b", "__vec": "__vb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.round(cosine_vectorized(F.col("__va"), F.col("__vb")), 6) + F.lit(0.0)).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    sample_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse centroids via Lloyd iterations on a
    hash-selected sample.

    The sample is the ``n_centroids * sample_factor`` rows with the
    smallest ``xxhash64(id)`` — a stable, engine-independent draw (no
    RNG state), collected to the driver. That collect is tiny and
    *stays* tiny at 100 TB: the prefilter is a narrow scan + TakeOrdered
    of a few hundred rows, never the corpus. Lloyd runs a fixed
    ``iters`` sweeps in float64 numpy seeded from the first
    ``n_centroids`` sample rows (hash order), so the result is
    bit-reproducible across runs and cluster sizes.

    Cosine geometry: sample vectors are L2-normalized before clustering
    and returned centroids are re-normalized, so nearest-centroid by
    dot product equals nearest by cosine.
    """
    import numpy as np

    sample_rows = (
        embeddings.select(
            F.col(vec_col).alias("__v"), F.xxhash64(F.col(id_col)).alias("__h")
        )
        .orderBy("__h", "__v")
        .limit(n_centroids * sample_factor)
        .collect()
    )
    mat = np.asarray([r["__v"] for r in sample_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    mat = mat / norms
    centroids = mat[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        cn = np.linalg.norm(centroids, axis=1, keepdims=True)
        cn[cn == 0.0] = 1.0
        centroids = centroids / cn
    return [[float(x) for x in row] for row in centroids]


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) coarse centroid.

    One Arrow-batched GEMM per batch — (rows × dim) @ (dim × C) — the
    same justified escape hatch as ``embedding_near_dups``'s bucketing,
    with the same NULL/dim contract: NULL vector → NULL cell, wrong
    dimension → ``ValueError``. At scale the assigned frame is written
    ``partitionBy(out_col)`` so probes become partition-pruned scans
    (see :func:`ivf_ann_topk`).
    """

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if not len(vecs):
            return pd.Series([], dtype="int32")
        cm = np.asarray(centroids, dtype=np.float64)  # (C, dim), unit rows
        ok = vecs.notnull()
        mat = _stack_valid(vecs, ok, "ivf_assign")
        if mat is None:
            return pd.Series([None] * len(vecs), dtype="object")
        if mat.shape[1] != cm.shape[1]:
            raise ValueError(
                f"ivf_assign: expected embedding dim {cm.shape[1]}, "
                f"got {mat.shape[1]}"
            )
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        cells = np.argmax((mat / nrm) @ cm.T, axis=1)
        if ok.all():
            return pd.Series(cells.astype("int32"))
        it = iter(int(c) for c in cells)
        return pd.Series([next(it) if o else None for o in ok], dtype="object")

    # asNondeterministic: the probe filter on the assigned cell gets
    # pushed below this projection by duplicating the UDF (two GEMM
    # towers in the r11 x73 plan — guide §4.4). Optimizer fence only.
    return embeddings.withColumn(out_col, nearest.asNondeterministic()(F.col(vec_col)))


def ivf_ann_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` inverted lists whose
    centroids are closest to the query, exact-rerank only those rows.

    The second ANN family next to :func:`lsh_ann_topk` (SURVEY §2.4
    "IVF or LSH-bucketed variant as the scale path"): LSH prunes by
    random sign buckets, IVF by data-adaptive Voronoi cells — better
    recall/scan-fraction on clustered corpora. ``nprobe == n_centroids``
    degenerates to the exact scan (tested invariant: equals
    :func:`cosine_topk` bit-for-bit).

    Scale posture: centroids are a driver-side constant (KBs);
    assignment is one narrow Arrow pass. In production the corpus is
    written once partitioned by ``ivf_cell`` so each query scans only
    ``nprobe / n_centroids`` of the data via partition pruning — here
    the filter plays that role on an unpartitioned fixture.
    """
    import numpy as np

    centroids = ivf_centroids(
        embeddings, n_centroids=n_centroids, iters=iters, id_col=id_col, vec_col=vec_col
    )
    corpus = ivf_assign(embeddings, centroids, vec_col=vec_col)

    cm = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for v in vecs:
            if v is None:
                out.append(None)  # NULL query vector -> no probes, row drops
                continue
            q = np.asarray(v, dtype=np.float64)
            if q.shape[0] != cm.shape[1]:
                raise ValueError(
                    f"ivf_ann_topk: expected query dim {cm.shape[1]}, "
                    f"got {q.shape[0]}"
                )
            n = np.linalg.norm(q) or 1.0
            order = np.argsort(-(cm @ (q / n)), kind="stable")
            out.append([int(c) for c in order[:nprobe]])
        return pd.Series(out)

    q = query.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        # asNondeterministic: same §4.4 duplication fence as `nearest`.
        probe_cells.asNondeterministic()(F.col(vec_col)).alias("__probes"),
    )
    return (
        corpus.join(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .filter(F.array_contains(F.col("__probes"), F.col("ivf_cell")))
        .select(
            id_col,
            (F.round(cosine(F.col(vec_col), F.col("__qvec")), 6) + F.lit(0.0)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 2,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket prefilter + exact re-rank.

    Candidates = rows whose bucket is within ``max_hamming`` sign-bit
    flips of the query's bucket; exact cosine re-ranks them. At scale
    the corpus would be written partitioned/bucketed by the LSH bucket,
    making the prefilter a partition-pruned scan instead of a full pass.
    """
    planes = hyperplanes(dim, n_planes, seed)
    # GEMM bucketing on BOTH sides — the same float64 arithmetic must
    # assign the query and the corpus their buckets, or a plane dot
    # near zero could land the two formulations on different sides.
    corpus = embeddings.withColumn("__bucket", lsh_bucket_gemm(F.col(vec_col), planes))
    q = query.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        lsh_bucket_gemm(F.col(vec_col), planes).alias("__qbucket"),
    )
    return (
        corpus.join(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .filter(
            F.bit_count(F.col("__bucket").bitwiseXOR(F.col("__qbucket"))) <= max_hamming
        )
        .select(
            id_col,
            (F.round(cosine(F.col(vec_col), F.col("__qvec")), 6) + F.lit(0.0)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, round_to: int = 6
) -> DataFrame:
    """Per-label mean embedding — class prototypes for nearest-class-
    mean probes, clustering diagnostics, and per-class drift checks.

    Returns ``(label, n_vecs, centroid)`` with the centroid rounded to
    ``round_to`` places per dimension (the suite's cross-engine float
    convention). Shuffles once on (label, dim) for the per-dimension
    mean — partial aggregation does the heavy lifting map-side — then
    once on label to reassemble the (dim-bounded) array; no
    ``collect``, no UDF, scale-bound by labels × dims, not rows.
    """
    # posexplode_OUTER so a NULL/empty vector still emits one (NULL,
    # NULL) row: the row count per label then rides the SAME exploded
    # scan (sum of per-(label, pos) counts at pos 0 or NULL == exact
    # COUNT(*) of the input, NULL-vector rows included) — previously a
    # second full scan of df plus a join reassembled n_vecs (r11).
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode_outer(_as_double(F.col(vec_col))).alias("__pos", "__v"),
    )
    dims = ex.groupBy("label", "__pos").agg(
        F.avg("__v").alias("__m"), F.count("*").alias("__c")
    )
    return dims.groupBy("label").agg(
        F.sum(
            F.when((F.col("__pos") == 0) | F.col("__pos").isNull(), F.col("__c"))
        ).alias("n_vecs"),
        F.transform(
            F.array_sort(
                # Drop the NULL-position row (the empty/NULL-vector
                # marker) before assembling the centroid array.
                F.filter(
                    F.collect_list(F.struct("__pos", "__m")),
                    lambda s: s["__pos"].isNotNull(),
                )
            ),
            # + 0.0 normalizes IEEE negative zero: a mean of near-
            # cancelling components can round to -0.0 in one engine and
            # +0.0 in the other (value-equal, repr/hash-distinct — the
            # r10 skew-fixture sweep caught exactly this), and
            # (-0.0) + 0.0 == +0.0 in round-to-nearest on both.
            lambda s: F.round(s["__m"], round_to) + F.lit(0.0),
        ).alias("centroid"),
    ).filter(
        # A label whose vectors are ALL empty/NULL has no centroid —
        # the pre-r11 inner join dropped it; keep that contract. The
        # NULL label group is dropped too: the pre-r11 nv.join(cent,
        # 'label') used non-null-safe equality (matching the oracle's
        # USING (label) join), so a NULL-label row never survived —
        # the r11 single-groupBy rewrite silently kept it (ADVICE r11).
        F.size("centroid") > 0
    ).filter(F.col("label").isNotNull())


def nearest_centroid_labels(
    cents: DataFrame, round_to: int = 6
) -> DataFrame:
    """For each label: the nearest OTHER label by centroid cosine —
    the confusion-prone class pairs. Input is
    :func:`label_centroids`' output; the all-pairs join is labels²
    (bounded by class count, never rows), broadcast on one side.
    Cosine runs on the ROUNDED centroids so both engines fold
    identical inputs.
    """
    a = cents.select(
        F.col("label"), F.col("n_vecs"), F.col("centroid")
    )
    b = cents.select(
        F.col("label").alias("__olabel"), F.col("centroid").alias("__ocent")
    )
    pairs = a.join(F.broadcast(b), F.col("label") != F.col("__olabel")).withColumn(
        "__cos", F.round(cosine(F.col("centroid"), F.col("__ocent")), round_to) + F.lit(0.0)
    )
    w = Window.partitionBy("label").orderBy(
        F.col("__cos").desc(), F.col("__olabel")
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "label",
            "n_vecs",
            F.col("__olabel").alias("nearest_label"),
            F.col("__cos").alias("nearest_cos"),
            "centroid",
        )
    )


def label_outliers(
    df: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str,
    min_cos: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """Label-noise screen: each vector's cosine to its OWN label's
    centroid, flagging vectors below ``min_cos`` as suspect — the
    standard first pass for mislabeled-sample triage in a training
    set. Returns ``(id, label, cos_to_centroid, is_outlier)``.

    The centroid table (:func:`label_centroids`, labels × dims sized)
    broadcasts onto a narrow scan of the vectors — one pass over the
    data beyond the centroid aggregation itself; no pairwise work.
    """
    cents = label_centroids(df, label_col, vec_col, round_to=round_to)
    joined = df.select(
        F.col(id_col), F.col(label_col).alias("label"), F.col(vec_col).alias("__v")
    ).join(F.broadcast(cents.select("label", "centroid")), "label")
    cos = F.round(cosine(F.col("__v"), F.col("centroid")), round_to) + F.lit(0.0)
    return joined.select(
        F.col(id_col),
        "label",
        cos.alias("cos_to_centroid"),
        (cos < min_cos).alias("is_outlier"),
    )
