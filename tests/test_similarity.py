"""Unit tests for similarity search: exact cosine math + ANN recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators import similarity
from skoltexter_by_ai_spark.sources.tables import load_table


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # close to 0
        (2, [0.0, 1.0, 0.0]),  # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact_ordering(spark):
    emb = _vecs(spark)
    out = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    ids = [r.vec_id for r in out]
    assert ids == [1, 4, 2, 3]
    assert abs(out[0].cos_sim - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-5
    assert out[2].cos_sim == 0.0
    assert out[3].cos_sim == -1.0


def test_knn_join_rank_per_query(spark):
    emb = _vecs(spark)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.knn_join(emb, queries, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    # rank 1 is always the query itself (cos=1), rank 2 the nearest other.
    assert sorted(by_q[0]) == [(1, 0), (2, 1)]
    assert sorted(by_q[1]) == [(1, 1), (2, 0)]


def test_lsh_ann_recall_on_clustered_data(spark):
    # LSH prefiltering only has signal when neighbors are actually
    # close (uniform-random corpora have no locality to exploit), so
    # build a clustered corpus: 20 small perturbations of the query
    # vector buried in 200 other random vectors.
    import random

    rng = random.Random(7)
    dim = 16
    query_vec = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(0, query_vec)]
    for i in range(1, 21):  # near-dups of the query
        rows.append((i, [x + rng.gauss(0, 0.05) for x in query_vec]))
    for i in range(21, 221):  # background noise
        rows.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = emb.filter(F.col("vec_id") == 0)

    exact = [r.vec_id for r in similarity.cosine_topk(emb, query, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.lsh_ann_topk(
            emb, query, k=10, n_planes=12, max_hamming=2, dim=dim
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"recall {recall}: exact={exact} approx={approx}"


def test_lsh_ann_runs_on_fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    out = similarity.lsh_ann_topk(emb, query, k=10, n_planes=12, max_hamming=4).collect()
    assert len(out) <= 10
    assert all(r.cos_sim is not None for r in out)


def test_embedding_near_dups_finds_planted_cluster(spark):
    """All planted near-dup pairs above threshold must be found
    (multi-table LSH recall), and every returned pair must verify."""
    import random

    rng = random.Random(11)
    dim = 16
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(i, [x + rng.gauss(0, 0.02) for x in base]) for i in range(8)]  # tight cluster
    rows += [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(8, 108)]  # noise
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = similarity.embedding_near_dups(
        emb, threshold=0.95, n_tables=12, n_planes=6, dim=dim
    ).collect()
    pairs = {(r.id_a, r.id_b): r.cos_sim for r in out}

    # Exact ground truth for the cluster block.
    cluster = emb.filter(F.col("vec_id") < 8)
    truth = {
        (r.id_a, r.id_b)
        for r in cluster.alias("a")
        .join(cluster.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            similarity.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .filter(F.col("c") >= 0.95)
        .collect()
    }
    assert truth, "test fixture must contain genuine near-dups"
    missing = truth - set(pairs)
    assert not missing, f"LSH missed planted pairs: {missing}"
    for (a, b), c in pairs.items():
        assert c >= 0.95


def test_lsh_bucket_matches_python_oracle(spark):
    """Bucket bits must equal sign(dot(vec, plane_j)) computed in Python.

    Guards against Catalyst mis-resolving the per-plane dot-product
    lambda trees (structurally identical, differing only in literals) —
    the failure mode that silently collapsed the minhash hash family.
    """
    import random

    rng = random.Random(3)
    dim, n_planes = 8, 6
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.hyperplanes(dim, n_planes, seed=42)
    got = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", similarity.lsh_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    # float32 storage: replicate Spark's cast(float)->double on the vec side.
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    for vid, vec in rows:
        expected = 0
        for j, plane in enumerate(planes):
            d = sum(f32(x) * p for x, p in zip(vec, plane))
            if d >= 0:
                expected |= 1 << j
        assert got[vid] == expected, f"vec {vid}: got {got[vid]:b}, want {expected:b}"
    assert len(set(got.values())) > 1


def test_lsh_bucket_gemm_equals_column_formulation(spark, sf_dir):
    """The Arrow/GEMM bucketing must assign the SAME bucket as the
    pure-Column formulation on every fixture vector: lsh_ann_topk's
    candidate set depends on the two arithmetic paths (numpy float64
    GEMM vs codegen'd fold) agreeing on every sign bit."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = similarity.hyperplanes(64, 12, seed=42)
    mism = emb.select(
        similarity.lsh_bucket(F.col("embedding"), planes).alias("b1"),
        similarity.lsh_bucket_gemm(F.col("embedding"), planes).alias("b2"),
    ).filter(F.col("b1") != F.col("b2"))
    assert mism.count() == 0


def test_hyperplanes_deterministic():
    a = similarity.hyperplanes(8, 4, seed=1)
    b = similarity.hyperplanes(8, 4, seed=1)
    c = similarity.hyperplanes(8, 4, seed=2)
    assert a == b
    assert a != c
    for plane in a:
        assert abs(sum(x * x for x in plane) - 1.0) < 1e-9  # unit norm


def test_ivf_probe_all_equals_exact(spark, sf_dir):
    """nprobe == n_centroids degenerates to the exact scan: results
    must match cosine_topk bit-for-bit (same rounding, same tiebreak)."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    exact = similarity.cosine_topk(emb, query, k=10).collect()
    ivf = similarity.ivf_ann_topk(
        emb, query, k=10, n_centroids=8, nprobe=8
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in ivf] == [
        (r.vec_id, r.cos_sim) for r in exact
    ]


def test_ivf_partial_probe_recall(spark, sf_dir):
    """Probing 6 of 16 cells must keep most of the true top-10 — IVF's
    value is a high recall at a fraction of the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    exact_ids = {r.vec_id for r in similarity.cosine_topk(emb, query, k=10).collect()}
    ivf_ids = {
        r.vec_id
        for r in similarity.ivf_ann_topk(
            emb, query, k=10, n_centroids=16, nprobe=6
        ).collect()
    }
    assert len(ivf_ids) == 10
    assert len(exact_ids & ivf_ids) / 10 >= 0.5


def test_ivf_assign_cells_in_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    cells = similarity.ivf_assign(emb, cents).select("ivf_cell").distinct().collect()
    vals = {r.ivf_cell for r in cells}
    assert vals <= set(range(8))
    # Lloyd on real data should populate more than one cell.
    assert len(vals) > 1


def test_ivf_centroids_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = similarity.ivf_centroids(emb, n_centroids=4, iters=2)
    b = similarity.ivf_centroids(emb, n_centroids=4, iters=2)
    assert a == b


def test_ivf_partitioned_layout_prunes_probe_scan(spark, sf_dir, tmp_path):
    """The scale path claimed in ivf_ann_topk's docstring: a corpus
    written partitionBy(ivf_cell) turns the probe into a partition-
    pruned scan — the non-probed cells are never opened."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8)
    corpus = similarity.ivf_assign(emb, cents)
    out = str(tmp_path / "ivf_corpus")
    corpus.write.partitionBy("ivf_cell").parquet(out)

    probed = spark.read.parquet(out).filter(F.col("ivf_cell").isin([0, 1, 2]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:200], plan
    # Pruning must be real: the probed scan reads fewer rows than the
    # corpus, and exactly the rows of the probed cells.
    expect = corpus.filter(F.col("ivf_cell").isin([0, 1, 2])).count()
    assert probed.count() == expect < emb.count()


def test_label_centroids_exact_means_and_counts(spark):
    from skoltexter_by_ai_spark.operators.similarity import (
        label_centroids,
        nearest_centroid_labels,
    )

    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [3.0, 0.0]),
            (3, "b", [0.0, 2.0]),
            (4, "c", [1.0, 1.0]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    cents = {r.label: (r.n_vecs, r.centroid) for r in label_centroids(df, "label", "embedding").collect()}
    assert cents == {"a": (2, [2.0, 0.0]), "b": (1, [0.0, 2.0]), "c": (1, [1.0, 1.0])}
    near = {r.label: (r.nearest_label, r.nearest_cos) for r in
            nearest_centroid_labels(label_centroids(df, "label", "embedding")).collect()}
    # c ([1,1]) is equidistant (cos 0.707107) from a and b -> label tie-break picks a.
    assert near["a"][0] == "c" and near["b"][0] == "c"
    assert near["c"] == ("a", 0.707107)


def test_label_outliers_flags_below_threshold(spark):
    from skoltexter_by_ai_spark.operators.similarity import label_outliers

    # Label "a": two aligned vectors and one pointing the opposite way.
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [1.0, 0.1]),
            (3, "a", [-1.0, 0.0]),
            (4, "b", [0.0, 1.0]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    out = {r.vec_id: r for r in label_outliers(df, "vec_id", "label", "embedding", min_cos=0.0).collect()}
    assert out[1].is_outlier is False and out[2].is_outlier is False
    assert out[3].is_outlier is True and out[3].cos_to_centroid < 0
    assert out[4].is_outlier is False and out[4].cos_to_centroid == 1.0


def test_lsh_gemm_paths_tolerate_null_vectors(spark):
    """A NULL embedding must get a NULL bucket (row silently skipped
    downstream), matching the pure-Column lsh_bucket's NULL-in/
    NULL-out semantics — not crash the Arrow batch (ADVICE r5:
    np.vstack over a None crashed the task)."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(6)]
    rows += [(98, None)]  # NULL vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.hyperplanes(8, 4, seed=1)
    got = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id",
            similarity.lsh_bucket_gemm(F.col("embedding"), planes).alias("b"),
        ).collect()
    }
    assert got[98] is None
    assert all(got[i] is not None for i in range(6))
    # lsh_ann_topk end-to-end: NULL rows drop out instead of failing.
    q = spark.createDataFrame([rows[0]], "vec_id long, embedding array<float>")
    out = similarity.lsh_ann_topk(
        emb, q, k=3, n_planes=4, max_hamming=4, dim=8, seed=1
    ).collect()
    assert {r.vec_id for r in out}.isdisjoint({98})
    # embedding_near_dups end-to-end: multi-table UDF likewise guarded.
    pairs = similarity.embedding_near_dups(
        emb, threshold=-1.0, n_tables=2, n_planes=2, dim=8, seed=1
    ).collect()
    ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert ids and ids.isdisjoint({98})


def test_null_vector_contract_parity_across_formulations(spark):
    """ADVICE r6 item 1: lsh_bucket and lsh_bucket_gemm must agree on
    the NULL convention — NULL vector -> NULL bucket in BOTH — so
    mixing the two formulations across join sides treats NULL rows
    identically (dropped) instead of colliding them into bucket 0."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(5)]
    rows += [(98, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.hyperplanes(8, 4, seed=1)
    both = emb.select(
        "vec_id",
        similarity.lsh_bucket(F.col("embedding"), planes).alias("b_col"),
        similarity.lsh_bucket_gemm(F.col("embedding"), planes).alias("b_gemm"),
    ).collect()
    for r in both:
        assert r.b_col == r.b_gemm, f"vec {r.vec_id}: {r.b_col} != {r.b_gemm}"
        if r.vec_id == 98:
            assert r.b_col is None

    # cosine_vectorized and ivf_assign share the contract: NULL in,
    # NULL out (VERDICT r6 item 6 — previously np.vstack crashed).
    cos = emb.select(
        "vec_id",
        similarity.cosine_vectorized(
            F.col("embedding"), F.col("embedding")
        ).alias("c"),
    ).collect()
    for r in cos:
        assert (r.c is None) == (r.vec_id == 98)
    cents = [[1.0 if j == i else 0.0 for j in range(8)] for i in range(2)]
    cells = {
        r.vec_id: r.ivf_cell
        for r in similarity.ivf_assign(emb, cents).collect()
    }
    assert cells[98] is None
    assert all(cells[i] is not None for i in range(5))


def test_wrong_dim_vectors_raise_not_silently_drop(spark):
    """ADVICE r6 item 4: a non-NULL vector of the WRONG dimension is a
    caller bug (dim parameter mismatch), not dirty data — every vector
    UDF path must raise instead of silently producing an empty result."""
    import pytest

    rows = [(0, [1.0] * 8), (1, [1.0, 2.0])]  # second row: dim 2, not 8
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = similarity.hyperplanes(8, 4, seed=1)
    with pytest.raises(Exception, match="dim"):
        emb.select(
            similarity.lsh_bucket_gemm(F.col("embedding"), planes).alias("b")
        ).collect()
    with pytest.raises(Exception, match="dim"):
        emb.select(
            similarity.lsh_bucket(F.col("embedding"), planes).alias("b")
        ).collect()
    with pytest.raises(Exception, match="dim"):
        similarity.embedding_near_dups(
            emb, threshold=-1.0, n_tables=2, n_planes=2, dim=8, seed=1
        ).collect()
    cents = [[1.0 if j == i else 0.0 for j in range(8)] for i in range(2)]
    with pytest.raises(Exception, match="dim"):
        similarity.ivf_assign(emb, cents).collect()


def test_empty_planes_rejected_identically_by_both_formulations(spark):
    """ADVICE r7 item 1: zero hyperplanes would silently degrade LSH
    to one all-pairs bucket — both formulations must raise the same
    ValueError instead (lsh_bucket previously raised IndexError while
    lsh_bucket_gemm returned bucket 0)."""
    import pytest

    with pytest.raises(ValueError, match="planes must be non-empty"):
        similarity.lsh_bucket(F.col("embedding"), [])
    with pytest.raises(ValueError, match="planes must be non-empty"):
        similarity.lsh_bucket_gemm(F.col("embedding"), [])


def test_cosine_topk_rounds_to_exactly_six_places(spark):
    """cos_sim is contractually ROUND(·, 6) — the cross-engine
    convention every oracle uses; a 7-place score would hash-mismatch
    DuckDB on any irrational cosine."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    q = spark.createDataFrame([(9, [1.0, 0.0])], "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.cos_sim for r in similarity.cosine_topk(corpus, q, k=2).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 0.707107  # round(1/sqrt(2), 6), never 0.7071068
    # knn_join shares the 6-place contract (its round call is a
    # separate site).
    knn = {
        r.vec_id: r.cos_sim
        for r in similarity.knn_join(
            corpus, q.withColumnRenamed("vec_id", "query_id"), k=2
        ).collect()
    }
    assert knn == got


def test_ivf_centroids_are_unit_normalized(spark):
    """ivf_centroids' contract: returned centroids are L2-normalized
    so nearest-by-dot == nearest-by-cosine; any non-unit centroid
    skews the cell assignment toward its magnitude."""
    import math
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) + 2.0 for _ in range(8)]) for i in range(64)
    ]  # +2 shift: cluster means are far from zero, so a skipped
    #    normalization yields norms well above 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.ivf_centroids(emb, n_centroids=4, iters=2)
    for c in cents:
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-9


def test_cosine_topk_default_k_is_ten(spark):
    """Default k=10: the documented default must cap the result."""
    import random

    rng = random.Random(5)
    corpus = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(15)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(99, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert similarity.cosine_topk(corpus, q).count() == 10


def test_hyperplanes_are_reproducible_golden(spark):
    """The LCG hyperplane family is a persistence contract: buckets
    computed today must match buckets computed by any future run, so
    the generator constants are pinned by value."""
    got = similarity.hyperplanes(4, 2, seed=7)
    want = [
        [-0.472193445018, -0.80852198752, 0.146741661378, 0.319049261079],
        [-0.290907940831, 0.07648049756, 0.038397045957, 0.952916035292],
    ]
    for g_row, w_row in zip(got, want):
        for g, w in zip(g_row, w_row):
            assert abs(g - w) < 1e-11


def test_lsh_bucket_single_plane_and_zero_dot_boundary(spark):
    """One plane is legal (dim comes from planes[0], the only plane),
    and a dot product of EXACTLY zero sets the bit (>= convention) —
    in BOTH formulations, or mixed-formulation joins disagree on
    boundary vectors."""
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    planes = [[1.0, 0.0]]  # dot([0,1], [1,0]) == 0 exactly
    out = emb.select(
        similarity.lsh_bucket(F.col("embedding"), planes).alias("b"),
        similarity.lsh_bucket_gemm(F.col("embedding"), planes).alias("bg"),
    ).collect()[0]
    assert out.b == 1 and out.bg == 1


def test_embedding_near_dups_rounds_to_six_places(spark):
    """embedding_near_dups' cos_sim shares the ROUND(·, 6) contract."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    pairs = similarity.embedding_near_dups(
        emb, threshold=0.5, n_tables=8, n_planes=2, dim=4, seed=1
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert pairs[0].cos_sim == 0.707107  # never 0.7071068


def test_ivf_ann_topk_wrong_dim_query_raises_value_error(spark):
    """The wrong-dim error path must raise ValueError with the
    expected/got dims in the message (not a secondary IndexError from
    a broken message template) — callers catch ValueError to surface
    dataset misconfiguration."""
    import pytest
    import random

    rng = random.Random(2)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    bad_q = spark.createDataFrame(
        [(99, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception) as ei:
        similarity.ivf_ann_topk(emb, bad_q, k=3, n_centroids=4).collect()
    msg = str(ei.value)
    assert "expected query dim 8" in msg and "got 3" in msg


# --- round-10 mutation-sweep killers --------------------------------------------


def test_hyperplanes_are_bit_reproducible_golden():
    """The docstring PROMISES cross-process/version reproducibility of
    the LCG hyperplanes — pin exact values so any constant drift in
    the generator (multiplier, increment, modulus, scale) is a test
    failure, not a silent re-bucketing of every LSH index built with
    an older version (mutation sweep r10: the 1<<31 modulus mutants
    survived because nothing pinned actual values)."""
    from skoltexter_by_ai_spark.operators.similarity import hyperplanes

    # EXACT bit patterns (float.hex), not a decimal round: the r10
    # sweep registered the v-draw modulus mutant (1<<31 -> 1<<32) as
    # equivalent because a round(·, 10) golden could not see it, but
    # the FP cos is NOT exactly 1-periodic (2*math.pi is inexact), so
    # the mutant wobbles the last ulps — re-verified r11: 16k of 28k
    # values differ across seeds/dims, including THIS fixture. A
    # persisted LSH index is keyed on exact sign bits, so exact-bit
    # reproducibility is the contract to pin.
    got = [[v.hex() for v in p] for p in hyperplanes(3, n_planes=2, seed=42)]
    assert got == [
        [
            "-0x1.3e4aa8b5c76b9p-1",
            "0x1.01c7e398a688fp-3",
            "0x1.8bd46f5921c6dp-1",
        ],
        [
            "0x1.ff904e9bd8155p-3",
            "-0x1.d0dddb954bf11p-4",
            "-0x1.ec5a54adf52f4p-1",
        ],
    ]


def test_embedding_near_dups_keeps_pairs_exactly_at_threshold(spark):
    """The verify filter is >= threshold: an identical pair (cos_sim
    exactly 1.0) must survive threshold=1.0 — identical vectors share
    every LSH bucket, so the pair always reaches the filter."""
    from skoltexter_by_ai_spark.operators.similarity import embedding_near_dups

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    got = embedding_near_dups(emb, threshold=1.0, dim=4).collect()
    assert [(r.id_a, r.id_b, r.cos_sim) for r in got] == [(1, 2, 1.0)]


def test_ivf_centroids_default_iters_contract(spark):
    """iters=3 is the documented default; on a fixture where Lloyd has
    NOT converged by round 3 (verified in-test: round 4 still moves
    the centroids), the default must equal the explicit-3 result."""
    import numpy as np

    from skoltexter_by_ai_spark.operators.similarity import ivf_centroids

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=4)]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c3 = ivf_centroids(df, n_centroids=3, iters=3, sample_factor=8)
    c4 = ivf_centroids(df, n_centroids=3, iters=4, sample_factor=8)
    assert c3 != c4  # the fixture discriminates: not yet converged
    assert ivf_centroids(df, n_centroids=3, sample_factor=8) == c3


def test_ivf_ann_topk_default_nprobe_contract(spark):
    """nprobe=4 is the documented default: with 6 well-separated
    2-vector clusters and k larger than four cells can supply, the
    result size IS the probe budget (8 rows from 4 cells); probing a
    5th cell would return 10."""
    import math

    from skoltexter_by_ai_spark.operators.similarity import ivf_ann_topk

    pts, vid = [], 0
    for a in (0, 30, 60, 90, 120, 180):
        for d in (-2, 2):
            th = math.radians(a + d)
            pts.append((vid, [math.cos(th), math.sin(th)]))
            vid += 1
    corpus = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(100, [1.0, 0.0])], "vec_id long, embedding array<double>")
    explicit = ivf_ann_topk(corpus, q, k=12, n_centroids=6, nprobe=4, iters=3)
    assert explicit.count() == 8  # 4 cells x 2 members
    default = ivf_ann_topk(corpus, q, k=12, n_centroids=6, iters=3)
    assert sorted(r.vec_id for r in default.collect()) == sorted(
        r.vec_id for r in explicit.collect()
    ) == [0, 1, 2, 3, 4, 5, 6, 7]


def test_label_outliers_default_rounding_golden(spark):
    """round_to=6 is the documented default; golden values with a
    7th significant decimal pin it (0.894427 vs 0.8944272 at 7)."""
    from skoltexter_by_ai_spark.operators.similarity import label_outliers

    lab = spark.createDataFrame(
        [(1, "x", [1.0, 0.0]), (2, "x", [1.0, 1.0])],
        "id long, label string, v array<double>",
    )
    got = label_outliers(lab, "id", "label", "v").orderBy("id").collect()
    assert [(r.id, r.cos_to_centroid) for r in got] == [(1, 0.894427), (2, 0.948683)]


def test_label_centroids_normalize_negative_zero(spark):
    """A mean of near-cancelling components that rounds to zero must
    come out as +0.0, never IEEE -0.0: the two are value-equal but
    repr/hash-distinct, so one engine emitting -0.0 where the other
    emits 0.0 fails driver-style value parity (caught live by the r10
    skew-fixture sweep on x94)."""
    import math

    from skoltexter_by_ai_spark.operators.similarity import label_centroids

    # mean = (1e-9 + -2e-9) / 2 = -5e-10 -> rounds to zero, negative
    lab = spark.createDataFrame(
        [(1, "x", [1e-9, 1.0]), (2, "x", [-2e-9, 1.0])],
        "id long, label string, v array<double>",
    )
    cent = label_centroids(lab, "label", "v").collect()[0].centroid
    assert cent[0] == 0.0 and math.copysign(1.0, cent[0]) == 1.0
    assert cent[1] == 1.0


def test_label_centroids_counts_null_and_empty_vectors(spark):
    # r11: n_vecs rides the exploded scan (posexplode_outer) instead of
    # a second COUNT(*) pass — the fused count must still equal exact
    # COUNT(*) per label with NULL/empty vectors present, and a label
    # whose vectors are ALL empty/NULL must drop entirely (the old
    # inner join's behavior).
    rows = [
        (0, "a", [1.0, 3.0]),
        (1, "a", None),          # counted in n_vecs, ignored in the mean
        (2, "a", []),            # likewise
        (3, "b", [2.0, 2.0]),
        (4, "c", None),          # label with no usable vectors at all
        (5, "c", []),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = {r.label: r for r in similarity.label_centroids(df, "label", "embedding").collect()}
    assert set(out) == {"a", "b"}  # c dropped: no centroid
    assert out["a"].n_vecs == 3
    assert out["a"].centroid == [1.0, 3.0]
    assert out["b"].n_vecs == 1
    assert out["b"].centroid == [2.0, 2.0]


def test_label_centroids_drops_null_label_group(spark):
    # ADVICE r11: the pre-r11 nv.join(cent, "label") used non-null-safe
    # equality (the oracle's USING (label) semantics), so a NULL-label
    # group never reached the output even when its vectors were
    # non-empty. The r11 single-groupBy rewrite must preserve that.
    rows = [
        (0, None, [5.0, 5.0]),
        (1, None, [7.0, 9.0]),
        (2, "a", [1.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = {r.label: r for r in similarity.label_centroids(df, "label", "embedding").collect()}
    assert set(out) == {"a"}
    assert out["a"].n_vecs == 1
    assert out["a"].centroid == [1.0, 3.0]
