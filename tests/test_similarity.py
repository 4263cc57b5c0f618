"""Distributed k-means (Lloyd's) operator tests — convergence and
assignment invariants; the trained-quantizer path ivf_centroids documents."""

from __future__ import annotations

from clif_spark import similarity

def test_kmeans_inertia_monotone_and_recovers_separated_clusters(spark):
    """Lloyd's invariants on a well-separated synthetic corpus: inertia is
    non-increasing across iterations, and the final assignment recovers the
    planted clusters exactly (every planted group maps to one cell)."""
    import itertools

    rows = []
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
               [0.0, 0.0, 10.0, 0.0]]
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(20):
            vec = [x + 0.01 * ((vid * 7 + d) % 5) for d, x in enumerate(c)]
            rows.append((vid, vec, ci))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "truth"])
    cents, assigned, hist = similarity.kmeans(
        df, k=3, max_iter=8, vec_col="embedding")
    assert all(a >= b - 1e-9 for a, b in itertools.pairwise(hist)), hist
    got = {(r.truth, r.cell) for r in
           assigned.join(df.select("vec_id", "truth"), "vec_id").collect()}
    # bijection: each planted cluster -> exactly one cell, and vice versa
    assert len({t for t, _ in got}) == 3 and len({c for _, c in got}) == 3
    assert len(got) == 3, got
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)


def test_kmeans_assignment_matches_returned_centroids(spark):
    """The returned (centroids, assignments) pair is self-consistent: every
    point's cell is the argmin distance to the RETURNED centroids — not the
    half-Lloyd's-step-earlier ones — even when max_iter stops early."""
    rows = [(i, [float(i % 7), float((3 * i) % 11)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents, assigned, _ = similarity.kmeans(df, k=4, max_iter=1)
    by_id = dict(rows)
    for r in assigned.collect():
        v = by_id[r.vec_id]
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        assert dists[r.cell] <= min(dists) + 1e-9, (r.vec_id, r.cell, dists)


def test_kmeans_rejects_zero_iterations(spark):
    import pytest

    df = spark.createDataFrame([(0, [0.0, 1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        similarity.kmeans(df, k=1, max_iter=0)


def test_kmeans_k1_is_global_mean(spark):
    """k=1 degenerates to the global mean vector (one Lloyd's update)."""
    df = spark.createDataFrame(
        [(i, [float(i), float(2 * i)]) for i in range(10)],
        ["vec_id", "embedding"])
    cents, _, _ = similarity.kmeans(df, k=1, max_iter=2)
    assert abs(cents[0][0] - 4.5) < 1e-9
    assert abs(cents[0][1] - 9.0) < 1e-9


def test_probe_buckets_enumerates_hamming_ball(spark):
    """probe_buckets('101', mp=2) = the 1+3+3 distinct signatures within
    Hamming distance 2, each still n_planes long."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("101",)], ["b"])
    got = df.select(similarity.probe_buckets(
        F.col("b"), 3, 2).alias("p")).first().p
    assert len(got) == 7 and len(set(got)) == 7
    assert got[0] == "101" and all(len(p) == 3 for p in got)
    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))
    assert {ham("101", p) for p in got[1:4]} == {1}
    assert {ham("101", p) for p in got[4:]} == {2}

    import pytest

    with pytest.raises(ValueError):
        similarity.probe_buckets(F.col("b"), 3, 3)


def test_lsh_multiprobe_recall_dominates_bare_table(spark):
    """On the sf0.001 corpus the Hamming-2 single-table config must find a
    strict superset of the bare single-table candidates (probing the exact
    bucket is probe 0), so its recall can only be >= the bare table's."""
    from clif_spark import io as cio
    from pyspark.sql import functions as F

    e = cio.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    bare = {(r.query_id, r.neighbor_id) for r in similarity.lsh_cosine_topk(
        e, qs, k=10, n_planes=5, n_tables=1).collect()}
    mp = {(r.query_id, r.neighbor_id) for r in similarity.lsh_cosine_topk(
        e, qs, k=10, n_planes=5, n_tables=1, multiprobe=2).collect()}
    truth = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(e, qs, k=10).collect()}
    assert len(mp & truth) >= len(bare & truth)


def test_trained_ivf_deterministic_with_usable_recall(spark):
    """The trained-quantizer path end-to-end: recall vs brute force stays
    non-degenerate under 2-of-8-cell pruning, and two INDEPENDENT
    trainings produce bit-identical centroids and search results (md5
    init + integer-micros centroid folds — no RNG, no float
    order-dependence). Cell-balance comparisons are deliberately NOT
    asserted: the synthetic embeddings are near-uniform, where k-means
    has no structure to find and either quantizer can win."""
    from pyspark.sql import functions as F

    from clif_spark import io, similarity

    e = io.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    truth = {}
    for r in similarity.cosine_topk(e, queries, k=10).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    cents, _, hist = similarity.kmeans(e, k=8, max_iter=5)
    assert hist == sorted(hist, reverse=True)  # Lloyd's never regresses
    trained = similarity.ivf_topk(e, queries, k=10, nprobe=2, n_cells=8,
                                  centroids=cents)
    got = {}
    for r in trained.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    assert hits / sum(len(t) for t in truth.values()) >= 0.3

    cents2, _, _ = similarity.kmeans(e, k=8, max_iter=5)
    assert cents2 == cents
    again = similarity.ivf_topk(e, queries, k=10, nprobe=2, n_cells=8,
                                centroids=cents2)
    assert sorted(map(tuple, again.collect())) == \
        sorted(map(tuple, trained.collect()))


def test_cosine_topk_arrow_matches_hof_fold(spark):
    """The BLAS path returns the identical (query, neighbor, 4dp-cos)
    result set as the oracle-gated HOF formulation at sf0.001."""
    from clif_spark.queries import collect_registry

    reg = collect_registry()
    sf = "/root/testdata/sf0.001"
    hof = {tuple(r) for r in reg["ann_cosine_topk"].fn(spark, sf).collect()}
    arrow = {tuple(r) for r in
             reg["ann_cosine_topk_arrow"].fn(spark, sf).collect()}
    assert arrow == hof


def test_bound_ipc_tasks_coalesces_fragmented_scans_only(spark):
    """_bound_ipc_tasks: a small file scan fragmented into many splits
    coalesces to ~bytes_per_task of input per task (never grows, never
    shuffles — the plan stays Coalesce, not Exchange); a non-file
    source (no resolvable input sizes) passes through untouched."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from clif_spark.similarity import _bound_ipc_tasks

    d = tempfile.mkdtemp(prefix="ipc_bound_")
    spark.range(10000).repartition(16).write.mode("overwrite").parquet(d)
    total = sum(os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d) if f.endswith(".parquet"))
    df = spark.read.parquet(d)
    current = df._jdf.rdd().getNumPartitions()
    # precondition: the scan is fragmented (Spark bin-packs the 16 tiny
    # part-files by openCost, but still yields several splits)
    assert current > 1
    bounded = _bound_ipc_tasks(df, bytes_per_task=total)  # -> 1 task
    assert bounded._jdf.rdd().getNumPartitions() == 1
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce" in plan and "Exchange" not in plan
    # rows intact
    assert bounded.count() == 10000
    # target above current -> no-op (never grows)
    same = _bound_ipc_tasks(df, bytes_per_task=1)
    assert same._jdf.rdd().getNumPartitions() == current
    # non-file source passes through
    mem = spark.range(100).select(F.col("id"))
    assert _bound_ipc_tasks(mem, bytes_per_task=1) is mem


def test_pq_encode_recovers_codebook_vectors(spark):
    """A vector built FROM codebook entries must encode to exactly those
    codes with zero reconstruction error (micros quantization is exact on
    codebook points), pinning argmin orientation and block offsets."""
    from clif_spark.similarity import pq as PQ

    cb = PQ.pq_codebook()
    # vector = block0 code 2 | block1 code 5 | block2 code 0 | block3 code 7
    picks = [2, 5, 0, 7]
    vec = [c / 1e6 for b, j in enumerate(picks) for c in cb[b][j]]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    row = PQ.pq_encode(df, cb).collect()[0]
    assert [row.code0, row.code1, row.code2, row.code3] == picks
    assert row.err == 0


def test_pq_train_beats_random_codebook(spark):
    """The trained codebook is a drop-in for the md5 one and cuts mean
    reconstruction error on real data — the pluggable-codebook contract
    (same shape as the trained-IVF quantizer swap)."""
    from clif_spark import io
    from clif_spark.similarity import pq as PQ

    e = io.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = PQ.pq_encode(e).agg({"err": "avg"}).collect()[0][0]
    cb = PQ.pq_train(e, max_iter=3)
    assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 16
    trained = PQ.pq_encode(e, cb).agg({"err": "avg"}).collect()[0][0]
    assert trained < base * 0.8, (trained, base)


def test_cosine_topk_arrow_nan_matches_fold_null_semantics(spark):
    """A zero-norm vector's cosine is SQL NULL in the fold (Spark returns
    NULL for 0.0/0.0) and ranks LAST under DESC; the arrow path's NaN is
    ranked -inf in the batch cut and converted to NULL afterward, so both
    paths agree bit-for-bit including the degenerate row."""
    from clif_spark import similarity
    from pyspark.sql import functions as F

    rows = [(i, [float(i + 1)] * 4) for i in range(6)] + [(9, [0.0] * 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = (df.filter(F.col("vec_id") == 0)
           .select(F.col("vec_id").alias("query_id"), "embedding"))
    hof = [(r.neighbor_id, r.cos) for r in
           similarity.cosine_topk(df, q, k=7)
           .orderBy(F.desc("cos"), "neighbor_id").collect()]
    arrow = [(r.neighbor_id, r.cos) for r in
             similarity.cosine_topk_arrow(df, q, k=7)
             .orderBy(F.desc("cos"), "neighbor_id").collect()]
    assert hof == arrow
    assert hof[-1] == (9, None)  # degenerate row present, NULL, ranked last
    # and with k smaller than the finite candidate count it drops entirely
    k3 = {r.neighbor_id for r in
          similarity.cosine_topk_arrow(df, q, k=3).collect()}
    assert 9 not in k3 and len(k3) == 3


def test_residual_ivfpq_cuts_trained_reconstruction_error(spark):
    """The mechanism residual encoding exploits, demonstrated where it
    exists: on CLUSTERED data (the regime IVF assumes), a codebook
    trained on (v - centroid) residuals reconstructs far better than one
    trained on raw vectors, because residual variance is only the
    within-cluster remainder. On structure-free uniform data (the
    shipped synthetic corpus) residuals cannot win — measured and
    expected — which is why ivfpq_topk documents residual mode as the
    clustered-corpus + pq_train pairing."""
    import numpy as np

    from clif_spark import similarity
    from clif_spark.similarity import pq as PQ
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    centers = rng.uniform(-0.5, 0.5, size=(8, 64))
    pts = np.repeat(centers, 50, axis=0) + rng.normal(
        0, 0.02, size=(400, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>")
    cents = [[float(x) for x in c] for c in centers]
    assigned = similarity.ivf_assign(df, cents)
    raw_cb = PQ.pq_train(assigned, max_iter=2, vec_col="__v")
    raw = (PQ.pq_encode(assigned, raw_cb, id_col="vec_id", vec_col="__v")
             .agg(F.avg("err")).collect()[0][0])
    res_vec = PQ._residualize(assigned, cents, "__v")
    res_cb = PQ.pq_train(res_vec, max_iter=2, vec_col="__v")
    res = (PQ.pq_encode(res_vec, res_cb, id_col="vec_id", vec_col="__v")
             .agg(F.avg("err")).collect()[0][0])
    assert res < raw * 0.5, (res, raw)


def test_pq_magnitude_guard_raises_not_wraps(spark):
    """A coordinate beyond the BIGINT-exact bound (|x| > 190) must raise
    loudly from pq_encode rather than silently overflowing the squared
    distance sum; in-range vectors still encode."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from clif_spark.similarity import pq as PQ

    ok = spark.createDataFrame(
        [(1, [1.0] * 64)], ["vec_id", "embedding"])
    assert PQ.pq_encode(ok).count() == 1
    bad = spark.createDataFrame(
        [(1, [1.0] * 63 + [1e3])], ["vec_id", "embedding"])
    with pytest.raises(SparkRuntimeException, match="overflow"):
        PQ.pq_encode(bad).collect()


def test_pq_train_rejects_indivisible_dim():
    """dim % m != 0 would silently drop trailing dimensions from every
    code — pq_train must refuse up front."""
    import pytest

    from clif_spark.similarity import pq as PQ

    with pytest.raises(ValueError, match="divide evenly"):
        PQ.pq_train(None, m=5, dim=64)


def test_pq_bound_derives_from_codebook_geometry(spark):
    """The BIGINT-overflow guard must track the ACTUAL geometry: a wider
    codebook (dim > 64) gets a proportionally tighter coordinate bound,
    so a coordinate that is safe at the default 64-dim layout raises at
    256 dims instead of silently wrapping the distance sum (r6 advisory:
    the hardcoded 64-term bound reopened the overflow for caller
    codebooks with sub_dim > 64)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from clif_spark.similarity import pq as PQ

    assert PQ._pq_max_abs(64) == PQ._PQ_MAX_ABS == 189
    assert PQ._pq_max_abs(256) == 94
    # 256 total dims: m=4 blocks of sub_dim=64 — |x|=150 is fine at the
    # default geometry but must raise here (150 > 94).
    cb = PQ.pq_codebook(m=4, ks=2, sub_dim=64)
    ok = spark.createDataFrame([(1, [90.0] * 256)], ["vec_id", "embedding"])
    assert PQ.pq_encode(ok, cb).count() == 1
    bad = spark.createDataFrame([(1, [150.0] * 256)], ["vec_id", "embedding"])
    with pytest.raises(SparkRuntimeException, match="overflow"):
        PQ.pq_encode(bad, cb).collect()
    # geometry so wide no integer bound survives must refuse up front
    with pytest.raises(ValueError, match="no BIGINT-exact"):
        PQ._pq_max_abs(10_000_000)


def test_semantic_dedup_drops_near_identical_keeps_distinct(spark):
    """SemDeDup composition on constructed geometry: two tight direction
    clusters plus exact/near copies — copies drop with kept
    representatives, distinct directions all survive, and the output
    partitions the input exactly once per id."""
    import math

    def vec(angle, scale=1.0):
        # 64-dim embedding living in a 2-plane: rotation by `angle`
        return [scale * math.cos(angle), scale * math.sin(angle)] + [0.0] * 62

    rows = [
        (0, vec(0.0)), (1, vec(0.001)),      # near-identical pair -> dedup
        (2, vec(1.5)), (3, vec(1.5, 2.0)),   # same direction, diff scale
        (4, vec(3.0)), (5, vec(-1.2)),       # distinct directions
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in similarity.semantic_dedup(
        df, threshold=0.999, k=2, max_iter=3).collect()}
    assert len(out) == 6                         # partition property
    assert out[1].status == "dropped" and out[1].dup_of == 0
    assert out[3].status == "dropped" and out[3].dup_of == 2  # cosine is scale-free
    for i in (0, 2, 4, 5):
        assert out[i].status == "kept" and out[i].dup_of is None
