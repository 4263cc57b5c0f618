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


def test_kmeans_k1_is_global_mean(spark):
    """k=1 degenerates to the global mean vector (one Lloyd's update)."""
    df = spark.createDataFrame(
        [(i, [float(i), float(2 * i)]) for i in range(10)],
        ["vec_id", "embedding"])
    cents, _, _ = similarity.kmeans(df, k=1, max_iter=2)
    assert abs(cents[0][0] - 4.5) < 1e-9
    assert abs(cents[0][1] - 9.0) < 1e-9
