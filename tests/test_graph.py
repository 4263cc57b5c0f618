"""operators.graph: exactness of the integer-micros PageRank beyond the
micros scale — the r10 ADVICE regression (floor(double) vs true integer
division diverges once ranks exceed ~2^53)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401


def test_pagerank_integer_division_exact_beyond_double_precision(spark):
    """One iteration from a caller-supplied init vector whose magnitude
    exceeds double precision: floor(r/od) computed through doubles
    would round 2^54+3 to 2^54+4 and yield //2 + 1 — the engine must
    match the pure-Python integer computation bit for bit (the
    warm-start contract's claim for ANY long-domain input)."""
    from clif_spark.operators import graph as G

    big = (1 << 54) + 3  # not double-representable; floor(big/2.0) != big//2
    assert int(float(big)) != big  # precondition of the regression
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string")
    init = spark.createDataFrame(
        [("a", big), ("b", 7), ("c", 11)],
        "node string, rank_micros long")

    # pure-Python mirror of one exact integer iteration
    n = 3
    teleport = ((100 - 85) * 1_000_000 // 100) // n
    contrib = big // 2  # a's rank split over out-degree 2
    expected = {
        "a": teleport,  # no inbound edges
        "b": teleport + (85 * contrib) // 100,
        "c": teleport + (85 * contrib) // 100,
    }
    got = {r.node: r.rank_micros for r in
           G.pagerank_fixed(edges, iterations=1, init_ranks=init)
            .collect()}
    assert got == expected
    # and the divergence is real: the double path would differ on b/c
    double_contrib = int(float(big) / 2)
    assert double_contrib != contrib
