"""Round-18 same-session interleaved A/Bs on the graph family:

1. SCC trim-loop probe (ADVICE r17): narrow flags-agg "nothing to
   trim" probe vs the r17 shape that materializes an identical e2 on
   the final layer — web_host_scc query path.
2. PageRank checkpointed-rank shape (VERDICT r17 item 6): per-
   iteration eager rank checkpoints (checkpoint_every=1) vs the
   chained K-plan (default 4, i.e. no mid-loop cut at K=3), which pays
   ~8 BroadcastExchange collect sub-jobs on the final action —
   pagerank_weighted on the warm row's edge relation.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/graph_ab_r18.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clif_spark.operators import graph as G  # noqa: E402
from clif_spark.queries import web as W  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = int(os.environ.get("AB_WARM", "2"))
    reps = int(os.environ.get("AB_REPS", "5"))
    table_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = max(2, min(cpus, table_bytes // (2 << 20)))
    biggest = max(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    confs = {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.rdd.compress": "false",
        "spark.broadcast.compress": "false",
        "spark.locality.wait": "0",
        "spark.sql.files.maxPartitionBytes": str(
            min(128 << 20, max(16 << 20, biggest // cpus))),
    }
    spark = build_session(app_name="clif-graph-ab",
                          shuffle_partitions=parts, extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    if table_bytes < (1 << 30):
        from clif_spark import session as _session
        _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                                  "spark.sql.adaptive.enabled": "false"}
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    from clif_spark.queries import collect_registry
    registry = collect_registry()
    scc_fn = registry["web_host_scc"].fn

    def scc_probe():
        G._TRIM_PROBE = True
        try:
            scc_fn(spark, sf_dir).collect()
        finally:
            G._TRIM_PROBE = False

    def scc_plain():
        scc_fn(spark, sf_dir).collect()

    # warm-row edge relation for the pagerank shape A/B
    from clif_spark.functions import url as urlfn
    edges = (W._link_urls(spark, sf_dir)
             .select("src_host", "u",
                     urlfn.url_host(F.col("u")).alias("dst_host"))
             .groupBy("src_host", "dst_host")
             .agg(F.count_distinct(F.col("u")).cast("long")
                  .alias("n_urls"))
             .localCheckpoint(eager=True))

    def pr(ce):
        G.pagerank_weighted(edges, iterations=3, src_col="src_host",
                            dst_col="dst_host", weight_col="n_urls",
                            checkpoint_every=ce).collect()

    # bit-identity sanity once (exact integer arithmetic — must agree)
    a = sorted(map(tuple, G.pagerank_weighted(
        edges, iterations=3, src_col="src_host", dst_col="dst_host",
        weight_col="n_urls", checkpoint_every=4).collect()))
    b = sorted(map(tuple, G.pagerank_weighted(
        edges, iterations=3, src_col="src_host", dst_col="dst_host",
        weight_col="n_urls", checkpoint_every=1).collect()))
    assert a == b, "checkpoint_every changed the result!"

    cases = {
        "scc_plain": scc_plain,
        "scc_probe": scc_probe,
        "pr_chained(ce=4)": lambda: pr(4),
        "pr_ckpt_per_iter(ce=1)": lambda: pr(1),
    }
    for _ in range(warm):
        for fn in cases.values():
            fn()
    best = {k: float("inf") for k in cases}
    jobs = {}
    hist = {k: [] for k in cases}
    for r in range(reps):
        for tag, fn in cases.items():
            group = f"ab-{tag}-{r}"
            sc.setJobGroup(group, tag)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            hist[tag].append(round(dt, 3))
            if dt < best[tag]:
                best[tag] = dt
                jobs[tag] = len(tracker.getJobIdsForGroup(group))
    print({"sf_dir": sf_dir, "parts": int(parts),
           "best": {k: round(v, 3) for k, v in best.items()},
           "jobs": jobs, "hist": hist})
    spark.stop()


if __name__ == "__main__":
    main()
