"""Round-18 A/B (VERDICT r17 item 7): count-gated broadcast on the
bowtie classifier's three node-sized left joins (SMJ on unknown-
estimate checkpoint lineage per the r17 audit) vs the honest SMJ.

The SCC + BFS legs dominate web_bowtie_classes; this isolates the
CLASSIFIER (guide §1.1): the four input relations are materialized
once, then the two join shapes run interleaved over them.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bowtie_bcast_ab_r18.py
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
    reps = int(os.environ.get("AB_REPS", "7"))
    table_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = max(2, min(cpus, table_bytes // (2 << 20)))
    confs = {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.rdd.compress": "false",
        "spark.broadcast.compress": "false",
        "spark.locality.wait": "0",
    }
    spark = build_session(app_name="clif-bowtie-ab",
                          shuffle_partitions=parts, extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    if table_bytes < (1 << 30):
        from clif_spark import session as _session
        _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                                  "spark.sql.adaptive.enabled": "false"}
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    # materialize the four classifier inputs ONCE (exactly what the
    # query computes before its final joins)
    ring = (W._link_edges(spark, sf_dir)
            .filter(F.col("dst").startswith("src"))
            .filter(F.col("src") != F.col("dst")))
    n = F.regexp_extract("src", r"(\d+)", 1).cast("int")
    e = ring.filter(~n.isin(4, 19))
    rev = (e.filter((n >= 8) & (n <= 14))
           .select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = e.unionByName(rev).distinct().localCheckpoint(eager=True)
    scc = G.strongly_connected_components(edges).localCheckpoint(
        eager=True)
    sizes = scc.groupBy("component").agg(F.count(F.lit(1)).alias("__c"))
    core_lab = (sizes.orderBy(F.desc("__c"), F.asc("component"))
                .limit(1).select("component"))
    core = (scc.join(F.broadcast(core_lab), "component", "semi")
            .select("node").localCheckpoint(eager=True))
    rev_edges = edges.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))
    reaches_core = (G.bfs_depths(rev_edges, core).select("node")
                    .localCheckpoint(eager=True))
    reached_from = (G.bfs_depths(edges, core).select("node")
                    .localCheckpoint(eager=True))

    def classify(bcast: bool):
        c, i, o = core, reaches_core, reached_from
        if bcast:
            c, i, o = F.broadcast(c), F.broadcast(i), F.broadcast(o)
        return (scc
                .join(c.withColumn("__core", F.lit(1)), "node", "left")
                .join(i.withColumn("__in", F.lit(1)), "node", "left")
                .join(o.withColumn("__out", F.lit(1)), "node", "left")
                .select(F.col("node").alias("host"),
                        F.when(F.col("__core") == 1, F.lit("core"))
                         .when(F.col("__in") == 1, F.lit("in"))
                         .when(F.col("__out") == 1, F.lit("out"))
                         .otherwise(F.lit("other"))
                         .alias("bowtie_class")))

    assert (sorted(map(tuple, classify(False).collect()))
            == sorted(map(tuple, classify(True).collect())))
    smj = classify(False)._jdf.queryExecution().executedPlan().toString()
    bhj = classify(True)._jdf.queryExecution().executedPlan().toString()
    print({"smj_plan_SMJ": smj.count("SortMergeJoin"),
           "bhj_plan_SMJ": bhj.count("SortMergeJoin"),
           "bhj_plan_BHJ": bhj.count("BroadcastHashJoin")})

    for _ in range(warm):
        classify(False).collect()
        classify(True).collect()
    best = {"smj": float("inf"), "bhj": float("inf")}
    hist = {"smj": [], "bhj": []}
    for _ in range(reps):
        for tag, flag in (("smj", False), ("bhj", True)):
            t0 = time.perf_counter()
            classify(flag).collect()
            dt = time.perf_counter() - t0
            hist[tag].append(round(dt, 3))
            best[tag] = min(best[tag], dt)
    print({"sf_dir": sf_dir, "parts": int(parts),
           "best": {k: round(v, 3) for k, v in best.items()},
           "hist": hist})
    spark.stop()


if __name__ == "__main__":
    main()
