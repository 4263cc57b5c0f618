"""Round-18 A/B (VERDICT r17 item 3): connected_components fused
convergence probe (r17 shape — the old-label join rides the round's
checkpoint job, probe = one narrow SUM) vs the r16 shape (separate
join+count probe job per round), on the exact web_host_components
query path (component labeling + size window).

Same-session INTERLEAVED min-of-N — the only protocol that survives
this host's bimodal CPU (BASELINE.md). Run at sf0.1 and sf1:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/cc_probe_ab_r18.py
  SPARK_GRAFT_SF_DIR=/tmp/clif_sf1       python scripts/cc_probe_ab_r18.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clif_spark.operators import graph as G  # noqa: E402
from clif_spark.queries import web as W  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def cc_old(edges: DataFrame, src_col: str = "src",
           dst_col: str = "dst",
           max_iters: int = G.FIXPOINT_MAX_ITERS) -> DataFrame:
    """r16 shape: per round one checkpoint job + one SEPARATE
    join+count convergence-probe job (verbatim from commit 1ac1bd3)."""
    s, d = F.col(src_col), F.col(dst_col)
    ue = (edges.select(s.alias("src"), d.alias("dst"))
          .unionByName(edges.select(d.alias("src"), s.alias("dst")))
          .filter(F.col("src") != F.col("dst"))
          .distinct()
          .localCheckpoint(eager=True))
    labels = (ue.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("component")))
    for rounds in range(1, max_iters + 1):
        cand = (ue.join(labels, ue["src"] == labels["node"])
                  .select(F.col("dst").alias("node"),
                          F.col("component").alias("cand")))
        nxt = (labels.unionByName(
                   cand.withColumnRenamed("cand", "component"))
               .groupBy("node")
               .agg(F.min("component").alias("component"))
               .localCheckpoint(eager=True))
        changed = (nxt.join(labels.withColumnRenamed("component", "old"),
                            "node")
                   .filter(F.col("component") != F.col("old")).count())
        labels = nxt
        if changed == 0:
            return labels
    raise RuntimeError("no convergence")


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
    spark = build_session(app_name="clif-cc-ab",
                          shuffle_partitions=parts, extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    if table_bytes < (1 << 30):
        from clif_spark import session as _session
        _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                                  "spark.sql.adaptive.enabled": "false"}
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    def run_new():
        comp = G.connected_components(
            W._host_component_edges(spark, sf_dir))
        comp.select(
            F.col("node").alias("host"), "component",
            F.count(F.lit(1)).over(Window.partitionBy("component"))
             .cast("long").alias("component_size")).collect()

    def run_old():
        comp = cc_old(W._host_component_edges(spark, sf_dir))
        comp.select(
            F.col("node").alias("host"), "component",
            F.count(F.lit(1)).over(Window.partitionBy("component"))
             .cast("long").alias("component_size")).collect()

    for _ in range(warm):
        run_old()
        run_new()
    best = {"old": float("inf"), "new": float("inf")}
    hist = {"old": [], "new": []}
    for _ in range(reps):
        for tag, fn in (("old", run_old), ("new", run_new)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            hist[tag].append(round(dt, 3))
            best[tag] = min(best[tag], dt)
    print({"sf_dir": sf_dir, "parts": int(parts),
           "old_min": round(best["old"], 3),
           "new_min": round(best["new"], 3),
           "old": hist["old"], "new": hist["new"]})
    spark.stop()


if __name__ == "__main__":
    main()
