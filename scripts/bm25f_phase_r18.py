"""Round-18 phase instrumentation for web_bm25f_incremental (VERDICT
r17 item 4): split the execution into build / fold-v0 / fold-v1 /
guard-probe / score phases with per-phase wall time and Spark job
count, to decide whether the two full-store CDC writes are worth
restructuring (guide §1 — measure first).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bm25f_phase_r18.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clif_spark import io, streaming as STR  # noqa: E402
from clif_spark.queries import web as W  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "3"))
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
    spark = build_session(app_name="clif-bm25f-phase",
                          shuffle_partitions=parts, extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    if table_bytes < (1 << 30):
        from clif_spark import session as _session
        _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                                  "spark.sql.adaptive.enabled": "false"}
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run_once(rep):
        phases = {}

        def phase(tag, fn):
            group = f"bm25f-{tag}-{rep}"
            sc.setJobGroup(group, tag)
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            phases[tag] = (round(dt, 3),
                           len(tracker.getJobIdsForGroup(group)))
            return out

        d = io.load_table(spark, sf_dir, "documents")
        root = tempfile.mkdtemp(prefix="clif_bm25f_phase_")
        did = F.col("doc_id")

        def build(v):
            part = d.filter(did % 2 == v)
            bc, ac = W._bm25f_counts(part)
            return (bc.withColumn("field", F.lit("body"))
                    .unionByName(ac.withColumn("field", F.lit("anchor"))))

        p0 = phase("build_partial_v0", lambda: build(0))
        phase("fold_v0", lambda: STR.fold_agg_snapshot(
            p0, root, keys=["host", "term", "field"], version=0,
            add_cols=["c"], lineage="bm25f-postings"))
        p1 = phase("build_partial_v1", lambda: build(1))
        phase("fold_v1", lambda: STR.fold_agg_snapshot(
            p1, root, keys=["host", "term", "field"], version=1,
            add_cols=["c"], lineage="bm25f-postings"))
        phase("guard_probe", lambda: STR.fold_agg_snapshot(
            p1, root, keys=["host", "term", "field"], version=1,
            add_cols=["c"], lineage="bm25f-postings"))
        stored = STR.read_cdc_snapshot(spark, root)
        phase("score_collect", lambda: W._bm25f_score(
            stored.filter(F.col("field") == "body")
                  .select("host", "term", "c"),
            stored.filter(F.col("field") == "anchor")
                  .select("host", "term", "c")).collect())
        return phases

    from clif_spark.queries import collect_registry
    fn = collect_registry()["web_bm25f_incremental"].fn
    for _ in range(2):
        fn(spark, sf_dir).collect()  # warm the whole path
    for rep in range(reps):
        print({"rep": rep, "phases": run_once(rep)})
    spark.stop()


if __name__ == "__main__":
    main()
