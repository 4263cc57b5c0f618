"""Round-17 optimization profiler: per-query wall time, Spark job count,
and .explain('formatted') capture for any registry subset.

Methodology matches bench.py (same session confs, warm reps then timed
min) so numbers are comparable; adds:
- job counting via the status tracker + setJobGroup (the per-round
  action count is THE cost driver for the iterative-fixpoint queries at
  bench scale, where every job pays a fixed scheduling floor);
- plan capture to plans/r18/<query>_<tag>.txt for the judge's plan-claim
  checks (explain shows the RETURNED DataFrame's plan; for iterative
  operators whose loop executes eagerly inside fn(), the job count is
  the loop-shape evidence and the plan file covers the final relation).

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/profile_r18.py TAG q1 q2 ...
  (TAG = 'before'/'after'; query args support exact names only)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clif_spark.queries import collect_registry  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = int(os.environ.get("PROFILE_WARM", "3"))
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    registry = collect_registry()
    missing = [n for n in names if n not in registry]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # identical local-microbench confs to bench.py
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
    spark = build_session(app_name="clif-spark-profile",
                          shuffle_partitions=parts, extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    if table_bytes < (1 << 30):
        from clif_spark import session as _session
        _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                                  "spark.sql.adaptive.enabled": "false"}
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    os.makedirs("plans/r18", exist_ok=True)
    for name in names:
        q = registry[name]
        sc.setJobDescription(f"profile:{name}")
        for _ in range(warm):
            q.fn(spark, sf_dir).collect()
        best, best_jobs = float("inf"), None
        for r in range(reps):
            group = f"prof-{name}-{tag}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(group))
            if dt < best:
                best, best_jobs = dt, jobs
            build = t_build
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r18/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        out[name] = {"sec": round(best, 3), "jobs": best_jobs,
                     "build_sec": round(build, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
