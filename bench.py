"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect). A small warm-up
query first absorbs one-time JVM/codegen startup so per-query numbers
reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clif_spark.queries import collect_registry
from clif_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"
    registry = collect_registry()
    headliners = [q for q in registry.values() if q.headline]

    spark = build_session(app_name="clif-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM classloading + JIT for the physical operators the
    # headliners use (shuffle, hash-agg, window, broadcast join, explode,
    # hash functions) so per-query numbers reflect steady-state execution.
    warm = spark.range(10000).selectExpr(
        "id", "md5(cast(id as string)) AS h", "id % 7 AS k")
    warm.groupBy("k").count().collect()
    warm.selectExpr("*", "row_number() OVER (PARTITION BY k ORDER BY h) AS rn") \
        .join(spark.range(7).selectExpr("id AS k"), "k").collect()
    spark.range(100).selectExpr(
        "explode(sequence(1, 10)) AS e").distinct().collect()

    timings: dict[str, float] = {}
    for q in headliners:
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).collect()
        timings[q.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
