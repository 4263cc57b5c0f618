"""Round-17 plan audit: dump .explain('formatted') for EVERY registry
query at a small SF and grep the plans for the red flags the
optimization guide names (guide §7.2): SortMergeJoin where a broadcast
fits, CartesianProduct, row-at-a-time Python (BatchEvalPython), scans
with an empty PushedFilters under a selective predicate, unexpected
Exchange counts.

Queries whose fn() runs eagerly (stores, folds, streams) execute their
lifecycle during plan construction — that is the price of auditing the
real returned relation; the audit session mirrors bench confs.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
           python scripts/plan_audit_r17.py [outdir]
Writes <outdir>/<query>.txt plus one summary line per query on stdout.
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clif_spark.queries import collect_registry  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r17/audit"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(app_name="clif-plan-audit", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = collect_registry()
    rows = []
    for name, q in registry.items():
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            rows.append((name, {"ERROR": 1}))
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(traceback.format_exc())
            continue
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        flags = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "bnl": plan.count("BroadcastNestedLoopJoin"),
            "py_row": plan.count("BatchEvalPython"),
            "py_arrow": (plan.count("ArrowEvalPython")
                         + plan.count("MapInArrow")
                         + plan.count("FlatMapGroupsInPandas")
                         + plan.count("MapInPandas")),
            "no_pushdown_scans": len(re.findall(
                r"PushedFilters: \[\]", plan)),
            "scans": plan.count("Scan parquet"),
        }
        rows.append((name, flags))
    for name, flags in rows:
        interesting = {k: v for k, v in flags.items() if v}
        print(f"{name:42s} {interesting}")
    spark.stop()


if __name__ == "__main__":
    main()
