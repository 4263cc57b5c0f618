"""Dump .explain('formatted') for the named registry queries.

Usage: python scripts/plan_dump_r17.py <outdir> <suffix> <q1> <q2> ...
Run from any checkout; writes <outdir>/<query>_<suffix>.txt. Plans are
captured at sf0.001 (shape, not size, is the evidence) with the bench's
AQE-off posture so initial plans show the join strategies the bench
actually executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clif_spark import session as _session  # noqa: E402
from clif_spark.queries import collect_registry  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                              "spark.sql.adaptive.enabled": "false"}
    spark = build_session(app_name="clif-plan-dump", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = collect_registry()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
