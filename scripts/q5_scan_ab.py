"""q5 scan-floor A/B (VERDICT r12 item 7): the named cause of q5's
residual sf10 gap is parquet scan+probe throughput on the ~1.5 GB
lineitem leg — with Spark's default 128 MiB split size that leg scans
as ~12 tasks on a 32-core host, leaving two thirds of the cores idle
during the longest stage. The lever under test is
spark.sql.files.maxPartitionBytes (smaller splits -> more scan tasks).

Protocol: ONE session, the conf flipped per rep and reps INTERLEAVED
(a-b-a-b...) so both arms sample the same host phase (this VM's CPU is
bimodal, minutes-long phases — BASELINE.md); min-of-N per arm; q1 and
q3 ride along as controls (same lineitem scan shape, different probe
profiles). maxPartitionBytes is a runtime SQL conf, so flipping it per
rep re-splits the scan without a new session.

Usage: python scripts/q5_scan_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clif_spark.queries import collect_registry
from clif_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clif_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    arms = {
        "128m-default": str(128 * 1024 * 1024),
        "32m": str(32 * 1024 * 1024),
        "16m": str(16 * 1024 * 1024),
    }
    queries = ["q5_local_supplier_volume", "q3_shipping_priority",
               "q1_pricing_summary"]
    reg = collect_registry()
    spark = build_session(app_name="q5-scan-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: one pass per arm so codegen/classloading is paid before timing
    for conf in arms.values():
        spark.conf.set("spark.sql.files.maxPartitionBytes", conf)
        for q in queries:
            reg[q].fn(spark, sf_dir).collect()

    best: dict[tuple[str, str], float] = {
        (a, q): float("inf") for a in arms for q in queries}
    for _ in range(reps):
        for arm, conf in arms.items():  # interleaved: same-phase ratio
            spark.conf.set("spark.sql.files.maxPartitionBytes", conf)
            for q in queries:
                t0 = time.perf_counter()
                reg[q].fn(spark, sf_dir).collect()
                best[(arm, q)] = min(best[(arm, q)],
                                     time.perf_counter() - t0)

    for q in queries:
        row = {a: round(best[(a, q)], 3) for a in arms}
        print(q, row, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
