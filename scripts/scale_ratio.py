"""Same-phase Spark-vs-DuckDB ratio harness for scale datapoints beyond
the shipped testdata (BASELINE.md curve rows): runs each named query
min-of-3 on Spark AND its DuckDB oracle min-of-3 in the SAME process
(this host's CPU is bimodal with minutes-long phases — only a ratio taken
seconds apart is comparable), with the md5 calibration constant alongside.

The DuckDB side runs under a wall-clock budget (watchdog thread calling
con.interrupt()): at sf10 some oracles are deliberately the full
recompute an incremental operator avoids, and "did not finish" is itself
the datapoint.

Usage:
    python scripts/scale_ratio.py /tmp/clif_sf1 q1 q2 ... [--budget 600]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clif_spark.queries import collect_registry  # noqa: E402
from clif_spark.session import build_session  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _calib_ms() -> float:
    t0 = time.perf_counter()
    h = b"x"
    for _ in range(200000):
        h = hashlib.md5(h).digest()
    return round((time.perf_counter() - t0) * 1000, 1)


def _duck_timed(con, sql: str, budget: float) -> float | None:
    """One budgeted execution; None = interrupted (did not finish)."""
    done = threading.Event()

    def watchdog():
        if not done.wait(budget):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.perf_counter()
    try:
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    except Exception:
        return None
    finally:
        done.set()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    budget = 600.0
    if "--budget" in args:
        i = args.index("--budget")
        budget = float(args[i + 1])
        del args[i:i + 2]
    sf_dir, names = args[0], args[1:]
    reg = collect_registry()
    spark = build_session(app_name="clif-scale-ratio",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    for name in names:
        q = reg[name]
        rec: dict = {"query": name, "sf_dir": sf_dir,
                     "calib_ms": _calib_ms()}
        q.fn(spark, sf_dir).collect()  # warm (plans, codegen, caches)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            n = len(q.fn(spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        rec["spark_sec"] = round(best, 2)
        rec["rows"] = n
        ref_sql = q.oracle or getattr(q, "bench_ref_sql", None)
        if ref_sql:
            times = []
            for _ in range(3):
                dt = _duck_timed(con, ref_sql, budget)
                if dt is None:
                    times = None
                    break
                times.append(dt)
            if times is None:
                rec["duckdb_sec"] = None
                rec["duckdb_dnf_budget_sec"] = budget
            else:
                rec["duckdb_sec"] = round(min(times), 2)
                if rec["duckdb_sec"] > 0:
                    rec["ratio"] = round(
                        rec["spark_sec"] / rec["duckdb_sec"], 2)
        rec["calib_ms_after"] = _calib_ms()
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
