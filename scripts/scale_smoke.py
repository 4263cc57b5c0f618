"""Scale-smoke harness: run registered queries against a larger-SF dataset
and print per-query wall time — the reproduction path for the BASELINE.md
round-7 "one decade past the gate" measurements.

Usage:
    python scripts/scale_smoke.py /tmp/clif_sf1 [query ...]
    python scripts/scale_smoke.py /tmp/clif_sf1 --prefix pipeline_
    python scripts/scale_smoke.py /tmp/clif_sf1 --prefix stream_ mm_

With no query names, runs every registered query (slow at sf1 — prefer a
--prefix or an explicit list). Generate scale data first with
``python scripts/gen_sf.py 1`` (see gen_sf.py for layout notes). Timings
are wall-clock of one full execution (plan + execute + count) on a fresh
plan; the md5 calibration constant prints alongside so readings can be
phase-normalized (BASELINE.md host notes).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clif_spark.queries import collect_registry  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def _calib_ms() -> float:
    t0 = time.perf_counter()
    h = b"x"
    for _ in range(200000):
        h = hashlib.md5(h).digest()
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    sf_dir = sys.argv[1]
    args = sys.argv[2:]
    prefixes: list[str] = []
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--prefix":
            prefixes.extend(x for x in it)
        else:
            names.append(a)
    reg = collect_registry()
    if names:
        todo = [reg[n] for n in names]
    elif prefixes:
        todo = [q for n, q in reg.items()
                if any(n.startswith(p) for p in prefixes)]
    else:
        todo = list(reg.values())
    spark = build_session(app_name="clif-scale-smoke",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    total = 0.0
    for q in todo:
        t0 = time.perf_counter()
        try:
            n = q.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            total += dt
            print(f"{q.name}: {dt:.1f}s rows={n} calib={_calib_ms()}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{q.name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
    print(f"total: {total:.1f}s over {len(todo)} queries", flush=True)


if __name__ == "__main__":
    main()
