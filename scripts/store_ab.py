"""Write-amplification A/B across the engine's three store forms — the
measurement behind the LSM store's existence claim (BASELINE.md r12):
apply the SAME K keys-spray-everywhere deliveries through

  - the copy-on-write CDC snapshot   (upsert_cdc_snapshot: O(store)/delivery)
  - the partitioned snapshot store   (upsert_partitioned_snapshot:
    O(touched partitions)/delivery — degrades to O(store) when every
    delivery touches every partition, the high-churn shape)
  - the LSM segment store            (append_lsm_segment: O(delivery))

and report per-form: seconds for the delivery sequence, total bytes
written to disk across the sequence (the write amplification), and the
final read time. Deliveries are doc-count sized with keys uniformly
spread (doc_id % 9973), i.e. the keep-best-document-per-URL churn shape
every recrawl feed has.

The sequence is one SEEDING delivery (every key — the standing store)
followed by n small spray deliveries (~1% of keys each, uniformly
spread across the key space and hence across every partition): the
recrawl shape where the store is large and each delivery is small but
touches everything. Partition column is a pure function of the key
(k % 8) — the table-format constraint all three forms share.

Usage: python scripts/store_ab.py <sf_dir> [n_spray_deliveries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clif_spark import io, streaming as STR  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def file_map(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    if not os.path.exists(root):
        return out
    for dp, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dp, f)
            try:
                out[p] = os.path.getsize(p)
            except OSError:
                pass
    return out


def new_bytes(before: dict[str, int], root: str) -> int:
    """Bytes of files CREATED since ``before`` — the physical write
    cost. Growth alone under-counts dynamic partition overwrite (it
    replaces files in place); Spark part-files carry fresh job UUIDs
    per write, so new-name bytes = bytes written."""
    return sum(sz for p, sz in file_map(root).items() if p not in before)


def main() -> None:
    sf_dir = sys.argv[1]
    k_deliveries = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session(master=f"local[{os.cpu_count()}]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    d = io.load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def delivery(i: int):
        # i=0 seeds EVERY key; i>=1 sprays ~1% of keys uniformly
        base = d if i == 0 else d.filter(did % 97 == i)
        return (base.select(did.alias("k"),
                            did.alias("best_doc"),
                            (F.col("n_chars") + i).cast("long")
                             .alias("score"),
                            F.lit(False).alias("is_delete"),
                            (did % 8).cast("long").alias("part")))

    import tempfile

    results = {}

    # --- CoW CDC snapshot ---
    root = tempfile.mkdtemp(prefix="ab_cow_") + "/s"
    t0 = time.perf_counter()
    written = 0
    for i in range(k_deliveries + 1):
        before = file_map(root)
        STR.upsert_cdc_snapshot(delivery(i), root, ["k"],
                                ["score", "best_doc"])
        written += new_bytes(before, root)
    t_apply = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = STR.read_cdc_snapshot(spark, root).count()
    results["cow_snapshot"] = {"apply_s": round(t_apply, 2),
                               "bytes_written": written,
                               "read_s": round(time.perf_counter() - t0, 2),
                               "rows": n}

    # --- partitioned store (8 hash partitions; churn touches all) ---
    root = tempfile.mkdtemp(prefix="ab_part_") + "/s"
    t0 = time.perf_counter()
    written = 0
    for i in range(k_deliveries + 1):
        before = file_map(root)
        STR.upsert_partitioned_snapshot(delivery(i), root, ["k"],
                                        ["score", "best_doc"], "part")
        written += new_bytes(before, root)
    t_apply = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = STR.read_partitioned_snapshot(spark, root).count()
    results["partitioned"] = {"apply_s": round(t_apply, 2),
                              "bytes_written": written,
                              "read_s": round(time.perf_counter() - t0, 2),
                              "rows": n}

    # --- LSM segment store ---
    root = tempfile.mkdtemp(prefix="ab_lsm_") + "/s"
    t0 = time.perf_counter()
    written = 0
    for i in range(k_deliveries + 1):
        before = file_map(root)
        STR.append_lsm_segment(delivery(i), root, i + 1)
        written += new_bytes(before, root)
    t_apply = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = STR.read_lsm(spark, root, ["k"], ["score", "best_doc"]).count()
    t_read = time.perf_counter() - t0
    t0 = time.perf_counter()
    before = file_map(root)
    STR.compact_lsm(spark, root, ["k"], ["score", "best_doc"])
    results["lsm"] = {"apply_s": round(t_apply, 2),
                      "bytes_written": written,
                      "read_s": round(t_read, 2), "rows": n,
                      "compact_s": round(time.perf_counter() - t0, 2),
                      "compact_bytes": new_bytes(before, root)}

    # --- LSM + size-tiered scheduler (maintain_lsm after each append):
    # bytes_written here INCLUDES the tier folds — the amortized write
    # amplification the fanout policy trades for bounded read legs ---
    root = tempfile.mkdtemp(prefix="ab_lsmt_") + "/s"
    t0 = time.perf_counter()
    written = 0
    folds = 0
    for i in range(k_deliveries + 1):
        before = file_map(root)
        STR.append_lsm_segment(delivery(i), root, i + 1)
        folds += STR.maintain_lsm(spark, root, ["k"],
                                  ["score", "best_doc"], fanout=3)
        written += new_bytes(before, root)
    t_apply = time.perf_counter() - t0
    live_dirs = sum(
        1 for nm in os.listdir(root) if nm.startswith(("seg-", "run-")))
    t0 = time.perf_counter()
    n = STR.read_lsm(spark, root, ["k"], ["score", "best_doc"]).count()
    results["lsm_tiered"] = {"apply_s": round(t_apply, 2),
                             "bytes_written": written,
                             "read_s": round(time.perf_counter() - t0, 2),
                             "rows": n, "tier_folds": folds,
                             "live_dirs": live_dirs}

    # --- LSM segment skipping (r13): RANGE-SHARDED deliveries (each
    # covers one disjoint key band — the time-keyed / range-sharded
    # feed shape, e.g. per-crawl CDX shards) read back with a narrow
    # key_range. Footer-stats pruning should cut the scan to ~1 band's
    # segment vs the full union; the SPRAY stores above are the honest
    # non-prunable counterexample (uniform keys make every segment's
    # min/max straddle every range). ---
    total_keys = d.agg(F.max(did)).first()[0] + 1
    band = max(1, total_keys // 8)
    root = tempfile.mkdtemp(prefix="ab_lsmr_") + "/s"
    for i in range(8):
        dv = (d.filter((did >= i * band) & (did < (i + 1) * band))
              .select(did.alias("k"), did.alias("best_doc"),
                      F.col("n_chars").cast("long").alias("score"),
                      F.lit(False).alias("is_delete")))
        STR.append_lsm_segment(dv, root, i + 1)
    lo, hi = 2 * band, 2 * band + band // 2  # inside band 2
    legs = {
        "pruned_s": lambda: STR.read_lsm(
            spark, root, ["k"], ["score", "best_doc"],
            key_range=(lo, hi)).count(),
        "full_union_s": lambda: (
            STR.read_lsm(spark, root, ["k"], ["score", "best_doc"])
            .filter(F.col("k").between(lo, hi)).count()),
    }
    counts = {name: fn() for name, fn in legs.items()}  # warm + check
    assert counts["pruned_s"] == counts["full_union_s"]
    best = {name: float("inf") for name in legs}
    for _ in range(3):
        for name, fn in legs.items():  # interleaved, same-phase
            t0 = time.perf_counter()
            fn()
            best[name] = min(best[name], time.perf_counter() - t0)
    # the structural metric: scan legs touched (wall time at local-toy
    # scale is floor-dominated; at 1000 segments x GBs the leg count
    # IS the cost)
    n_pruned_files = len(STR.read_lsm(
        spark, root, ["k"], ["score", "best_doc"],
        key_range=(lo, hi)).inputFiles())
    n_full_files = len(STR.read_lsm(
        spark, root, ["k"], ["score", "best_doc"]).inputFiles())
    results["lsm_range_read"] = {
        **{k: round(v, 3) for k, v in best.items()},
        "rows": counts["pruned_s"],
        "files_scanned": n_pruned_files,
        "files_full": n_full_files}

    import json
    print(json.dumps({"sf_dir": sf_dir, "deliveries": k_deliveries,
                      **results}))


if __name__ == "__main__":
    main()
