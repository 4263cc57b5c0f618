"""ER store backend A/B — the r16 measurement behind the persisted
ER store's backend choice (VERDICT r15 #4): the ER store rides the
copy-on-write CDC snapshot, so every delivery rewrites O(store) bytes;
ER keys (rids) spray uniformly, which is exactly the shape the r12
write-amp A/B showed the LSM form winning. This script drives the
IDENTICAL ER delivery lifecycle (queries.relational._er_store_delivery
— blocked delta-vs-store verify, star-edge label merge, changed-rows
upsert) over the three store backends via the read_fn/admit_fn
injection points:

  - cow:  upsert_cdc_snapshot        (O(store) rewrite per delivery)
  - part: upsert_partitioned_snapshot (rid%8 partitions — degrades to
          O(store) under spray, measured not assumed)
  - lsm:  append_lsm_segment          (O(delivery) append; read pays
          the keep-latest merge)

and reports per backend: seed/delivery wall seconds, bytes physically
written per step, final read seconds, and a cross-backend agreement
hash over the settled (rid, name, cluster) rows — the three backends
must agree bit-for-bit or the A/B itself is invalid.

Fixture-scale caveat (found BY the agreement hash, r16): at sf10 the
synthetic customer keys reach 1.5M, so the ER fixture's +1M/+2M/+3M
alias-rid offsets COLLIDE with base rids (and +6M fresh with +5M
trunc) — duplicate keys make every backend's keep-latest tie
nondeterministic and the agreement hash meaningless. The gated SFs
(<= sf0.1, keys <= 15k) never collide; this script deduplicates each
input relation deterministically (keep MIN name per rid) so the
cross-backend agreement stays exact at every SF. Throughput shape is
unchanged (row counts within 0.3%).

Usage: python scripts/er_store_ab.py <sf_dir> — one JSON line per
backend. Results recorded in BASELINE.md (decision by data).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clif_spark import streaming as STR  # noqa: E402
from clif_spark.operators import graph as G  # noqa: E402
from clif_spark.queries import relational as R  # noqa: E402
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
    """Bytes of files CREATED since ``before`` (fresh part-file names
    per write job = bytes physically written)."""
    return sum(sz for p, sz in file_map(root).items() if p not in before)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = build_session(master=f"local[{os.cpu_count()}]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    def dedup_rid(df):
        # deterministic duplicate-rid resolution (keep MIN name) — see
        # the fixture-scale caveat in the module docstring
        return df.groupBy("rid").agg(F.min("name").alias("name"))

    recs = dedup_rid(R._entity_recs(spark, sf_dir))
    comp0 = (G.connected_components(
                 R._entity_match_edges(recs, recs, symmetric=True))
             .withColumnRenamed("node", "rid"))
    labeled = (recs.join(comp0, "rid", "left")
               .select("rid", "name",
                       F.coalesce("component", F.col("rid"))
                        .alias("cluster"))
               .localCheckpoint(eager=True))
    v4, trunc, fresh = R._entity_delta_families(spark, sf_dir)
    deltas = [
        (1, dedup_rid(v4).localCheckpoint(eager=True)),
        (2, dedup_rid(trunc.unionByName(fresh))
            .localCheckpoint(eager=True))]

    def decorate(rows, version):
        return rows.select(
            "rid", "name", "cluster",
            F.lit(version).cast("long").alias("__v"),
            F.lit(False).alias("is_delete"))

    def run(name: str, root: str, seed_fn, read_fn, admit_fn) -> None:
        res = {"backend": name, "sf_dir": sf_dir, "deliveries": []}
        before = file_map(root)
        t0 = time.time()
        seed_fn(labeled, 0)
        res["seed_s"] = round(time.time() - t0, 2)
        res["seed_mb"] = round(new_bytes(before, root) / 1e6, 2)
        for ver, delta in deltas:
            before = file_map(root)
            t0 = time.time()
            R._er_store_delivery(spark, delta, root, ver,
                                 read_fn=read_fn, admit_fn=admit_fn)
            res["deliveries"].append(
                {"v": ver, "s": round(time.time() - t0, 2),
                 "mb": round(new_bytes(before, root) / 1e6, 2)})
        t0 = time.time()
        final = read_fn().select("rid", "name", "cluster")
        agg = final.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("rid", "name", "cluster").cast("long"))
             .alias("h")).first()
        res["read_s"] = round(time.time() - t0, 2)
        res["rows"] = agg["n"]
        res["agreement_hash"] = agg["h"]
        print(json.dumps(res), flush=True)

    # --- copy-on-write CDC snapshot (the gated default) --------------
    cow_root = tempfile.mkdtemp(prefix="er_ab_cow_") + "/store"
    run("cow", cow_root,
        seed_fn=lambda rows, v: R._er_store_admit(rows, cow_root, v),
        read_fn=lambda: STR.read_cdc_snapshot(spark, cow_root),
        admit_fn=lambda rows, v: R._er_store_admit(rows, cow_root, v))

    # --- hive-partitioned snapshot (rid % 8) --------------------------
    part_root = tempfile.mkdtemp(prefix="er_ab_part_") + "/store"

    def part_admit(rows, v):
        STR.upsert_partitioned_snapshot(
            decorate(rows, v).withColumn(
                "part", (F.col("rid") % 8).cast("long")),
            part_root, keys=["rid"], order=["__v", "rid"],
            part_col="part")

    run("part", part_root,
        seed_fn=part_admit,
        read_fn=lambda: STR.read_partitioned_snapshot(spark, part_root),
        admit_fn=part_admit)

    # --- LSM segment store (O(delivery) append) -----------------------
    lsm_root = tempfile.mkdtemp(prefix="er_ab_lsm_") + "/store"

    def lsm_admit(rows, v):
        STR.append_lsm_segment(decorate(rows, v), lsm_root, v)

    run("lsm", lsm_root,
        seed_fn=lsm_admit,
        read_fn=lambda: STR.read_lsm(spark, lsm_root, keys=["rid"],
                                     order=["__v", "rid"]),
        admit_fn=lsm_admit)


if __name__ == "__main__":
    main()
