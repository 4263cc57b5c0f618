"""Round-18 A/B: the BM25F score leg's three eager localCheckpoints
(bcounts/hosts/acounts) exist to keep the BATCH tokenize from re-running
per downstream reference (web_host_bm25f — corpus regex lineage). The
STORE-backed rows (web_bm25f_incremental/takedown/compacted) feed the
same leg parquet scans with pushed filters and real stats — re-scanning
those per reference may be cheaper than 3 checkpoint jobs + block
writes.

Interleaved same-session: score over a real CDC store dir, checkpointed
vs plain shapes, result equality asserted.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bm25f_score_ab_r18.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clif_spark import io, streaming as STR  # noqa: E402
from clif_spark.queries import web as W  # noqa: E402
from clif_spark.session import build_session  # noqa: E402


def score_plain(bcounts, acounts):
    """_bm25f_score minus the three eager checkpoints."""
    hosts = bcounts.select("host").distinct()
    nh = hosts.agg(F.count(F.lit(1)).cast("double").alias("n"))
    blen = bcounts.groupBy("host").agg(
        F.sum("c").cast("long").alias("len_b"))
    btot = blen.agg(F.sum("len_b").cast("double").alias("tot_b"))
    acounts = acounts.join(hosts, "host", "semi")
    alen = acounts.groupBy("host").agg(
        F.sum("c").cast("long").alias("len_a"))
    atot = alen.agg(F.sum("len_a").cast("double").alias("tot_a"))
    terms = ["link", "hot", "spark", "window"]
    qb = (bcounts.filter(F.col("term").isin(terms))
          .select("host", "term", F.col("c").alias("tf_b")))
    qa = (acounts.filter(F.col("term").isin(terms))
          .select("host", "term", F.col("c").alias("tf_a")))
    zero = F.lit(0).cast("long")
    tfs = (qb.join(qa, ["host", "term"], "full")
           .select("host", "term",
                   F.coalesce("tf_b", zero).alias("tf_b"),
                   F.coalesce("tf_a", zero).alias("tf_a")))
    dfs = tfs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    tft = (F.col("tf_b")
           / (F.lit(0.25) + F.lit(0.75) * F.col("len_b") * F.col("n")
              / F.col("tot_b"))
           + F.lit(2.0) * F.col("tf_a")
           / (F.lit(0.5) + F.lit(0.5) * F.coalesce("len_a", zero)
              * F.col("n") / F.col("tot_a")))
    pseudo = (tfs.join(blen, "host")
              .join(alen, "host", "left")
              .crossJoin(F.broadcast(nh))
              .crossJoin(F.broadcast(btot))
              .crossJoin(F.broadcast(atot))
              .select("host", "term", tft.alias("tft"), "n"))
    idf = ((F.col("n") - F.col("df") + F.lit(0.5))
           / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    scored = (pseudo.join(F.broadcast(dfs), "term")
              .select("host",
                      F.floor((idf * F.col("tft")
                               / (F.lit(1.2) + F.col("tft")))
                              * F.lit(1000000.0) + F.lit(0.5))
                       .cast("long").alias("c")))
    per_host = scored.groupBy("host").agg(
        F.sum("c").alias("score_micros"))
    w = Window.orderBy(F.col("score_micros").desc(), F.col("host"))
    return (per_host
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 10)
            .select("host", "score_micros", "rank"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = int(os.environ.get("AB_WARM", "2"))
    reps = int(os.environ.get("AB_REPS", "5"))
    table_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = max(2, min(cpus, table_bytes // (2 << 20)))
    confs = {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.rdd.compress": "false",
        "spark.broadcast.compress": "false",
        "spark.locality.wait": "0",
    }
    spark = build_session(app_name="clif-bm25f-score-ab",
                          shuffle_partitions=parts, extra_confs=confs)
    spark.sparkContext.setLogLevel("ERROR")
    if table_bytes < (1 << 30):
        from clif_spark import session as _session
        _session.RUNTIME_CONFS = {**_session.RUNTIME_CONFS,
                                  "spark.sql.adaptive.enabled": "false"}
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # build a real standing store once (exactly the incremental row's)
    d = io.load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="clif_bm25f_scoreab_")
    did = F.col("doc_id")
    for v in (0, 1):
        part = d.filter(did % 2 == v)
        bc, ac = W._bm25f_counts(part)
        partial = (bc.withColumn("field", F.lit("body"))
                   .unionByName(ac.withColumn("field", F.lit("anchor"))))
        STR.fold_agg_snapshot(partial, root,
                              keys=["host", "term", "field"], version=v,
                              add_cols=["c"], lineage="bm25f-postings")

    def inputs():
        stored = STR.read_cdc_snapshot(spark, root)
        return (stored.filter(F.col("field") == "body")
                      .select("host", "term", "c"),
                stored.filter(F.col("field") == "anchor")
                      .select("host", "term", "c"))

    def run_ckpt():
        b, a = inputs()
        return W._bm25f_score(b, a).collect()

    def run_plain():
        b, a = inputs()
        return score_plain(b, a).collect()

    assert sorted(map(tuple, run_ckpt())) == sorted(map(tuple,
                                                        run_plain()))
    for _ in range(warm):
        run_ckpt(); run_plain()
    best = {"ckpt": float("inf"), "plain": float("inf")}
    jobs = {}
    hist = {"ckpt": [], "plain": []}
    for r in range(reps):
        for tag, fn in (("ckpt", run_ckpt), ("plain", run_plain)):
            group = f"scoreab-{tag}-{r}"
            sc.setJobGroup(group, tag)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            hist[tag].append(round(dt, 3))
            if dt < best[tag]:
                best[tag] = dt
                jobs[tag] = len(tracker.getJobIdsForGroup(group))
    print({"sf_dir": sf_dir, "parts": int(parts),
           "best": {k: round(v, 3) for k, v in best.items()},
           "jobs": jobs, "hist": hist})
    spark.stop()


if __name__ == "__main__":
    main()
