"""Streaming-surface tests beyond the oracle gate: the foreachBatch parquet
sink round-trip and stream-reader schema normalization."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import types as T

from clif_spark import io, streaming

SF_DIR = os.environ.get("CLIF_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_foreachbatch_parquet_sink(spark):
    ev = streaming.read_events_stream(spark, SF_DIR)
    out_dir = tempfile.mkdtemp(prefix="clif_stream_out_")
    ckpt = tempfile.mkdtemp(prefix="clif_stream_ckpt_")
    q = streaming.write_stream_parquet(
        ev.select("event_id", "ts", "event_type"), out_dir, ckpt)
    q.awaitTermination()
    written = spark.read.parquet(out_dir)
    batch = io.load_table(spark, SF_DIR, "events")
    assert written.count() == batch.count()
    assert set(written.columns) == {"event_id", "ts", "event_type"}


def test_stream_reader_normalizes_ts(spark):
    ev = streaming.read_events_stream(spark, SF_DIR)
    assert ev.isStreaming
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)


def test_idempotent_sink_survives_batch_replay(spark):
    """Exactly-once files from at-least-once delivery: re-delivering the
    SAME (batch, batch_id) — what a crash between sink write and checkpoint
    commit does — must not duplicate rows; a new batch_id must append."""
    out = tempfile.mkdtemp(prefix="clif_idem_")
    sink = streaming.idempotent_parquet_sink(out)
    batch = spark.range(100).selectExpr("id", "id % 5 AS k")

    sink(batch, 0)
    sink(batch, 0)  # simulated replay of the same micro-batch
    assert spark.read.parquet(out).count() == 100

    sink(batch, 1)  # a genuinely new micro-batch appends
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.filter("__batch_id = 0").count() == 100

    # replay of batch 0 again, after batch 1 exists: still no dupes, and
    # batch 1's output is untouched (dynamic overwrite replaces only the
    # replayed batch's partition)
    sink(batch.limit(40), 0)
    back = spark.read.parquet(out)
    assert back.filter("__batch_id = 0").count() == 40
    assert back.filter("__batch_id = 1").count() == 100


def test_processing_time_trigger_with_idempotent_sink(spark):
    """The long-running-service mode: processing-time trigger + idempotent
    sink; the stream drains the source within a few ticks and the file
    output carries no duplicates."""
    import time

    ev = streaming.read_events_stream(spark, SF_DIR)
    out = tempfile.mkdtemp(prefix="clif_pt_out_")
    ckpt = tempfile.mkdtemp(prefix="clif_pt_ckpt_")
    q = streaming.write_stream_parquet(
        ev.select("event_id", "ts", "event_type"), out, ckpt,
        idempotent=True, processing_time="250 milliseconds")
    try:
        expected = io.load_table(spark, SF_DIR, "events").count()
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= expected:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    written = spark.read.parquet(out)
    assert written.count() == expected
    assert written.select("event_id").distinct().count() == expected


def test_cdc_apply_replay_and_convergence(spark):
    """apply_cdc_stream end-to-end: out-of-version-order cross-batch
    arrival converges to the keep-latest MERGE, tombstones retained in
    storage suppress LATER-arriving older updates, and a full re-run of
    the same feed against the same table (a FRESH checkpoint, so batch
    ids restart at 0 — a new lineage, deliberately NOT skipped by the
    pointer guard, which only covers same-checkpoint crash redelivery)
    leaves the snapshot unchanged because keep-latest-by-version makes
    re-merging identical records a no-op; a SAME-checkpoint restart is
    a source-level no-op (Spark's own checkpoint has all batches
    committed)."""
    import tempfile

    from clif_spark import streaming

    recs = spark.createDataFrame(
        # key 1: delete (v3) arrives in an EARLIER batch than the v2
        # update — the update must stay suppressed. key 2 plain upsert.
        [(1, 1, "a", False), (1, 3, "a", True), (2, 1, "b", False),
         (1, 2, "a2", False), (2, 2, "b2", False), (3, 1, "c", False)],
        "k long, version long, val string, is_delete boolean")
    src = tempfile.mkdtemp(prefix="cdc_src_")
    # two part-files -> two micro-batches; DESCENDING range partition on
    # version puts the v3 tombstone in part-00000 (the FIRST replayed
    # batch) and the older v2 update in the second — the arrival order
    # that breaks physical-delete implementations.
    from pyspark.sql import functions as F
    (recs.repartitionByRange(2, F.col("version").desc())
         .write.mode("overwrite").parquet(src))
    stream = (spark.readStream.schema(recs.schema)
                   .option("maxFilesPerTrigger", 1).parquet(src))
    root = tempfile.mkdtemp(prefix="cdc_tbl_")
    streaming.apply_cdc_stream(stream, root, ["k"], ["version"])
    snap = {r.k: (r.version, r.val)
            for r in streaming.read_cdc_snapshot(spark, root).collect()}
    assert snap == {2: (2, "b2"), 3: (1, "c")}  # key 1 deleted at v3

    # full re-run, NEW lineage (fresh checkpoint, same root): batch ids
    # restart at 0 and genuinely re-apply; keep-latest re-merge of
    # identical records leaves the snapshot unchanged
    stream2 = (spark.readStream.schema(recs.schema)
                    .option("maxFilesPerTrigger", 1).parquet(src))
    streaming.apply_cdc_stream(stream2, root, ["k"], ["version"])
    snap2 = {r.k: (r.version, r.val)
             for r in streaming.read_cdc_snapshot(spark, root).collect()}
    assert snap2 == snap
    # versions are (batch_id, lineage)-unique: the second feed must NOT
    # have overwritten the first feed's immutable history — two distinct
    # lineage suffixes coexist on disk
    import os
    suffixes = {d.split("_", 1)[1] for d in os.listdir(root)
                if d.startswith("v") and "_" in d}
    assert len(suffixes) == 2, sorted(os.listdir(root))

    # SAME-checkpoint restart: Spark's checkpoint has every batch
    # committed, so nothing is redelivered and the snapshot is untouched
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_pin_")
    stream3 = (spark.readStream.schema(recs.schema)
                    .option("maxFilesPerTrigger", 1).parquet(src))
    streaming.apply_cdc_stream(stream3, root, ["k"], ["version"],
                               checkpoint=ckpt)
    stream4 = (spark.readStream.schema(recs.schema)
                    .option("maxFilesPerTrigger", 1).parquet(src))
    streaming.apply_cdc_stream(stream4, root, ["k"], ["version"],
                               checkpoint=ckpt)
    snap3 = {r.k: (r.version, r.val)
             for r in streaming.read_cdc_snapshot(spark, root).collect()}
    assert snap3 == snap


def test_cdc_time_travel_and_compaction(spark):
    """Every applied batch leaves an immutable version: a pinned read
    reproduces the snapshot as of that batch (time travel), compaction
    physically drops retained tombstones + old versions (returning the
    count), the live view is unchanged by compaction, and further CDC
    batches keep applying on top of the compacted version."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from clif_spark import streaming

    recs = spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", False),   # batch of v1 inserts
         (1, 2, "a2", False), (2, 2, "b", True)],  # batch: update + delete
        "k long, version long, val string, is_delete boolean")
    src = tempfile.mkdtemp(prefix="cdc_tt_src_")
    (recs.repartitionByRange(2, "version").write.mode("overwrite")
         .parquet(src))
    stream = (spark.readStream.schema(recs.schema)
                   .option("maxFilesPerTrigger", 1).parquet(src))
    root = tempfile.mkdtemp(prefix="cdc_tt_tbl_")
    streaming.apply_cdc_stream(stream, root, ["k"], ["version"])

    # time travel: as of batch 0 the table holds exactly ONE source
    # file's merge (file replay order is mtime/path-dependent, so it may
    # be either the v1 batch or the v2 batch — both are valid histories)
    asof0 = {r.k: (r.version, r.val) for r in
             streaming.read_cdc_snapshot(spark, root, version=0).collect()}
    assert asof0 in (
        {1: (1, "a"), 2: (1, "b")},   # v1 inserts applied first
        {1: (2, "a2")},               # v2 batch first (2's delete retained)
    )
    live = {r.k: (r.version, r.val) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert live == {1: (2, "a2")}  # key 2 deleted at v2

    removed = streaming.compact_cdc_snapshot(spark, root)
    assert removed == 1  # key 2's retained tombstone
    after = {r.k: (r.version, r.val) for r in
             streaming.read_cdc_snapshot(spark, root).collect()}
    assert after == live  # compaction never changes the live view
    import pytest
    with pytest.raises(FileNotFoundError):  # history expired
        streaming.read_cdc_snapshot(spark, root, version=0)

    # the table keeps working: apply one more batch on the compacted base
    more = spark.createDataFrame([(3, 1, "c", False)],
                                 "k long, version long, val string, "
                                 "is_delete boolean")
    src2 = tempfile.mkdtemp(prefix="cdc_tt_src2_")
    more.coalesce(1).write.mode("overwrite").parquet(src2)
    stream2 = (spark.readStream.schema(more.schema)
                    .option("maxFilesPerTrigger", 1).parquet(src2))
    streaming.apply_cdc_stream(stream2, root, ["k"], ["version"])
    final = {r.k: (r.version, r.val) for r in
             streaming.read_cdc_snapshot(spark, root).collect()}
    assert final == {1: (2, "a2"), 3: (1, "c")}


def test_cdc_compaction_rerun_completes_crashed_sweep(spark):
    """A compaction that crashed after the pointer flip but before the
    old-version deletion leaves stale v* dirs; the idempotence early
    return must still sweep them (r6 advisory: skipping the sweep leaked
    those dirs permanently) while leaving the live view untouched."""
    import os
    import tempfile

    from clif_spark import streaming

    recs = spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", True)],
        "k long, version long, val string, is_delete boolean")
    src = tempfile.mkdtemp(prefix="cdc_sweep_src_")
    recs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(recs.schema)
                   .option("maxFilesPerTrigger", 1).parquet(src))
    root = tempfile.mkdtemp(prefix="cdc_sweep_tbl_")
    streaming.apply_cdc_stream(stream, root, ["k"], ["version"])
    assert streaming.compact_cdc_snapshot(spark, root) == 1

    # simulate the crash: resurrect a pre-compaction version dir that the
    # (hypothetically interrupted) sweep failed to delete
    stale = os.path.join(root, "v000000")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "part-crashed.parquet"), "wb") as f:
        f.write(b"not really parquet")

    assert streaming.compact_cdc_snapshot(spark, root) == 0  # idempotent
    assert not os.path.exists(stale)  # re-run completed the cleanup
    live = {r.k: (r.version, r.val) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert live == {1: (1, "a")}


def test_upsert_cdc_snapshot_batch_interop(spark):
    """upsert_cdc_snapshot (the batch twin of apply_cdc_stream's sink)
    produces the same on-disk format: version ids allocate monotonically,
    keep-latest-by-order folds updates, tombstones suppress at read time,
    time travel resolves batch versions, compaction works, and
    re-applying an identical batch is idempotent."""
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="cdc_batch_tbl_")
    b0 = spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", False)],
        "k long, version long, val string, is_delete boolean")
    v0 = streaming.upsert_cdc_snapshot(b0, root, ["k"], ["version"])
    assert v0.split("/")[-1].startswith("v0_")
    b1 = spark.createDataFrame(
        [(1, 2, "a2", False), (2, 2, None, True), (3, 2, "c", False)],
        "k long, version long, val string, is_delete boolean")
    v1 = streaming.upsert_cdc_snapshot(b1, root, ["k"], ["version"])
    assert v1.split("/")[-1].startswith("v1_")

    live = {r.k: (r.version, r.val) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert live == {1: (2, "a2"), 3: (2, "c")}  # key 2 tombstoned
    # time travel: version=0 predates b1, so it is exactly the b0 merge
    asof0 = {r.k: r.val for r in
             streaming.read_cdc_snapshot(spark, root, version=0).collect()}
    assert asof0 == {1: "a", 2: "b"}

    # idempotence: re-folding the same batch changes nothing visible
    streaming.upsert_cdc_snapshot(b1, root, ["k"], ["version"])
    live2 = {r.k: (r.version, r.val) for r in
             streaming.read_cdc_snapshot(spark, root).collect()}
    assert live2 == live

    removed = streaming.compact_cdc_snapshot(spark, root)
    assert removed == 1  # key 2's retained tombstone
    live3 = {r.k: (r.version, r.val) for r in
             streaming.read_cdc_snapshot(spark, root).collect()}
    assert live3 == live


def test_upsert_cdc_snapshot_lineage_change_keeps_live_rows(spark):
    """Folding a batch under a DIFFERENT lineage string merges onto the
    existing snapshot — the live table must never silently vanish on a
    lineage switch (the checkpoint identity scopes redelivery detection,
    not the data). Only the version counter restarts at 0."""
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="cdc_lineage_tbl_")
    b0 = spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", False)],
        "k long, version long, val string, is_delete boolean")
    streaming.upsert_cdc_snapshot(b0, root, ["k"], ["version"],
                                  lineage="feed-A")
    b1 = spark.createDataFrame(
        [(2, 2, "b2", False), (3, 2, "c", False)],
        "k long, version long, val string, is_delete boolean")
    vdir = streaming.upsert_cdc_snapshot(b1, root, ["k"], ["version"],
                                         lineage="feed-B")
    # new lineage restarts the counter at 0 with its own suffix
    assert vdir.split("/")[-1].startswith("v0_")
    live = {r.k: (r.version, r.val) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    # feed-A's untouched row survives; feed-B's update and insert land
    assert live == {1: (1, "a"), 2: (2, "b2"), 3: (2, "c")}
    # and the next feed-B batch allocates v1 within its lineage
    b2 = spark.createDataFrame(
        [(4, 3, "d", False)],
        "k long, version long, val string, is_delete boolean")
    v1 = streaming.upsert_cdc_snapshot(b2, root, ["k"], ["version"],
                                       lineage="feed-B")
    assert v1.split("/")[-1].startswith("v1_")
    assert streaming.read_cdc_snapshot(spark, root).count() == 4


def test_fold_agg_snapshot_guard_and_time_travel(spark):
    """The aggregate store's replay guard and history: an at-or-below
    ordinal fold is skipped (additive folds double-count without it),
    a fresh lineage restarts its counter but keeps folding onto the
    standing aggregates, and time travel reads the aggregate as of any
    delivery (CDC format underneath)."""
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="agg_store_tbl_")

    def partial(rows):
        return spark.createDataFrame(rows, "k string, n long, s long")

    assert streaming.fold_agg_snapshot(
        partial([("a", 1, 10), ("b", 2, 20)]), root, ["k"], 0,
        add_cols=["n", "s"]) is not None
    assert streaming.fold_agg_snapshot(
        partial([("a", 3, 30)]), root, ["k"], 1,
        add_cols=["n", "s"]) is not None
    # redelivery of the LAST ordinal skips (the crash-replay case the
    # guard exists for) ...
    assert streaming.fold_agg_snapshot(
        partial([("a", 99, 99)]), root, ["k"], 1,
        add_cols=["n", "s"]) is None
    # ... but an ordinal BELOW it raises: with only the last ordinal
    # recorded, it's indistinguishable between deep redelivery and a
    # genuinely new out-of-order delivery — silently dropping the
    # latter is undetectable data loss on a caller ordinal bug
    import pytest

    with pytest.raises(ValueError, match="below the last applied"):
        streaming.fold_agg_snapshot(
            partial([("a", 99, 99)]), root, ["k"], 0,
            add_cols=["n", "s"])
    live = {r.k: (r.n, r.s) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert live == {"a": (4, 40), "b": (2, 20)}
    # time travel: the aggregate as of delivery 0
    v0 = {r.k: (r.n, r.s) for r in
          streaming.read_cdc_snapshot(spark, root, version=0).collect()}
    assert v0 == {"a": (1, 10), "b": (2, 20)}
    # a new lineage restarts its ordinal but folds onto the standing rows
    vdir = streaming.fold_agg_snapshot(
        partial([("b", 1, 1)]), root, ["k"], 0,
        add_cols=["n", "s"], lineage="feed-B")
    assert vdir is not None and vdir.split("/")[-1].startswith("v0_")
    live2 = {r.k: (r.n, r.s) for r in
             streaming.read_cdc_snapshot(spark, root).collect()}
    assert live2 == {"a": (4, 40), "b": (3, 21)}


def test_upsert_cdc_snapshot_lineage_revisit_never_clobbers_history(spark):
    """A REVISITED lineage (A -> B -> A) restarts its ordinal at 0 — but
    must not reuse its own historical version-dir names: v0 of the first
    A epoch is immutable (lazy readers pinned to it, time travel), so the
    second A epoch's v0 lands in a FRESH globally-unique dir. Also pins
    that a lazy DataFrame bound to the clobber-candidate dir reads its
    original content afterwards, and that time travel serves the CURRENT
    epoch's v0."""
    import os
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="cdc_revisit_tbl_")
    schema = "k long, version long, val string, is_delete boolean"
    streaming.upsert_cdc_snapshot(
        spark.createDataFrame([(1, 1, "a-epoch0", False)], schema),
        root, ["k"], ["version"], lineage="feed-A")
    first_a_v0 = streaming._cdc_pointer_read(root)[1]
    pinned = spark.read.parquet(first_a_v0)  # lazy reader on epoch-0 v0
    streaming.upsert_cdc_snapshot(
        spark.createDataFrame([(2, 2, "b", False)], schema),
        root, ["k"], ["version"], lineage="feed-B")
    revisit_v0 = streaming.upsert_cdc_snapshot(
        spark.createDataFrame([(1, 3, "a-epoch2", False)], schema),
        root, ["k"], ["version"], lineage="feed-A")
    # the revisit allocated a NEW dir; the historical one is untouched
    assert os.path.realpath(revisit_v0) != os.path.realpath(first_a_v0)
    assert sorted((r.k, r.val) for r in pinned.collect()) \
        == [(1, "a-epoch0")]
    # live view folded all three epochs
    live = {r.k: r.val for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert live == {1: "a-epoch2", 2: "b"}
    # time travel v0 resolves the CURRENT epoch's v0 (the revisit),
    # not the historical epoch-0 dir
    v0 = streaming.read_cdc_snapshot(spark, root, version=0)
    assert {r.k: r.val for r in v0.collect()} == live
    # three distinct version dirs exist on disk (one per epoch)
    vdirs = [d for d in os.listdir(root) if d.startswith("v")]
    assert len(vdirs) == 3, sorted(vdirs)


def test_fold_agg_snapshot_tombstone_excluded_both_sides(spark):
    """A key retired from the aggregate store (tombstone via the upsert
    machinery) is excluded from subsequent folds two-sidedly: its stored
    row is never summed into an aggregate (NULL/stale partials must not
    poison live totals) and incoming partials for it are dropped — a
    retired key stays retired. Live keys keep folding normally, and
    compaction physically drops the tombstone."""
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="agg_tomb_tbl_")

    def partial(rows):
        return spark.createDataFrame(rows, "k string, n long, s long")

    streaming.fold_agg_snapshot(
        partial([("a", 1, 10), ("b", 2, 20)]), root, ["k"], 0,
        add_cols=["n", "s"])
    # retire key 'a': tombstone row via the upsert machinery (order by n
    # with a sentinel that beats the stored partial)
    tomb = spark.createDataFrame(
        [("a", 999, 0, True)], "k string, n long, s long, is_delete boolean")
    streaming.upsert_cdc_snapshot(tomb, root, ["k"], ["n"],
                                  lineage="retire")
    # next delivery carries partials for BOTH keys; 'a' must stay retired
    vdir = streaming.fold_agg_snapshot(
        partial([("a", 5, 50), ("b", 1, 1)]), root, ["k"], 0,
        add_cols=["n", "s"])
    live = {r.k: (r.n, r.s) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert live == {"b": (3, 21)}  # 'a' absent; 'b' folded normally
    # the tombstone row rode through UNTOUCHED (not summed with the
    # incoming a-partial) so the suppression record is intact
    raw = {r.k: (r.n, r.is_delete) for r in
           spark.read.parquet(vdir).collect()}
    assert raw["a"] == (999, True)
    # compaction physically drops it
    assert streaming.compact_cdc_snapshot(spark, root) == 1
    assert {r.k for r in
            streaming.read_cdc_snapshot(spark, root).collect()} == {"b"}


def test_partitioned_upsert_rewrites_only_touched_partitions(spark):
    """The partitioned store's physical contract: a delivery touching
    one partition leaves every other partition's parquet FILES
    byte-identical on disk (names, sizes, mtimes), the merge base scan
    is partition-pruned, tombstones are retained-then-filtered, and a
    later out-of-order lower-version update still loses to a retained
    tombstone."""
    import os
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="part_store_") + "/t"
    schema = "k long, version long, val string, is_delete boolean, p string"

    def snap(part):
        d = os.path.join(root, f"p={part}")
        return {f: (os.path.getsize(os.path.join(d, f)),
                    os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d) if f.endswith(".parquet")}

    d1 = spark.createDataFrame(
        [(1, 1, "a", False, "x"), (2, 1, "b", False, "y"),
         (3, 1, "c", False, "z")], schema)
    touched = streaming.upsert_partitioned_snapshot(
        d1, root, ["k"], ["version"], "p")
    assert sorted(touched) == ["x", "y", "z"]
    before_y, before_z = snap("y"), snap("z")

    # delivery 2: touches ONLY partition x — update k=1, tombstone k=4
    d2 = spark.createDataFrame(
        [(1, 3, "a2", False, "x"), (4, 3, None, True, "x")], schema)
    assert streaming.upsert_partitioned_snapshot(
        d2, root, ["k"], ["version"], "p") == ["x"]
    # untouched partitions: files byte-identical (not rewritten)
    assert snap("y") == before_y and snap("z") == before_z
    live = {r.k: (r.version, r.val) for r in
            streaming.read_partitioned_snapshot(spark, root).collect()}
    assert live == {1: (3, "a2"), 2: (1, "b"), 3: (1, "c")}

    # out-of-order update BELOW the retained tombstone's version: the
    # tombstone must keep suppressing the key
    d3 = spark.createDataFrame([(4, 2, "late", False, "x")], schema)
    streaming.upsert_partitioned_snapshot(d3, root, ["k"], ["version"], "p")
    assert 4 not in {r.k for r in
                     streaming.read_partitioned_snapshot(spark, root)
                     .collect()}

    # the pinned-partition read prunes at planning time: the formatted
    # explain's scan node carries the isin as a PartitionFilter
    import contextlib
    import io as _io

    pinned = streaming.read_partitioned_snapshot(
        spark, root, part_col="p", partitions=["x"])
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pinned.explain("formatted")
    plan = buf.getvalue()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    # single-value isin folds to equality — assert the partition column
    # and the pinned value reached the scan's partition filter
    assert pf_lines and any("p#" in ln and "x" in ln for ln in pf_lines), \
        plan
    assert {r.k for r in pinned.collect()} == {1}


def test_partitioned_compaction_rewrites_only_dirty_partitions(spark):
    """Compaction of the partitioned store: tombstone-bearing partitions
    are rewritten without their tombstones, an ALL-tombstone partition's
    directory is removed outright, and clean partitions' files stay
    byte-identical."""
    import os
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="part_compact_") + "/t"
    schema = "k long, version long, val string, is_delete boolean, p string"

    def snap(part):
        d = os.path.join(root, f"p={part}")
        return {f: (os.path.getsize(os.path.join(d, f)),
                    os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d) if f.endswith(".parquet")}

    d1 = spark.createDataFrame(
        [(1, 1, "a", False, "x"), (2, 1, "b", False, "x"),
         (3, 1, "c", False, "y"), (4, 1, "d", False, "z")], schema)
    streaming.upsert_partitioned_snapshot(d1, root, ["k"], ["version"], "p")
    # tombstone k=2 (x becomes mixed) and k=4 (z becomes all-tombstone)
    d2 = spark.createDataFrame(
        [(2, 2, None, True, "x"), (4, 2, None, True, "z")], schema)
    streaming.upsert_partitioned_snapshot(d2, root, ["k"], ["version"], "p")
    before_y = snap("y")

    assert streaming.compact_partitioned_snapshot(spark, root, "p") == 2
    # clean partition untouched; all-tombstone partition gone
    assert snap("y") == before_y
    assert not os.path.exists(os.path.join(root, "p=z"))
    live = {r.k for r in
            streaming.read_partitioned_snapshot(spark, root).collect()}
    assert live == {1, 3}
    # no tombstones remain anywhere in storage
    raw = spark.read.parquet(root)
    assert raw.filter("is_delete").count() == 0
    # idempotent: nothing dirty -> no-op
    assert streaming.compact_partitioned_snapshot(spark, root, "p") == 0


def test_partitioned_compaction_non_string_partition_dir_removal(spark):
    """r10 ADVICE regression: the dead-directory comparison must use
    Spark's own partition rendering, not Python str() — for a BOOLEAN
    partition column, hive writes ``p=true`` while str(True) is
    ``True``, so the all-tombstone directory was never removed and the
    partition re-reported dirty on every compaction."""
    import os
    import tempfile

    from clif_spark import streaming

    root = tempfile.mkdtemp(prefix="part_compact_bool_") + "/t"
    schema = "k long, version long, is_delete boolean, p boolean"
    d1 = spark.createDataFrame(
        [(1, 1, False, False), (2, 1, False, True)], schema)
    streaming.upsert_partitioned_snapshot(d1, root, ["k"], ["version"], "p")
    # tombstone everything in p=true -> all-tombstone partition
    d2 = spark.createDataFrame([(2, 2, True, True)], schema)
    streaming.upsert_partitioned_snapshot(d2, root, ["k"], ["version"], "p")
    assert streaming.compact_partitioned_snapshot(spark, root, "p") == 1
    assert not os.path.exists(os.path.join(root, "p=true"))
    assert os.path.exists(os.path.join(root, "p=false"))
    # truly clean now: a second compaction is a no-op, not a re-count
    assert streaming.compact_partitioned_snapshot(spark, root, "p") == 0
    live = {r.k for r in
            streaming.read_partitioned_snapshot(spark, root).collect()}
    assert live == {1}


# --- LSM segment store ---------------------------------------------------


def _lsm_rows(spark, rows):
    return spark.createDataFrame(
        rows, "k long, score long, payload string, is_delete boolean")


def _lsm_read_set(spark, root):
    return {tuple(r) for r in streaming.read_lsm(
        spark, root, ["k"], ["score"]).collect()}


def test_lsm_append_read_out_of_order_and_tiebreak(spark):
    """O(delivery) appends; read = keep-best by (order, __seg).
    Versions applied OUT of order must not matter (merge is by order,
    not apply order), and an order TIE between deliveries resolves to
    the later delivery ordinal."""
    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False), (2, 5, "b1", False)]),
        root, 1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 30, "a3", False), (3, 7, "c3", False),
                          (4, 9, "tie-v3", False)]), root, 3)
    # v2 arrives AFTER v3: higher score for k=2, lower for k=1,
    # and an exact score tie for k=4 (must lose to v3's stamp)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 20, "a2", False), (2, 8, "b2", False),
                          (4, 9, "tie-v2", False)]), root, 2)
    assert _lsm_read_set(spark, root) == {
        (1, 30, "a3"), (2, 8, "b2"), (3, 7, "c3"), (4, 9, "tie-v3")}
    # redelivery of an existing segment: skipped, store unchanged
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 99, "dup", False)]), root, 2) is None
    assert _lsm_read_set(spark, root) == {
        (1, 30, "a3"), (2, 8, "b2"), (3, 7, "c3"), (4, 9, "tie-v3")}


def test_lsm_tombstone_masks_and_compaction_invariance(spark):
    """A tombstone winning the order masks every older row at read; a
    full compaction folds segments to one base, drops tombstones, and
    is INVARIANT to the read; folded versions redeliver as skips; an
    unknown below-horizon version fails loud; post-compaction ties
    against the base still resolve by original __seg stamps."""
    import pytest

    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a", False), (2, 5, "b", False),
                          (4, 9, "t2", False)]), root, 2)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 100, None, True),  # tombstone wins k=1
                          (3, 7, "c", False)]), root, 3)
    before = _lsm_read_set(spark, root)
    assert before == {(2, 5, "b"), (3, 7, "c"), (4, 9, "t2")}
    n = streaming.compact_lsm(spark, root, ["k"], ["score"])
    assert n == 2
    assert _lsm_read_set(spark, root) == before
    names = sorted(os.listdir(os.path.dirname(root) + "/store"))
    assert sum(x.startswith("base-") for x in names) == 1
    assert not any(x.startswith("seg-") for x in names)
    # folded redelivery: skip; unknown below the FULL fold's
    # tombstone-drop horizon: loud
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(9, 1, "z", False)]), root, 3) is None
    with pytest.raises(ValueError, match="tombstone-drop horizon"):
        streaming.append_lsm_segment(
            _lsm_rows(spark, [(9, 1, "z", False)]), root, 1)
    # tombstone is GONE after compaction: a fresh lower-order row for
    # k=1 now wins (the documented caller contract), and an order TIE
    # against a base row keeps resolving by the original seg stamp
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 6, "re", False), (4, 9, "t4", False)]),
        root, 4)
    assert _lsm_read_set(spark, root) == {
        (1, 6, "re"), (2, 5, "b"), (3, 7, "c"), (4, 9, "t4")}
    # second compaction folds base + the new segment
    assert streaming.compact_lsm(spark, root, ["k"], ["score"]) == 2
    assert _lsm_read_set(spark, root) == {
        (1, 6, "re"), (2, 5, "b"), (3, 7, "c"), (4, 9, "t4")}


def test_lsm_size_tiered_bound_and_invariance(spark):
    """maintain_lsm(fanout=2): every tier stays under fanout after
    maintenance, folds cascade up tiers, reads are invariant to the
    schedule (maintained store == never-maintained twin), and a
    redelivery of a version whose segment now lives inside a run
    skips off the folded ledger."""
    root = tempfile.mkdtemp(prefix="clif_lsm_tier_") + "/store"
    twin = tempfile.mkdtemp(prefix="clif_lsm_twin_") + "/store"
    deliveries = {
        1: [(1, 10, "a1", False), (2, 5, "b1", False)],
        2: [(1, 30, "a2", False)],
        3: [(3, 7, "c3", False)],
        4: [(2, 50, "b4", False), (4, 9, "d4", False)],
        5: [(5, 2, "e5", False)],
    }
    for v, rows in deliveries.items():
        streaming.append_lsm_segment(_lsm_rows(spark, rows), root, v)
        streaming.append_lsm_segment(_lsm_rows(spark, rows), twin, v)
        streaming.maintain_lsm(spark, root, ["k"], ["score"], fanout=2)
        names = os.listdir(os.path.dirname(root) + "/store")
        tiers = {}
        for n in names:
            if n.startswith(("seg-", "run-")):
                t = streaming._lsm_dir_tier(n)
                tiers[t] = tiers.get(t, 0) + 1
        assert all(c < 2 for c in tiers.values()), (v, tiers)
        assert _lsm_read_set(spark, root) == _lsm_read_set(spark, twin)
    # 5 deliveries, fanout 2: 1+2 -> run1, 3+4 -> run1, runs -> run2,
    # seg-5 pending; redelivery of run-buried version 1 must skip
    names = os.listdir(os.path.dirname(root) + "/store")
    assert sum(n.startswith("run-02-") for n in names) == 1
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(9, 1, "z", False)]), root, 1) is None


def test_lsm_tier_fold_retains_tombstones_and_full_fold_horizon(spark):
    """A tombstone folded into a tier run still masks a LATER-arriving
    lower-order row for its key (tier folds are contract-free), and a
    subsequent FULL compaction folds runs into the base advancing the
    horizon to the max version the runs COVER (run-<tier>-<maxv>
    carries it), so unapplied below-horizon versions fail loud."""
    import pytest

    root = tempfile.mkdtemp(prefix="clif_lsm_tmb_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False)]), root, 2)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 100, None, True),   # tombstone k=1
                          (3, 7, "c", False)]), root, 6)
    assert streaming.maintain_lsm(
        spark, root, ["k"], ["score"], fanout=2) == 1
    # out-of-order v4 offers a LOWER-order row for k=1: the tombstone
    # retained inside the run must still win
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 50, "late", False)]), root, 4)
    assert _lsm_read_set(spark, root) == {(3, 7, "c")}
    # full fold: run (covering up to v6) + seg-4 -> base, horizon 6
    assert streaming.compact_lsm(spark, root, ["k"], ["score"]) == 2
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(9, 1, "z", False)]), root, 6) is None
    with pytest.raises(ValueError, match="tombstone-drop horizon"):
        streaming.append_lsm_segment(
            _lsm_rows(spark, [(9, 1, "z", False)]), root, 5)
    assert _lsm_read_set(spark, root) == {(3, 7, "c")}


def test_lsm_partial_compaction_contract_free(spark):
    """Partial compaction (keep_recent=K): folds only the oldest
    segments, RETAINS tombstone winners (a below-fold out-of-order
    delivery must still lose to them), never advances the
    tombstone-drop horizon — so unknown below-fold versions APPEND
    normally and the read stays invariant throughout. Only a FULL
    fold advances the horizon, and a genuinely-unapplied version
    below it fails loud (a FOLDED version below it just skips)."""
    import pytest

    root = tempfile.mkdtemp(prefix="clif_lsm_part_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False), (2, 5, "b1", False)]),
        root, 2)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 100, None, True),   # tombstone for k=1
                          (3, 7, "c6", False)]), root, 6)
    # partial fold: seg-2 folds, the newest (seg-6, with the
    # tombstone) stays
    assert streaming.compact_lsm(
        spark, root, ["k"], ["score"], keep_recent=1) == 1
    names = os.listdir(os.path.dirname(root) + "/store")
    assert sum(x.startswith("base-") for x in names) == 1
    assert sum(x.startswith("seg-") for x in names) == 1
    assert _lsm_read_set(spark, root) == {(2, 5, "b1"), (3, 7, "c6")}
    # below max(folded)... irrelevant — only dropped_through (still 0)
    # gates appends, so the late v4 lands; its row for the tombstoned
    # key must still LOSE to the retained tombstone
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 50, "late", False),
                          (4, 9, "d4", False)]), root, 4)
    assert _lsm_read_set(spark, root) == {
        (2, 5, "b1"), (3, 7, "c6"), (4, 9, "d4")}
    # second partial fold folds base + seg-4 (keeps seg-6): the
    # tombstone is STILL in the kept segment -> read unchanged
    assert streaming.compact_lsm(
        spark, root, ["k"], ["score"], keep_recent=1) == 2
    assert _lsm_read_set(spark, root) == {
        (2, 5, "b1"), (3, 7, "c6"), (4, 9, "d4")}
    # a FULL fold drops the tombstone and advances the horizon to 6:
    # a folded version below it skips, an UNAPPLIED one fails loud
    assert streaming.compact_lsm(spark, root, ["k"], ["score"]) == 2
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(9, 1, "z", False)]), root, 4) is None
    with pytest.raises(ValueError, match="tombstone-drop horizon"):
        streaming.append_lsm_segment(
            _lsm_rows(spark, [(9, 1, "z", False)]), root, 3)


def test_lsm_fold_publishes_before_retiring_sources(spark, monkeypatch):
    """ADVICE r12 crash-safety pin: compact_lsm must publish the folded
    base BEFORE deleting its sources. The crash window (fold visible,
    sources not yet retired) is frozen at its widest by making rmtree a
    no-op — reads must be unchanged (keep-best is idempotent over the
    duplicated rows, and a tombstone dropped from the base still masks
    from its surviving source segment). A later fold (the crash replay)
    then retires the strays, uniquifying the base name instead of
    deleting the old base it is folding."""
    import shutil

    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a", False), (2, 5, "b", False)]),
        root, 1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 100, None, True),  # tombstone wins k=1
                          (3, 7, "c", False)]), root, 2)
    before = _lsm_read_set(spark, root)
    assert before == {(2, 5, "b"), (3, 7, "c")}
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)
    assert streaming.compact_lsm(spark, root, ["k"], ["score"]) == 2
    names = sorted(os.listdir(root))
    assert sum(x.startswith("base-") for x in names) == 1
    assert sum(x.startswith("seg-") for x in names) == 2  # strays
    assert _lsm_read_set(spark, root) == before  # the crash window
    monkeypatch.undo()
    # crash replay: folds base + strays; target name collides with the
    # live base (same max version), so it must uniquify, not delete
    assert streaming.compact_lsm(spark, root, ["k"], ["score"]) == 3
    names = sorted(os.listdir(root))
    assert sum(x.startswith("base-") for x in names) == 1
    assert not any(x.startswith("seg-") for x in names)
    assert _lsm_read_set(spark, root) == before
    # the replayed full fold's horizon still guards resurrections:
    # versions 1-2 are in the folded ledger (skip), version 0 below the
    # horizon was never applied -> loud
    import pytest
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(9, 1, "z", False)]), root, 1) is None
    with pytest.raises(ValueError, match="tombstone-drop horizon"):
        streaming.append_lsm_segment(
            _lsm_rows(spark, [(9, 1, "z", False)]), root, 0)


def test_maintain_lsm_crash_window_and_fanout_guard(spark, monkeypatch):
    """maintain_lsm publishes tier runs before retiring members (same
    crash window pin as the full fold), replays cleanly over the
    leftover run, and rejects fanout < 2 at entry (a single run would
    satisfy a 1-fanout tier forever — infinite refold)."""
    import shutil

    import pytest

    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    with pytest.raises(ValueError, match="fanout"):
        streaming.maintain_lsm(spark, root, ["k"], ["score"], fanout=1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False)]), root, 1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 20, "a2", False), (2, 5, "b2", False)]),
        root, 2)
    before = _lsm_read_set(spark, root)

    def boom(*a, **k):  # die on the FIRST retirement after publish
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        streaming.maintain_lsm(spark, root, ["k"], ["score"], fanout=2)
    names = sorted(os.listdir(root))
    assert sum(x.startswith("run-") for x in names) == 1
    assert sum(x.startswith("seg-") for x in names) == 2  # strays
    assert _lsm_read_set(spark, root) == before  # the crash window
    monkeypatch.undo()
    # replay: the stray members refold into the SAME run name (leftover
    # cleared before publish — its rows are a subset of the fresh fold)
    assert streaming.maintain_lsm(spark, root, ["k"], ["score"],
                                  fanout=2) == 1
    names = sorted(os.listdir(root))
    assert sum(x.startswith("run-") for x in names) == 1
    assert not any(x.startswith("seg-") for x in names)
    assert _lsm_read_set(spark, root) == before
    # folded ledger survived the replay: redelivery of a folded
    # version skips even though its segment dir is gone
    assert streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 99, "dup", False)]), root, 2) is None
    assert _lsm_read_set(spark, root) == before


def test_lsm_meta_corruption_fails_loud(spark):
    """ADVICE r12: the meta is written via os.replace (atomic), so a
    corrupt ledger can only mean external damage — every store
    operation must fail with the store-specific message rather than
    guess at the tombstone-resurrection rules."""
    import pytest

    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a", False)]), root, 1)
    assert streaming.compact_lsm(spark, root, ["k"], ["score"]) == 1
    with open(os.path.join(root, "_lsm_meta.json"), "w") as fh:
        fh.write('{"ckpt": "tru')  # torn write
    with pytest.raises(ValueError, match="corrupt"):
        streaming.append_lsm_segment(
            _lsm_rows(spark, [(2, 5, "b", False)]), root, 2)


def test_lsm_segment_skipping_key_range(spark):
    """read_lsm(key_range=...): segments whose footer min/max on the
    leading key cannot intersect the range are dropped from the union
    before any data page is read (asserted via inputFiles — the scan
    set, not the result), and the pruned read is bit-identical to the
    unpruned read filtered to the range, tombstones included."""
    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(2, 10, "x2", False), (3, 11, "x3", False)]),
        root, 1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(100, 5, "y0", False), (103, 6, "y3", False)]),
        root, 2)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(2, 99, None, True),      # tombstone for k=2
                          (101, 7, "y1", False)]), root, 3)
    pruned = streaming.read_lsm(spark, root, ["k"], ["score"],
                                key_range=(2, 3))
    assert {tuple(r) for r in pruned.collect()} == {(3, 11, "x3")}
    # scan set: seg 2 (keys 100-103) is out; segs 1 and 3 are in
    scanned = {f.split("/")[-2] for f in pruned.inputFiles()}
    assert any(d.startswith("seg-00000001") for d in scanned)
    assert any(d.startswith("seg-00000003") for d in scanned)
    assert not any(d.startswith("seg-00000002") for d in scanned)
    # bit-identity vs the unpruned read filtered to the range
    from pyspark.sql import functions as F
    full = streaming.read_lsm(spark, root, ["k"], ["score"]) \
                    .filter(F.col("k").between(2, 3))
    assert ({tuple(r) for r in pruned.collect()}
            == {tuple(r) for r in full.collect()})
    # a range intersecting nothing: empty result, schema preserved,
    # zero scan legs
    none = streaming.read_lsm(spark, root, ["k"], ["score"],
                              key_range=(500, 600))
    assert none.count() == 0
    assert none.columns == ["k", "score", "payload"]
    # pruning composes with compaction: after a partial fold the base
    # straddles both ranges and is kept, the surviving segment prunes
    # as before
    assert streaming.compact_lsm(spark, root, ["k"], ["score"],
                                 keep_recent=1) == 2
    pruned2 = streaming.read_lsm(spark, root, ["k"], ["score"],
                                 key_range=(100, 103))
    assert {tuple(r) for r in pruned2.collect()} == {
        (100, 5, "y0"), (101, 7, "y1"), (103, 6, "y3")}


def test_lsm_snapshot_read_time_travel(spark):
    """read_lsm(as_of=N): the live rows exactly as they stood after
    delivery N — later segments on disk must not leak a row; a
    tombstone applied at N+1 is invisible at N and masking at N+1; a
    snapshot before the first delivery is EMPTY (no fold yet, nothing
    to expire); as_of composes with key_range pruning."""

    def snap(root, n, **kw):
        return {tuple(r) for r in streaming.read_lsm(
            spark, root, ["k"], ["score"], as_of=n, **kw).collect()}

    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False), (2, 5, "b1", False)]),
        root, 1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 20, "a2", False),
                          (2, 999, None, True)]), root, 2)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(3, 7, "c3", False)]), root, 3)
    assert snap(root, 1) == {(1, 10, "a1"), (2, 5, "b1")}
    assert snap(root, 2) == {(1, 20, "a2")}
    assert snap(root, 3) == _lsm_read_set(spark, root)
    assert snap(root, 0) == set()
    assert snap(root, 3, key_range=(3, 9)) == {(3, 7, "c3")}


def test_lsm_snapshot_expires_at_fold_horizon(spark):
    """Compaction expires snapshots: a fold keeps only cross-segment
    winners, so as_of below max(folded) RAISES (partial and full
    forms both move the horizon); at the horizon the snapshot stays
    exact across the fold (fold-invariance of time travel)."""
    import pytest

    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False)]), root, 1)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 20, "a2", False), (2, 5, "b2", False)]),
        root, 2)
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(2, 9, "b3", False)]), root, 3)
    at2_before = {tuple(r) for r in streaming.read_lsm(
        spark, root, ["k"], ["score"], as_of=2).collect()}
    # partial fold of {1,2} (keep the newest segment): horizon -> 2
    assert streaming.compact_lsm(spark, root, ["k"], ["score"],
                                 keep_recent=1) == 2
    with pytest.raises(ValueError, match="expired|horizon"):
        streaming.read_lsm(spark, root, ["k"], ["score"], as_of=1)
    assert {tuple(r) for r in streaming.read_lsm(
        spark, root, ["k"], ["score"], as_of=2).collect()} == at2_before
    # full fold: horizon -> 3; as_of=2 now expired, as_of=3 still live
    streaming.compact_lsm(spark, root, ["k"], ["score"])
    with pytest.raises(ValueError, match="expired|horizon"):
        streaming.read_lsm(spark, root, ["k"], ["score"], as_of=2)
    assert {tuple(r) for r in streaming.read_lsm(
        spark, root, ["k"], ["score"], as_of=3).collect()} \
        == _lsm_read_set(spark, root)


def test_lsm_point_lookup_snapshot_before_first_delivery(spark):
    """read_lsm(key_eq=, as_of=0) on a store whose every delivery is
    above the snapshot (and no fold artifact exists yet) must reach
    the same empty-relation-with-store-schema branch the plain
    key_range/as_of reads get — not die on a path-less parquet read
    while fetching the key column's type (ADVICE r15: the type read
    sat after the as_of prune, which can empty the segment list)."""
    root = tempfile.mkdtemp(prefix="clif_lsm_") + "/store"
    streaming.append_lsm_segment(
        _lsm_rows(spark, [(1, 10, "a1", False)]), root, 1)
    got = streaming.read_lsm(spark, root, ["k"], ["score"],
                             key_eq=1, as_of=0)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == \
        ["k", "score", "payload"]
    # and at as_of=1 the same lookup sees the row (the fix must not
    # have disturbed the live path)
    assert {tuple(r) for r in streaming.read_lsm(
        spark, root, ["k"], ["score"], key_eq=1, as_of=1).collect()} \
        == {(1, 10, "a1")}


def test_agg_delivered_through_pointer(spark):
    """agg_delivered_through: None before the first fold and for a
    foreign lineage; tracks the last-applied ordinal after folds —
    the restart primitive that lets a monotone-ordinal maintenance
    job skip already-applied deliveries after a checkpoint reset
    (fold_agg_snapshot itself keeps raising on below-pointer
    ordinals; the skip decision belongs to the ordinal's owner)."""
    root = tempfile.mkdtemp(prefix="clif_aggptr_") + "/store"
    assert streaming.agg_delivered_through(root, "x") is None
    p = spark.createDataFrame([("a", 1)], "k string, c long")
    streaming.fold_agg_snapshot(p, root, keys=["k"], version=0,
                                add_cols=["c"], lineage="x")
    assert streaming.agg_delivered_through(root, "x") == 0
    assert streaming.agg_delivered_through(root, "other") is None
    streaming.fold_agg_snapshot(p, root, keys=["k"], version=3,
                                add_cols=["c"], lineage="x")
    assert streaming.agg_delivered_through(root, "x") == 3


def test_compact_drop_zero_cols(spark):
    """compact_cdc_snapshot(drop_zero_cols=...): physically removes
    live rows whose listed aggregates are ALL zero (the takedown
    residue), leaves partially-zero rows (multi-col ALL rule), stays
    idempotent when re-invoked, handles the drop-zero-AFTER-plain-
    compaction case (unique _z suffix, zeros actually go), and a
    fresh positive fold re-admits a dropped key."""
    root = tempfile.mkdtemp(prefix="clif_zcmp_") + "/store"

    def fold(rows, v):
        p = spark.createDataFrame(rows, "k string, a long, b long")
        return streaming.fold_agg_snapshot(
            p, root, keys=["k"], version=v, add_cols=["a", "b"],
            lineage="z")

    fold([("x", 2, 1), ("y", 3, 3), ("w", 5, 0)], 0)
    fold([("x", -2, -1)], 1)          # zeroes x on BOTH aggregates
    snap = streaming.read_cdc_snapshot(spark, root)
    assert snap.count() == 3
    # plain compaction first: zeros survive (tombstone-only contract)
    assert streaming.compact_cdc_snapshot(spark, root) == 0
    assert streaming.read_cdc_snapshot(spark, root).count() == 3
    # drop-zero over the already-compacted dir: x goes (both zero),
    # w stays (b zero but a nonzero — ALL rule)
    assert streaming.compact_cdc_snapshot(
        spark, root, drop_zero_cols=["a", "b"]) == 1
    got = {r.k for r in
           streaming.read_cdc_snapshot(spark, root).collect()}
    assert got == {"y", "w"}
    # idempotent re-invocation: nothing left to drop
    assert streaming.compact_cdc_snapshot(
        spark, root, drop_zero_cols=["a", "b"]) == 0
    # re-admission: a fresh positive fold recreates the dropped key
    fold([("x", 7, 7)], 2)
    rows = {(r.k, r.a, r.b) for r in
            streaming.read_cdc_snapshot(spark, root).collect()}
    assert ("x", 7, 7) in rows


def test_compact_drop_zero_null_safe_and_current_version_addressable(
        spark):
    """Round-15 review regressions, pinned: (1) a live row whose
    drop_zero_cols value is NULL (the allow_missing_columns schema-
    evolution shape) is NOT zero and must SURVIVE a drop-zero
    compaction — plain `== 0` would NULL-propagate through the keep
    filter and silently delete it; (2) after a drop-zero RE-compaction
    (the _z-suffixed rewrite of an already-compacted dir), the CURRENT
    version must stay addressable through read_cdc_snapshot(version=)
    — the pointer names the path, whatever suffix the compactor
    minted."""
    root = tempfile.mkdtemp(prefix="clif_zn_") + "/store"

    def up(rows, schema, v, **kw):
        streaming.upsert_cdc_snapshot(
            spark.createDataFrame(rows, schema), root,
            keys=["k"], order=["__v", "k"], lineage="zn", **kw)

    up([("old", 5, 0, False)],
       "k string, a long, __v long, is_delete boolean", 0)
    # additive evolution: old row's b is NULL from here on
    up([("new", 0, 7, 1, False), ("dead", 0, 0, 1, False)],
       "k string, a long, b long, __v long, is_delete boolean", 1,
       allow_missing_columns=True)
    # plain compaction first, so the drop-zero pass exercises the
    # already-compacted (_z-suffix) branch
    assert streaming.compact_cdc_snapshot(spark, root) == 0
    removed = streaming.compact_cdc_snapshot(
        spark, root, drop_zero_cols=["a", "b"])
    assert removed == 1  # ONLY the all-zero row; never the NULL-b row
    got = {(r.k, r.a, r.b) for r in
           streaming.read_cdc_snapshot(spark, root).collect()}
    assert got == {("old", 5, None), ("new", 0, 7)}
    # the current version resolves by explicit version= too
    cur = streaming._cdc_pointer_read(root)[0]
    assert streaming.read_cdc_snapshot(
        spark, root, version=cur).count() == 2


def test_read_cdc_snapshot_include_tombstones_watermark(spark):
    """read_cdc_snapshot(include_tombstones=True): returns the RAW
    stored rows (tombstone column intact) — ADVICE r16: a maintenance
    job deriving its applied-through watermark from a data-carried
    ordinal must see tombstoned rows, or a delivery that writes ONLY
    tombstones never advances the watermark and re-applies after a
    checkpoint reset. Pins both the raw read and the failure mode the
    live-row projection would reintroduce."""
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="clif_rawread_") + "/store"

    def up(rows, ver, dead=False):
        df = (spark.createDataFrame(rows, "k string, c long")
              .withColumn("__v", F.lit(ver).cast("long"))
              .withColumn("is_delete", F.lit(dead)))
        streaming.upsert_cdc_snapshot(
            df, root, keys=["k"], order=["__v", "k"], lineage="raw")

    up([("a", 1), ("b", 2)], 0)
    up([("b", 0)], 1, dead=True)  # delivery 1 writes ONLY a tombstone

    live_max = (streaming.read_cdc_snapshot(spark, root)
                .agg(F.max("__v")).first()[0])
    raw = streaming.read_cdc_snapshot(spark, root,
                                      include_tombstones=True)
    raw_max = raw.agg(F.max("__v")).first()[0]
    assert live_max == 0      # the stale watermark the live read gives
    assert raw_max == 1       # the correct applied-through ordinal
    assert "is_delete" in raw.columns
    assert raw.count() == 2 and raw.filter(F.col("is_delete")).count() == 1
    # default read is unchanged: live rows only, tombstone col dropped
    live = streaming.read_cdc_snapshot(spark, root)
    assert "is_delete" not in live.columns
    assert [tuple(r) for r in live.select("k", "c").collect()] == \
        [("a", 1)]
