"""Streaming queries (SURVEY §2.10 / Phase 5), differentially tested.

Each query executes a genuine Structured Streaming plan (file source ->
watermark -> stateful op -> memory sink) to completion with an
``availableNow`` trigger, then returns the settled result — which must equal
the batch answer, so the ordinary DuckDB oracle applies. This is the
streaming/batch unification Spark promises, used as a correctness gate.

Window starts are returned as epoch micros (bigint) per registry policy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clif_spark import streaming
from clif_spark.queries import query, us


@query(
    "stream_tumbling_agg",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS w_start,
           event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 2)
             AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark, sf_dir):
    """Watermarked 1h tumbling count+sum per event_type, run as a real
    stream (availableNow) and settled — must equal the batch grouping."""
    ev = streaming.read_events_stream(spark, sf_dir)
    out = streaming.run_to_memory(streaming.tumbling_agg(ev))
    return out.select(us(F.col("w.start")).alias("w_start"), "event_type",
                      "n", "sum_value")


@query(
    "stream_sliding_agg",
    oracle="""
    WITH starts AS (
      SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                     time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'])
               AS w_start,
             event_type
      FROM events
    )
    SELECT epoch_us(w_start) AS w_start, event_type, COUNT(*) AS n
    FROM starts
    GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark, sf_dir):
    """2h windows sliding by 1h: every event lands in exactly two windows
    (the batch mirror enumerates both starts per event)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    out = streaming.run_to_memory(streaming.sliding_agg(ev))
    return out.select(us(F.col("w.start")).alias("w_start"), "event_type", "n")


@query(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark, sf_dir):
    """Per-user 30-minute-gap session windows computed incrementally —
    the streaming twin of the dialysis episode derivation (W1). The oracle
    is the classic gaps-and-islands SQL; session start identifies a session
    (Spark's session end = last_ts + gap, an implementation representation,
    is not compared)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    out = streaming.run_to_memory(streaming.session_agg(ev))
    return out.select("user_id", us(F.col("w.start")).alias("session_start"),
                      "n_events")


@query(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(COALESCE(value, 0.0)) AS DOUBLE), 2) AS sum_value,
           epoch_us(MAX(ts)) AS last_ts_us,
           false AS closed
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user running
    count/sum/last-seen accumulators with processing-time timeout eviction.
    On the bounded replay every user emits exactly one open-state update row,
    which must equal the batch per-user aggregate."""
    ev = streaming.read_events_stream(spark, sf_dir)
    out = streaming.run_to_memory(streaming.running_user_stats(ev),
                                  output_mode="update")
    return out.select("user_id", "n_events",
                      F.round("sum_value", 2).alias("sum_value"),
                      "last_ts_us", "closed")


@query(
    "stream_click_to_buy",
    oracle="""
    SELECT b.user_id,
           COUNT(*) AS n_attributed,
           COUNT(DISTINCT b.event_id) AS n_buys
    FROM events c
    JOIN events b
      ON b.user_id = c.user_id
     AND b.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= b.ts - INTERVAL '1 hour' AND c.ts <= b.ts
    GROUP BY b.user_id
    """,
)
def stream_click_to_buy(spark, sf_dir):
    """Stream-stream interval join (J8's streaming twin): clicks joined to
    purchases of the same user within a 1-hour attribution window, both
    sides watermarked so buffered join state is evictable. Run as a real
    availableNow stream into memory, then aggregated per user (join runs
    in the stream; the count is batch, like stream_dedup_counts)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", F.col("ts").alias("click_ts"),
                        F.col("event_id").alias("click_id")))
    buys = (ev.filter(F.col("event_type") == "purchase")
              .select(F.col("user_id"), F.col("ts").alias("buy_ts"),
                      F.col("event_id").alias("buy_id")))
    joined = streaming.stream_stream_join(
        clicks, buys, key="user_id", left_ts="click_ts", right_ts="buy_ts")
    settled = streaming.run_to_memory(joined, output_mode="append")
    return (settled.groupBy("user_id")
                   .agg(F.count(F.lit(1)).alias("n_attributed"),
                        F.countDistinct("buy_id").alias("n_buys")))


@query(
    "stream_dedup_counts",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_counts(spark, sf_dir):
    """Stateful streaming dedup on (user_id, event_type) — first arrival
    wins — then a per-type count of the survivors, which must equal the
    batch COUNT(DISTINCT user_id). Run as two chained availableNow passes
    (dedup emits an append stream the aggregation consumes in batch)."""
    ev = streaming.read_events_stream(spark, sf_dir)
    deduped = streaming.run_to_memory(
        streaming.stream_dedup(ev, ["user_id", "event_type"]),
        output_mode="append")
    return (deduped.groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("n_users")))


@query(
    "stream_static_enrich",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS w_start,
           CAST(user_id % 5 AS BIGINT) AS tier,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark, sf_dir):
    """Stream-static broadcast enrichment — the lookup-join every streaming
    pipeline starts with: the event stream joins a STATIC dimension (no
    watermark needed on the static side; it broadcasts into every
    micro-batch), then a watermarked tumbling aggregate per enriched
    attribute. The oracle derives the same tier arithmetically — the join
    must be semantically invisible. At scale the static side refreshes by
    swapping the broadcast per batch; state is bounded by the window
    aggregate alone."""
    from clif_spark import io

    ev = streaming.read_events_stream(spark, sf_dir)
    dim = (io.load_table(spark, sf_dir, "events")
           .select("user_id").distinct()
           .withColumn("tier", (F.col("user_id") % 5).cast("long")))
    joined = ev.join(F.broadcast(dim), "user_id")
    agg = (joined.withWatermark("ts", "1 hour")
                 .groupBy(F.window("ts", "1 hour").alias("w"), "tier")
                 .agg(F.count(F.lit(1)).alias("n")))
    out = streaming.run_to_memory(agg)
    return out.select(us(F.col("w.start")).alias("w_start"), "tier", "n")


@query(
    "stream_dedup_bounded_state",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_bounded_state(spark, sf_dir):
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark — the
    production form of stream_dedup_counts): duplicate suppression is only
    guaranteed within the watermark horizon, which is exactly what lets the
    state store EVICT keys older than the horizon instead of growing with
    every distinct key forever. The replay's horizon (365d) covers the whole
    bounded corpus, so the settled result must still equal the batch
    COUNT(DISTINCT) — the gate proves the bounded API drops no in-horizon
    duplicates and loses no firsts."""
    ev = streaming.read_events_stream(spark, sf_dir)
    deduped = streaming.run_to_memory(
        streaming.stream_dedup(ev, ["user_id", "event_type"],
                               watermark="365 days"),
        output_mode="append")
    return (deduped.groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("n_users")))
