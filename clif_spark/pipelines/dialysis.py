"""Dialysis episode derivation (`code/RCLIF_dialysis.Rmd`, SURVEY §3.3) —
the reference's most engine-like computation: point flowsheet events ->
[start, stop) interval episodes per modality, then a 3-way union.

Stages (reference line → operator):
  :32-42   scan + %like% DIALYSIS prefilter + distinct  -> P9, U2
  :49-61   CRRT: distinct times/encounter; start=ts-1h  -> P7, U2, F10
  :63-77   CRRT: natural ⟕ removal/filtrate on          -> core.composite_join
           (encounter, stop_time) — engine passes          (explicit keys,
           the reference's *effective* key explicitly      SURVEY §7.4.7)
  :87-100  iHD: lead(ts) episodes, keep start rows      -> windows.lead_episodes
  :121-144 PD: union starts+stops, lead(ts)             -> U1 + W1
  :156-157 union 3 modality frames (missing cols)       -> reshape.union_by_name
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core, reshape, windows

#: flo_group_name vocabularies per modality
#: (`code/RCLIF_dialysis.Rmd:49-50,87-88,121-122`).
CRRT_GROUPS = ["Fluid Delivered (L/Hr)", "Actual Fluid Removed (mL)"]
IHD_GROUPS = ["Machine Number", "aUltra Filtration Net Loss"]
PD_GROUPS = ["Initial Drain", "Fill Volume", "Total Ultrafiltration"]


def _dialysis_rows(flow_io: DataFrame) -> DataFrame:
    """`%like% "DIALYSIS"` prefilter + distinct (`:39-40`) with epoch->ts."""
    return reshape.distinct_rows(
        flow_io.filter(F.col("flo_meas_name").contains("DIALYSIS"))
               .select(F.col("C19_PATIENT_ID").alias("patient_id"),
                       F.col("C19_HAR_ID").alias("encounter_id"),
                       S.epoch_to_ts(F.col("recorded_time")).alias("recorded_time"),
                       "flo_group_name",
                       F.col("meas_value")))


def build_crrt(rows: DataFrame) -> DataFrame:
    """CRRT episodes (`:49-80`): each distinct recording time is an episode
    stop; start = stop - 1 hour (hourly cadence); flow/removal values join
    back on the (encounter, stop_time) key."""
    times = reshape.distinct_rows(
        rows.filter(F.col("flo_group_name").isin(CRRT_GROUPS)),
        ["patient_id", "encounter_id", "recorded_time"])
    episodes = (times
                .withColumn("stop_time", F.col("recorded_time"))
                .withColumn("start_time",
                            F.col("recorded_time") - F.expr("INTERVAL 1 HOUR"))
                .drop("recorded_time"))
    flow = reshape.distinct_rows(
        rows.filter(F.col("flo_group_name") == "Fluid Delivered (L/Hr)")
            .select("encounter_id", F.col("recorded_time").alias("stop_time"),
                    S.to_double(F.col("meas_value")).alias("dialysate_flow_amount")))
    removal = reshape.distinct_rows(
        rows.filter(F.col("flo_group_name") == "Actual Fluid Removed (mL)")
            .select("encounter_id", F.col("recorded_time").alias("stop_time"),
                    S.to_double(F.col("meas_value")).alias("ultrafiltration_amount")))
    out = core.composite_join(episodes, flow, ["encounter_id", "stop_time"])
    out = core.composite_join(out, removal, ["encounter_id", "stop_time"])
    return out.withColumn("dialysis_type", F.lit("crrt"))


def build_ihd(rows: DataFrame) -> DataFrame:
    """Intermittent HD episodes (`:87-114`): lead(ts) per encounter = stop;
    keep the session-start rows ('Machine Number'); drop episodes without an
    ultrafiltration value (`:110`)."""
    ihd = rows.filter(F.col("flo_group_name").isin(IHD_GROUPS))
    eps = windows.lead_episodes(
        ihd, ["encounter_id"], "recorded_time", tiebreak=["flo_group_name"])
    starts = (eps.filter(F.col("flo_group_name") == "Machine Number")
                 .select("patient_id", "encounter_id", "start_time", "stop_time"))
    removal = reshape.distinct_rows(
        rows.filter(F.col("flo_group_name") == "aUltra Filtration Net Loss")
            .select("encounter_id", F.col("recorded_time").alias("stop_time"),
                    S.to_double(F.col("meas_value")).alias("ultrafiltration_amount")))
    out = core.composite_join(starts, removal, ["encounter_id", "stop_time"])
    out = core.filter_not_null(out, "ultrafiltration_amount")
    return out.withColumn("dialysis_type", F.lit("ihd"))


def build_pd(rows: DataFrame) -> DataFrame:
    """Peritoneal episodes (`:121-150`): union fill starts + drain stops,
    lead(ts) per encounter; nonzero volumes only (`:128`)."""
    pd_rows = rows.filter(
        F.col("flo_group_name").isin(PD_GROUPS)
        & (S.to_double(F.col("meas_value")) != 0))
    eps = windows.lead_episodes(
        pd_rows, ["encounter_id"], "recorded_time", tiebreak=["flo_group_name"])
    starts = (eps.filter(F.col("flo_group_name") == "Fill Volume")
                 .select("patient_id", "encounter_id", "start_time", "stop_time"))
    removal = reshape.distinct_rows(
        rows.filter(F.col("flo_group_name") == "Total Ultrafiltration")
            .select("encounter_id", F.col("recorded_time").alias("stop_time"),
                    S.to_double(F.col("meas_value")).alias("ultrafiltration_amount")))
    out = core.composite_join(starts, removal, ["encounter_id", "stop_time"])
    out = core.filter_not_null(out, "ultrafiltration_amount")
    return out.withColumn("dialysis_type", F.lit("pd"))


def build_dialysis(flow_io: DataFrame) -> DataFrame:
    """Full dialysis table: the 3-modality union with missing columns
    NULL-filled (iHD/PD lack dialysate_flow_amount; `:156-157`)."""
    rows = _dialysis_rows(flow_io)
    out = reshape.union_by_name(
        [build_crrt(rows), build_ihd(rows), build_pd(rows)],
        allow_missing=True)
    return out.select("patient_id", "encounter_id", "dialysis_type",
                      "start_time", "stop_time",
                      "dialysate_flow_amount", "ultrafiltration_amount")


def sanity_tally(dialysis: DataFrame) -> DataFrame:
    """The reference's year×type episode tally check (`:162-168`)."""
    days = reshape.distinct_rows(
        dialysis.select("encounter_id", "dialysis_type",
                        F.to_date("start_time").alias("day")))
    return (days.groupBy(F.year("day").cast("long").alias("year"),
                         "dialysis_type")
                .agg(F.count(F.lit(1)).alias("n")))
