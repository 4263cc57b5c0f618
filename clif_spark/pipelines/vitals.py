"""Vitals + respiratory-support pipeline — the reference's flagship dataflow
(`code/RCLIF_vitals.Rmd`, SURVEY §3.1) recomposed from engine operators.

Stages (reference line → operator):
  :23-25  scan 2 txt parts + union      -> io.read_delimited([p1, p2])
  :33,:41 vocab scan + left join        -> core.vocab_join (broadcast)
  :42     filter vital_name not null    -> core.filter_not_null
  :47-51  BP branch: split "120/80",    -> reshape.split_column + unpivot
          pivot_longer(sbp, dbp)
  :55-58  non-BP branch select/rename   -> core.project
  :59     union branches                -> reshape.union_by_name
  :60     epoch -> timestamp            -> scalars.epoch_to_ts
  :61     sort (encounter, time)        -> terminal sort (sink-side policy)
  :97-113 resp: filter 10 names, pivot  -> core.filter_in + reshape.pivot_wide
  :117-124 full join mode vocab         -> core.vocab_join(how="full")
  :125-159 device classify, lpm clean,  -> scalars.classify / clamp / coalesce
          fio2 fallback
  :161-162 per-encounter downup fill    -> windows.fill_downup

Scale notes: the whole vitals branch is one narrow pipeline + broadcast join
until the sink; only the resp-support pivot groupBy shuffles. Windows
partition by encounter — bucketed layout makes the fill exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core, reshape, windows

#: The 10 respiratory-support flowsheet rows pivoted wide
#: (`code/RCLIF_vitals.Rmd:97-106`).
RESP_FLO_NAMES = [
    "RT RS OXYGEN DEVICE", "RT RS MODE", "RT RS VENT SET VOLUME",
    "RT RS PRESSURE SUPPORT", "RT RS SET RESP RATE", "RT RS LPM",
    "RT RS FIO2", "RT RS VENT FIO2", "RT RS NI FIO2", "RT RS PEEP",
]


def build_vitals(flow: DataFrame, vocab: DataFrame) -> DataFrame:
    """Long/EAV vitals table from the raw flowsheet extract.

    ``flow``: c19_flow_lds schema; ``vocab``: (flo_meas_name, vital_name).
    Output grain: one row per (encounter, time, vital_name).
    """
    mapped = core.vocab_join(flow, vocab, on="flo_meas_name", how="left")
    mapped = core.filter_not_null(mapped, "vital_name")

    # BP branch: "120/80" -> sbp/dbp rows (`:47-51`).
    bp = mapped.filter(F.col("vital_name") == "blood_pressure")
    bp = reshape.split_column(bp, "meas_value", "/", ["sbp", "dbp"])
    bp = reshape.unpivot(
        bp, ["C19_PATIENT_ID", "C19_HAR_ID", "recorded_time", "meas_site_name"],
        ["sbp", "dbp"], "vital_name", "vital_value")

    non_bp = mapped.filter(F.col("vital_name") != "blood_pressure").select(
        "C19_PATIENT_ID", "C19_HAR_ID", "recorded_time", "meas_site_name",
        "vital_name", F.col("meas_value").alias("vital_value"))

    unioned = reshape.union_by_name([non_bp, bp])
    return (unioned.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                S.epoch_to_ts(F.col("recorded_time")).alias("recorded_time"),
                "vital_name",
                F.col("vital_value").cast("double").alias("vital_value"),
                "meas_site_name")
            .orderBy("encounter_id", "recorded_time", "vital_name"))


def build_respiratory_support(flow: DataFrame, mode_vocab: DataFrame) -> DataFrame:
    """Wide respiratory-support table (`code/RCLIF_vitals.Rmd:97-166`).

    ``mode_vocab``: (mode_name, mode_category) — full-joined so vocab-only
    modes survive (`:117-124`).
    """
    rs = core.filter_in(flow, "flo_meas_name", RESP_FLO_NAMES)
    wide = reshape.pivot_wide(
        rs, ["C19_PATIENT_ID", "C19_HAR_ID", "recorded_time"],
        "flo_meas_name", "meas_value", RESP_FLO_NAMES,
        order_col="meas_value")
    wide = core.rename(wide, {
        "RT RS OXYGEN DEVICE": "device_name", "RT RS MODE": "mode_name",
        "RT RS VENT SET VOLUME": "set_volume",
        "RT RS PRESSURE SUPPORT": "pressure_support",
        "RT RS SET RESP RATE": "set_resp_rate", "RT RS LPM": "lpm_raw",
        "RT RS FIO2": "fio2_a", "RT RS VENT FIO2": "fio2_b",
        "RT RS NI FIO2": "fio2_c", "RT RS PEEP": "peep",
    })

    merged = core.vocab_join(wide, mode_vocab, on="mode_name", how="full")

    # Device classification (`:125-135`, first-match-wins) + flags (`:150-153`).
    dev = F.col("device_name")
    device_category = S.classify([
        (dev.rlike("(?i)high flow"), "High Flow NC"),
        (dev.rlike("(?i)vent"), "Vent"),
        (dev.rlike("(?i)bipap|cpap"), "NIPPV"),
        (dev.rlike("(?i)nasal cannula"), "Nasal Cannula"),
        (dev.rlike("(?i)room air"), "Room Air"),
        (dev.isNotNull(), "Other"),
    ])
    # lpm cleaning (`:136-149`): junk -> NULL, negatives -> NULL, clamp 60.
    lpm_num = S.to_double(F.col("lpm_raw"))
    lpm = F.when(lpm_num < 0, None).otherwise(S.clamp(lpm_num, hi=60.0))
    # FiO2 3-way fallback (`:154-157`) then /100 (`:158`).
    fio2 = S.to_double(
        F.coalesce(F.col("fio2_a"), F.col("fio2_b"), F.col("fio2_c"))) / 100.0

    out = (merged
           .withColumn("device_category", device_category)
           .withColumn("lpm", lpm)
           .withColumn("fio2", fio2))

    # Per-encounter downup fill of sparse device/mode columns (`:161-162`).
    out = windows.fill_downup(
        out, ["C19_PATIENT_ID", "C19_HAR_ID"], ["recorded_time"],
        ["device_name", "mode_name", "mode_category", "device_category"])
    # Flags derive from the *filled* device (`:150-153` precedes the fill in
    # the reference, but its fill covers device_name — deriving post-fill
    # keeps flag and device consistent on back-filled rows).
    out = out.withColumn("high_flow", F.col("device_name").rlike("(?i)high flow"))

    return (out.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                S.epoch_to_ts(F.col("recorded_time")).alias("recorded_time"),
                "device_name", "device_category", "mode_name", "mode_category",
                S.to_double(F.col("set_volume")).alias("set_volume"),
                S.to_double(F.col("pressure_support")).alias("pressure_support"),
                S.to_double(F.col("set_resp_rate")).alias("set_resp_rate"),
                "lpm", "fio2",
                S.to_double(F.col("peep")).alias("peep"),
                "high_flow")
            .orderBy("encounter_id", "recorded_time"))
