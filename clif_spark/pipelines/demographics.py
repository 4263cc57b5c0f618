"""Demographics / identifiers / disposition pipelines
(`code/RCLIF_demographics.Rmd`, `code/RCLIF_disposition.Rmd`; SURVEY §3
honorable mention): a pure star-join + classify dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core, windows

#: Race buckets (`code/RCLIF_demographics.Rmd:55-67`) — first-match-wins.
RACE_BRANCHES = [
    (r"(?i)black|african", "Black"),
    (r"(?i)white", "White"),
    (r"(?i)asian indian|asian", "Asian"),
    (r"(?i)american indian|alaska", "American Indian"),
    (r"(?i)hawaiian|pacific", "Pacific Islander"),
    (r"(?i)declin|unknown", "Unknown"),
]

#: Ethnicity buckets (`:68-76`).
ETHNICITY_BRANCHES = [
    (r"(?i)not hispanic", "Not Hispanic"),
    (r"(?i)hispanic|latino", "Hispanic"),
]

#: Disposition buckets (`code/RCLIF_disposition.Rmd:56-82`).
DISPO_BRANCHES = [
    (r"(?i)expired|death|died", "Expired"),
    (r"(?i)hospice", "Hospice"),
    (r"(?i)home", "Home"),
    (r"(?i)skilled nursing|snf", "SNF"),
    (r"(?i)rehab", "Rehab"),
    (r"(?i)discharged/transferred|another", "Transferred"),
]


def _regex_classify(col: F.Column, branches, default: str = "Other") -> F.Column:
    return S.classify([(col.rlike(p), label) for p, label in branches],
                      default=default)


def build_patient_demographics(demo: DataFrame) -> DataFrame:
    """patient_demographics: race/ethnicity case_when buckets (`:53-86`)."""
    return (demo.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                _regex_classify(F.col("race"), RACE_BRANCHES).alias("race"),
                _regex_classify(F.col("ethnic"), ETHNICITY_BRANCHES)
                    .alias("ethnicity"),
                "sex")
            .orderBy("patient_id"))


def build_limited_identifiers(enc: DataFrame, demo: DataFrame,
                              zips: DataFrame) -> DataFrame:
    """limited_identifiers: hb-encounter spine joined to birth dates and zip
    codes (`:42-47,93-105`)."""
    hb = enc.filter(F.col("record_type") == "hb")
    out = core.composite_join(
        hb, demo.select("C19_PATIENT_ID", "birth_date"), ["C19_PATIENT_ID"])
    out = core.vocab_join(out, zips, on="C19_PATIENT_ID", how="left")
    return (out.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                S.epoch_to_ts(F.col("adm_date")).alias("admission_dttm"),
                S.epoch_to_ts(F.col("disc_date")).alias("discharge_dttm"),
                S.epoch_to_ts(F.col("birth_date")).alias("birth_date"),
                "zip_code")
            .orderBy("patient_id", "encounter_id"))


def build_encounter_dispo(enc: DataFrame, demo: DataFrame,
                          xtra: DataFrame) -> DataFrame:
    """encounter_demographics_dispo: age at admission (calendar years,
    `:116-118`) + classified discharge disposition with keep-last dedup
    over repeated disposition rows (`code/RCLIF_disposition.Rmd:51`)."""
    hb = enc.filter(F.col("record_type") == "hb").dropna(subset=["adm_date"])
    aged = (core.composite_join(
                hb, demo.select("C19_PATIENT_ID", "birth_date"),
                ["C19_PATIENT_ID"])
            .withColumn("age_at_admission",
                        S.age_years(S.epoch_to_ts(F.col("birth_date")),
                                    S.epoch_to_ts(F.col("adm_date")))))
    # R keep-last is positional; the engine orders by an explicit surrogate
    # (here discharge_dispo as the deterministic tiebreak; SURVEY §7.4.1).
    last_dispo = windows.dedup_keep_last(
        xtra.filter(F.col("record_type") == "hb"),
        ["C19_PATIENT_ID", "C19_HAR_ID"], ["discharge_dispo"])
    out = core.composite_join(
        aged, last_dispo.select("C19_PATIENT_ID", "C19_HAR_ID", "discharge_dispo"),
        ["C19_PATIENT_ID", "C19_HAR_ID"])
    return (out.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                "age_at_admission",
                _regex_classify(F.col("discharge_dispo"), DISPO_BRANCHES)
                    .alias("disposition"),
                S.hash_id(F.col("C19_PATIENT_ID")).alias("patient_id_hash"))
            .orderBy("patient_id", "encounter_id"))
