"""Scores pipeline (`code/RCLIF_scores.Rmd`): clinical score events with
SOFA-neuro banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core

#: Score flowsheet rows kept (`code/RCLIF_scores.Rmd:42-50`).
SCORE_FLO_NAMES = [
    "NUR RA GLASGOW ADULT SCORING", "NUR RA RASS SCORE",
    "NUR RA CAM ICU", "R NUR BRADEN SCORE",
]


def build_scores(flow: DataFrame) -> DataFrame:
    """scores: in-list filter (`:50`) + rename (`:53-55`) + epoch->ts."""
    kept = core.filter_in(flow, "flo_meas_name", SCORE_FLO_NAMES)
    return (kept.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                S.epoch_to_ts(F.col("recorded_time")).alias("score_time"),
                F.col("flo_meas_name").alias("score_name"),
                F.col("meas_value").alias("score_value"))
            .orderBy("encounter_id", "score_time", "score_name"))


def sofa_neuro_band(scores_table: DataFrame) -> DataFrame:
    """SOFA-neuro GCS banding (`code/RCLIF_scores.Rmd:86-92`): numeric cast
    (junk -> NULL) then 5-band case_when — band edges per the SOFA scale."""
    gcs = S.to_double(F.col("score_value"))
    band = S.classify([
        (gcs >= 15, F.lit(0.0)),
        (gcs >= 13, F.lit(1.0)),
        (gcs >= 10, F.lit(2.0)),
        (gcs >= 6, F.lit(3.0)),
        (gcs.isNotNull(), F.lit(4.0)),
    ])
    return (scores_table
            .filter(F.col("score_name").rlike("(?i)glasgow"))
            .withColumn("sofa_neuro", band))
