"""ADT (admission/discharge/transfer) pipeline (`code/RCLIF_adt.Rmd`):
interval stays with regex-classified department/room names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core

#: Department classification families (`code/RCLIF_adt.Rmd:34-59` — ~25
#: regexes over 4 classes; representative patterns per class).
DEPT_BRANCHES = [
    (r"(?i)icu|ccu|d2", "ICU"),
    (r"(?i)^ed|emergency", "ED"),
    (r"(?i)or\b|surg|pacu", "Procedural"),
    (r"(?i)n\d|med|floor", "Ward"),
]

#: Room classification (`:60-87`).
ROOM_BRANCHES = [
    (r"(?i)trauma", "trauma"),
    (r"^[0-9]+$", "standard"),
    (r"(?i)^[a-z]\d", "unit_bed"),
]


def build_adt(adt: DataFrame) -> DataFrame:
    """ADT stays: the reference's mixed time encodings preserved (in_time is
    a datetime *string* parsed at `:32`, out_time epoch at `:89`), non-castable
    patient ids dropped (`:33` — the warning-as-filter idiom, P11)."""
    valid = core.filter_castable(adt, "C19_PATIENT_ID", "double")
    return (valid.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                S.parse_ts(F.col("in_time")).alias("start_time"),
                S.epoch_to_ts(F.col("out_time")).alias("end_time"),
                "adt_department_name",
                S.classify(
                    [(F.col("adt_department_name").rlike(p), label)
                     for p, label in DEPT_BRANCHES],
                    default="Other").alias("dept_name"),
                "adt_room_nm_wid",
                S.classify(
                    [(F.col("adt_room_nm_wid").rlike(p), label)
                     for p, label in ROOM_BRANCHES],
                    default="other").alias("room_name"))
            .orderBy("encounter_id", "start_time"))
