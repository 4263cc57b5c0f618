"""Labs pipeline (`code/RCLIF_labs.Rmd`): vocab-mapped long lab events with
whole-row dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core

def build_labs(labs: DataFrame, vocab: DataFrame) -> DataFrame:
    """labs: raw extract ⟕ component vocab (`:46`), unmapped components
    dropped (`:46-47`), exact-duplicate rows removed (`:75`), epoch order
    and result times to timestamps (`:54-55`).

    ``vocab``: (component_name, lab_name, lab_group, lab_type_name) — ≤110
    rows in the reference (`rclif_data/lab_name_lab_group_units.xlsx`),
    always broadcast.
    """
    mapped = core.vocab_join(labs, vocab, on="component_name", how="left")
    mapped = core.filter_not_null(mapped, "lab_name")
    out = (mapped.select(
               F.col("C19_PATIENT_ID").alias("patient_id"),
               F.col("C19_HAR_ID").alias("encounter_id"),
               S.epoch_to_ts(F.col("order_time")).alias("lab_order_time"),
               S.epoch_to_ts(F.col("result_time")).alias("lab_result_time"),
               "lab_group", "lab_name",
               F.col("ord_value").alias("lab_value"),
               "reference_unit", "lab_type_name")
           .dropDuplicates())
    return out.orderBy("encounter_id", "lab_order_time", "lab_name")


def numeric_lab_values(labs_table: DataFrame) -> DataFrame:
    """`as.numeric` cast of messy lab values ("<0.5" -> NULL) — R silent-NA
    fidelity (`code/RCLIF_scores.Rmd:87-91` pattern; SURVEY §7.4.3)."""
    return labs_table.withColumn(
        "lab_value_numeric", S.to_double(F.col("lab_value")))
