"""Admission-diagnosis pipeline (`code/RCLIF_admission_diagnosis.Rmd:29-35`):
the smallest reference lifecycle — select the diagnosis columns off the raw
dump, rename to the published vocabulary, order by patient/encounter, sink.

Reference quirks preserved on purpose:
- the published column is spelled ``dianosis_code`` (sic) — renaming it
  would break every downstream consumer of the reference's output
  (`RCLIF_admission_diagnosis.Rmd:33`);
- ``poa`` ("present on admission") publishes as ``pta``
  (`RCLIF_admission_diagnosis.Rmd:34`).

Scale note: the whole pipeline is projection + rename — a single narrow
stage over the scan, no shuffle at all until the sink's layout policy
(io.write_table replaces the reference's global ``arrange`` with
partitioned layout + sortWithinPartitions, SURVEY §7.4.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from clif_spark.operators import core

#: raw column -> published column (`RCLIF_admission_diagnosis.Rmd:31-34`).
RENAMES = {
    "dx_name": "diagnosis_name",
    "icd10_code": "dianosis_code",  # sic — reference output spelling
    "poa": "pta",
}

SELECT_COLS = ["C19_PATIENT_ID", "C19_HAR_ID", "dx_name", "icd10_code", "poa"]


def build_admission_diagnosis(dx_all: DataFrame) -> DataFrame:
    """rclif_admission_diagnosis: project (P1) + rename (P3); terminal
    ordering belongs to the sink (multi-key sort O1 preserved only within
    partitions at scale)."""
    out = core.project(dx_all, SELECT_COLS)
    for src, dst in RENAMES.items():
        out = core.rename(out, {src: dst})
    return out


def sorted_for_publication(df: DataFrame) -> DataFrame:
    """The reference's ``arrange(C19_PATIENT_ID, C19_HAR_ID)``
    (`RCLIF_admission_diagnosis.Rmd:35`) for bounded/test outputs; the
    100 TB sink path uses io.write_table(sort_within_partitions=...)."""
    return core.sort(df, ["C19_PATIENT_ID", "C19_HAR_ID"])
