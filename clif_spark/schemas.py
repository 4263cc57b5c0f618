"""Explicit StructType registry (SURVEY §1.2, §1.4).

The reference infers schemas from text (`code/RCLIF_vitals.Rmd:23` big_fread1;
`rclif_development/notebooks/RCLIF_vitals.ipynb` inferSchema=True) and enforces
the target shape only by a final select/rename. At 100 TB inference is an extra
full pass and a correctness hazard, so the engine declares every schema:

- RCLIF canonical tables (the 19-table ERD, `figures/RCLIF_ERD_09142023.pdf`);
  datetimes are real TimestampType internally (the reference stores formatted
  strings — we format only at the sink, SURVEY §1.5).
- Raw C19_* extract schemas the pipelines consume (FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, d, True) for n, d in fields])


S, D, TS, I, B = (T.StringType(), T.DoubleType(), T.TimestampType(),
                  T.LongType(), T.BooleanType())

#: Canonical RCLIF tables (ERD + pipeline outputs; SURVEY §1.2 table).
RCLIF_SCHEMAS: dict[str, T.StructType] = {
    "patient_encounters": _struct(("patient_id", S), ("encounter_id", S)),
    "patient_demographics": _struct(
        ("patient_id", S), ("race", S), ("ethnicity", S), ("sex", S)),
    "limited_identifiers": _struct(
        ("patient_id", S), ("encounter_id", S), ("admission_dttm", TS),
        ("discharge_dttm", TS), ("birth_date", TS), ("zip_code", S)),
    "encounter_demographics_dispo": _struct(
        ("patient_id", S), ("encounter_id", S), ("age_at_admission", I),
        ("disposition", S)),
    "admission_diagnosis": _struct(
        ("patient_id", S), ("encounter_id", S), ("diagnosis_name", S),
        ("diagnosis_code", S), ("pta", I)),
    # Long/EAV event tables (`code/RCLIF_vitals.Rmd:55-61`).
    "vitals": _struct(
        ("patient_id", S), ("encounter_id", S), ("recorded_time", TS),
        ("vital_name", S), ("vital_value", D), ("meas_site_name", S)),
    "scores": _struct(
        ("patient_id", S), ("encounter_id", S), ("score_time", TS),
        ("score_name", S), ("score_value", S)),
    "labs": _struct(
        ("patient_id", S), ("encounter_id", S), ("lab_order_time", TS),
        ("lab_result_time", TS), ("lab_group", S), ("lab_name", S),
        ("lab_value", S), ("reference_unit", S), ("lab_type_name", S)),
    # Wide pivoted table (`code/RCLIF_vitals.Rmd:97-166`).
    "respiratory_support": _struct(
        ("patient_id", S), ("encounter_id", S), ("recorded_time", TS),
        ("device_name", S), ("mode_name", S), ("mode_category", S),
        ("set_volume", D), ("pressure_support", D), ("set_resp_rate", D),
        ("lpm", D), ("fio2", D), ("peep", D)),
    "adt": _struct(
        ("patient_id", S), ("encounter_id", S), ("start_time", TS),
        ("end_time", TS), ("adt_department_name", S), ("dept_name", S),
        ("adt_room_nm_wid", S), ("room_name", S)),
    "medication_orders": _struct(
        ("patient_id", S), ("encounter_id", S), ("order_start_dttm", TS),
        ("order_end_dttm", TS), ("med_name", S), ("med_route", S),
        ("med_dose", S), ("med_dose_units", S), ("med_frequency", S)),
    "medication_admin_continuous": _struct(
        ("patient_id", S), ("encounter_id", S), ("admin_dttm", TS),
        ("med_name", S), ("med_route", S), ("med_category", S),
        ("med_dose", D), ("med_dose_unit", S)),
    "medication_admin_intermittent": _struct(
        ("patient_id", S), ("encounter_id", S), ("admin_dttm", TS),
        ("med_name", S), ("med_route", S), ("med_category", S),
        ("med_dose", D), ("med_dose_unit", S)),
    # Interval/episode table (`code/RCLIF_dialysis.Rmd:47-157`).
    "dialysis": _struct(
        ("patient_id", S), ("encounter_id", S), ("dialysis_type", S),
        ("start_time", TS), ("stop_time", TS),
        ("dialysate_flow_amount", D), ("ultrafiltration_amount", D)),
    # --- ERD-only tables (figures/RCLIF_ERD_09142023.pdf; SURVEY §1.2 rows
    # 9, 11, 12, 17, 19): no reference pipeline builds them, but the data
    # model declares them, so the registry carries their StructTypes —
    # a consumer switching engines can create/validate all 19 tables.
    "microbiology": _struct(
        ("patient_id", S), ("encounter_id", S), ("collect_time", TS),
        ("fluid_name", S), ("organism_name", S)),
    "ventilation_settings": _struct(
        ("patient_id", S), ("encounter_id", S), ("start_time", TS),
        ("end_time", TS), ("mode_name", S), ("set_volume", D),
        ("pressure_support", D)),
    "ecmo_mcs": _struct(
        ("patient_id", S), ("encounter_id", S), ("start_time", TS),
        ("end_time", TS), ("device_name", S), ("sweep", D), ("flow", D),
        ("device_work_metric", S), ("device_work_rate", D)),
    "intake_output": _struct(
        ("patient_id", S), ("encounter_id", S), ("time", TS),
        ("fluid_name", S), ("amount", D), ("in_out_flag", S)),
    "procedures": _struct(
        ("patient_id", S), ("encounter_id", S), ("start_time", TS),
        ("procedure_name", S), ("diagnosis", S)),
}

#: Raw EHR extract schemas (FIXTURES.md §A; column usage cited per pipeline).
RAW_SCHEMAS: dict[str, T.StructType] = {
    # A1 flowsheet (`code/RCLIF_vitals.Rmd:23-24`): times are epoch seconds.
    "c19_flow_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("recorded_time", I),
        ("flo_meas_name", S), ("meas_value", S), ("meas_site_name", S)),
    # A2 dialysis flowsheet (`code/RCLIF_dialysis.Rmd:32`).
    "c19_flow_io_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("recorded_time", I),
        ("flo_group_name", S), ("flo_meas_name", S), ("meas_value", S)),
    # A3 labs (`code/RCLIF_labs.Rmd:25`).
    "c19_lab_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("order_time", I),
        ("result_time", I), ("component_id", I), ("component_name", S),
        ("ord_value", S), ("proc_name", S), ("reference_value", S),
        ("reference_unit", S), ("lab_type_name", S)),
    # A4 med administrations (`code/RCLIF_medications.Rmd:25`).
    "c19_rx_admin_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("medication_id", S),
        ("medication_name", S), ("order_med_freq", S), ("order_start_time", I),
        ("order_end_time", I), ("take_med_dttm", I), ("take_med_dose", S),
        ("dose_units", S)),
    # A5 med orders (`code/RCLIF_medications.Rmd:26`).
    "c19_rx_order_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("medication_id", S),
        ("order_start_time", I), ("order_end_time", I), ("medication_name", S),
        ("order_med_freq", S), ("dose", S), ("dose_units", S)),
    # A6 order detail (`code/RCLIF_medications.Rmd:27,40-49`).
    "c19_rx_out_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("MED_ID", S),
        ("ORDER_START_TIME", I), ("ORDER_END_TIME", I), ("MEDICATION", S),
        ("MED_ROUTE", S), ("QUANTITY", S)),
    # A7 ADT (`code/RCLIF_adt.Rmd:22,31-92`): in_time is a datetime string,
    # out_time epoch — the reference's own inconsistency, preserved here.
    "c19_adt_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("in_time", S),
        ("out_time", I), ("adt_department_name", S), ("adt_room_nm_wid", S)),
    # A8-A10 demographics/encounter/disposition (`code/RCLIF_demographics.Rmd:25-28`).
    "c19_patient_demo_lds": _struct(
        ("C19_PATIENT_ID", S), ("birth_date", I), ("sex", S), ("race", S),
        ("ethnic", S)),
    "c19_enc_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("record_type", S),
        ("adm_date", I), ("disc_date", I)),
    "c19_enc_xtra_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("record_type", S),
        ("discharge_dispo", S)),
    "c19_patient_zip_code_lds": _struct(("C19_PATIENT_ID", S), ("zip_code", S)),
    # A12 admission diagnosis (`code/RCLIF_admission_diagnosis.Rmd:23,29-34`).
    "c19_dx_lds": _struct(
        ("C19_PATIENT_ID", S), ("C19_HAR_ID", S), ("dx_name", S),
        ("icd10_code", S), ("poa", S)),
}
