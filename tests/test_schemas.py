"""The 19-table RCLIF StructType registry (SURVEY §1.2; ERD
figures/RCLIF_ERD_09142023.pdf) — completeness and type spot-checks."""

from __future__ import annotations

from pyspark.sql import types as T

from clif_spark.schemas import RAW_SCHEMAS, RCLIF_SCHEMAS

ERD_TABLES = {
    "patient_encounters", "patient_demographics", "limited_identifiers",
    "encounter_demographics_dispo", "admission_diagnosis", "vitals",
    "scores", "labs", "microbiology", "respiratory_support",
    "ventilation_settings", "ecmo_mcs", "adt", "medication_orders",
    "medication_admin_continuous", "medication_admin_intermittent",
    "intake_output", "dialysis", "procedures",
}


def test_registry_covers_all_19_erd_tables():
    assert set(RCLIF_SCHEMAS) == ERD_TABLES
    assert len(RCLIF_SCHEMAS) == 19


def test_every_table_is_keyed_to_the_patient_spine():
    # Every table except the patient-grain demographics carries both spine
    # keys; demographics is patient-grain (ERD).
    for name, schema in RCLIF_SCHEMAS.items():
        cols = schema.fieldNames()
        assert "patient_id" in cols, name
        if name != "patient_demographics":
            assert "encounter_id" in cols, name


def test_type_spot_checks():
    def typ(table, col):
        return dict(zip(RCLIF_SCHEMAS[table].fieldNames(),
                        [f.dataType for f in RCLIF_SCHEMAS[table].fields]))[col]

    assert typ("microbiology", "collect_time") == T.TimestampType()
    assert typ("ventilation_settings", "set_volume") == T.DoubleType()
    assert typ("ecmo_mcs", "flow") == T.DoubleType()
    assert typ("intake_output", "amount") == T.DoubleType()
    assert typ("procedures", "procedure_name") == T.StringType()
    assert typ("encounter_demographics_dispo", "age_at_admission") \
        == T.LongType()
    # Datetimes are real timestamps internally (SURVEY §1.5) even though
    # the reference publishes formatted strings.
    assert typ("vitals", "recorded_time") == T.TimestampType()


def test_raw_extract_schemas_present():
    # The ingest side (FIXTURES.md §A): every C19_* extract the reference
    # pipelines read has a declared schema too.
    assert {"c19_flow_lds", "c19_lab_lds", "c19_rx_admin_lds",
            "c19_adt_lds", "c19_enc_lds"} <= set(RAW_SCHEMAS)
