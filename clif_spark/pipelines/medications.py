"""Medications pipelines (`code/RCLIF_medications.Rmd`, SURVEY §3.2):
medication_orders + continuous/intermittent administrations.

Stages (reference line → operator):
  :40-49   med_out projection/rename          -> core.project/rename
  :53-63   orders ⟕ med_out on 5-col key      -> core.composite_join (J2)
  :98-100  distinct med names                 -> A6 (the semi-join rewrite)
  :111-125 fuzzy vocab match + unnest         -> core.fuzzy_vocab_match (J6)
  :127-128 CONTINUOUS frequency filter        -> P9
  :133-148 epoch fmt, unit derive (strip      -> scalars.epoch_to_ts /
           digits), dose extract, rate-unit      strip_digits / extract_dose /
           filter, ⟕ med_out, semi join          default_if_blank; J2, J4
  :152-159 attach med_category, sort, select  -> core.vocab_join (J1)
  :176-192 intermittent: negated filters      -> same scaffold, ~cond
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clif_spark.functions import scalars as S
from clif_spark.operators import core, reshape

#: 5-column composite enrichment key (`code/RCLIF_medications.Rmd:62-63`).
ORDER_KEY = ["C19_PATIENT_ID", "C19_HAR_ID", "medication_id",
             "order_start_time", "medication_name"]

#: Rate-unit pattern marking continuous infusions (`:141`).
RATE_UNIT_RE = r"(?i)(min|hr|day)"


def build_medication_orders(orders: DataFrame, med_out: DataFrame) -> DataFrame:
    """medication_orders: raw orders enriched with route via the composite
    key join (`:53-69`)."""
    out = core.project(med_out, [
        F.col("C19_PATIENT_ID"), F.col("C19_HAR_ID"),
        F.col("MED_ID").alias("medication_id"),
        F.col("ORDER_START_TIME").alias("order_start_time"),
        F.col("MEDICATION").alias("medication_name"),
        F.col("MED_ROUTE").alias("med_route"),
    ])
    enriched = core.composite_join(orders, out, ORDER_KEY, how="left")
    return (enriched.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                S.epoch_to_ts(F.col("order_start_time")).alias("order_start_dttm"),
                S.epoch_to_ts(F.col("order_end_time")).alias("order_end_dttm"),
                F.col("medication_name").alias("med_name"),
                "med_route",
                F.col("dose").alias("med_dose"),
                F.col("dose_units").alias("med_dose_units"),
                F.col("order_med_freq").alias("med_frequency"))
            .orderBy("encounter_id", "order_start_dttm", "med_name"))


def match_med_vocab(admins: DataFrame, vocab: DataFrame) -> DataFrame:
    """The J6 semi-join rewrite (`:98-125`): fuzzy-match *distinct* med names
    against the vocab (broadcast regex join), returning
    (medication_name, med_name, med_category) mappings."""
    names = reshape.distinct_rows(admins, ["medication_name"])
    return core.fuzzy_vocab_match(names, "medication_name", vocab, "med_name")


def _admin_common(admins: DataFrame, med_out: DataFrame) -> DataFrame:
    """Shared admin scaffold (`:133-148`): timestamps, unit derivation from
    the dose string, numeric dose extraction, route enrichment."""
    derived_unit = S.strip_digits(F.col("take_med_dose"))
    out_routes = core.project(med_out, [
        F.col("C19_PATIENT_ID"), F.col("C19_HAR_ID"),
        F.col("MED_ID").alias("medication_id"),
        F.col("ORDER_START_TIME").alias("order_start_time"),
        F.col("MEDICATION").alias("medication_name"),
        F.col("MED_ROUTE").alias("med_route"),
    ])
    return (admins
            .withColumn("admin_dttm", S.epoch_to_ts(F.col("take_med_dttm")))
            .withColumn("med_dose_unit",
                        S.default_if_blank(F.col("dose_units"), derived_unit))
            .withColumn("med_dose", S.extract_dose(F.col("take_med_dose")))
            .join(out_routes, ORDER_KEY, "left"))


def build_admin_continuous(admins: DataFrame, med_out: DataFrame,
                           vocab: DataFrame) -> DataFrame:
    """Continuous administrations (`:127-170`): CONTINUOUS frequency, rate
    units, vocab-matched meds only, category attached."""
    matches = match_med_vocab(admins, vocab)
    base = _admin_common(admins, med_out)
    cont = base.filter(
        F.col("order_med_freq").rlike("(?i)CONTINUOUS")
        & F.col("med_dose_unit").rlike(RATE_UNIT_RE))
    cont = core.semi_join(cont, matches.select("medication_name"),
                          "medication_name")
    cont = core.vocab_join(
        cont, matches.select("medication_name", "med_category")
                     .dropDuplicates(["medication_name"]),
        on="medication_name", how="left")
    return _admin_select(cont)


def build_admin_intermittent(admins: DataFrame, med_out: DataFrame,
                             vocab: DataFrame) -> DataFrame:
    """Intermittent administrations (`:176-192`): the same scaffold with both
    filters negated (NOT rate-unit AND NOT CONTINUOUS)."""
    matches = match_med_vocab(admins, vocab)
    base = _admin_common(admins, med_out)
    inter = base.filter(
        ~F.col("order_med_freq").rlike("(?i)CONTINUOUS")
        & ~F.col("med_dose_unit").rlike(RATE_UNIT_RE))
    inter = core.semi_join(inter, matches.select("medication_name"),
                           "medication_name")
    inter = core.vocab_join(
        inter, matches.select("medication_name", "med_category")
                      .dropDuplicates(["medication_name"]),
        on="medication_name", how="left")
    return _admin_select(inter)


def _admin_select(df: DataFrame) -> DataFrame:
    return (df.select(
                F.col("C19_PATIENT_ID").alias("patient_id"),
                F.col("C19_HAR_ID").alias("encounter_id"),
                "admin_dttm",
                F.col("medication_name").alias("med_name"),
                "med_route", "med_category", "med_dose", "med_dose_unit")
              .orderBy("encounter_id", "admin_dttm", "med_name"))
