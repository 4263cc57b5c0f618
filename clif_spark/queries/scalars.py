"""Scalar-function queries (SURVEY §2.8 F1-F13), each mirroring the R idiom
it re-implements and its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clif_spark import io
from clif_spark.functions import scalars as S
from clif_spark.queries import dsum, query, sql_dsum, us


@query(
    "f1_f2_classify_regex",
    oracle=f"""
    WITH classified AS (
      SELECT CASE
               WHEN regexp_matches(event_type, '(?i)^(sign|err)') THEN 'system'
               WHEN value >= 100 THEN 'large'
               WHEN value >= 10 THEN 'medium'
               ELSE 'small'
             END AS category,
             value
      FROM events
    )
    SELECT category, COUNT(*) AS n, {sql_dsum('value')} AS total_value
    FROM classified GROUP BY category
    """,
)
def f1_f2_classify_regex(spark, sf_dir):
    """F1 case_when first-match-wins classification + F2 regex detect
    (O2-device classify, `code/RCLIF_vitals.Rmd:125-135`; `grepl` families,
    `code/RCLIF_adt.Rmd:35-86`)."""
    ev = io.load_table(spark, sf_dir, "events")
    category = S.classify(
        [
            (F.col("event_type").rlike(r"(?i)^(sign|err)"), "system"),
            (F.col("value") >= 100, "large"),
            (F.col("value") >= 10, "medium"),
        ],
        default="small",
    )
    return (ev.select(category.alias("category"), "value")
              .groupBy("category")
              .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")))


@query(
    "f3_f4_f5_dose_parse",
    oracle=r"""
    WITH doses AS (
      SELECT event_id,
             CAST(value AS VARCHAR) || ' mg/' || event_type AS dose_str
      FROM events
    )
    SELECT event_id,
           trim(regexp_replace(dose_str, '[0-9.]+', '', 'g')) AS unit,
           TRY_CAST(array_to_string(
             regexp_extract_all(dose_str,
               '([-+]?[0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?)', 1), '')
             AS DOUBLE) AS dose,
           array_to_string(list_slice(str_split(dose_str, ' '), 1, 2), ' ')
             AS first_two
    FROM doses
    """,
)
def f3_f4_f5_dose_parse(spark, sf_dir):
    """F3 strip-digits unit derivation + F4 numeric-token extract-all + F5
    first-two-words — the med-dose surgery (`code/RCLIF_medications.Rmd:138-140`)
    run over synthesized '<value> mg/<type>' dose strings."""
    ev = io.load_table(spark, sf_dir, "events")
    doses = ev.select(
        "event_id",
        F.concat(F.col("value").cast("string"), F.lit(" mg/"),
                 F.col("event_type")).alias("dose_str"))
    return doses.select(
        "event_id",
        S.strip_digits(F.col("dose_str")).alias("unit"),
        S.extract_dose(F.col("dose_str")).alias("dose"),
        S.first_n_words(F.col("dose_str"), 2).alias("first_two"))


@query(
    "f6_coalesce_fallback",
    oracle=r"""
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v,
             TRY_CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS DOUBLE) AS k
      FROM events
    )
    SELECT event_id, ROUND(COALESCE(v, k, 0.0), 2) AS filled,
           CASE WHEN COALESCE(v, k, 0.0) > 100 THEN 'high'
                WHEN COALESCE(v, k, 0.0) > 50 THEN 'mid'
                ELSE 'low' END AS band
    FROM src
    """,
)
def f6_coalesce_fallback(spark, sf_dir):
    """F6 coalesce fallback chain (FiO2 3-way fallback,
    `code/RCLIF_vitals.Rmd:154-157`; blank-unit default,
    `code/RCLIF_medications.Rmd:138`)."""
    ev = io.load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "click", None).otherwise(F.col("value"))
    k = F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).try_cast("double")
    filled = F.coalesce(v, k, F.lit(0.0))
    return ev.select(
        "event_id",
        F.round(filled, 2).alias("filled"),
        S.classify([(filled > 100, "high"), (filled > 50, "mid")],
                   default="low").alias("band"))


@query(
    "f7_f10_time_functions",
    oracle=f"""
    -- epoch_s floors toward -inf on both engines (DuckDB integer //
    -- truncates toward zero, so the floor is spelled out; same convention
    -- as w11_range_time_frame).
    SELECT event_id,
           CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS epoch_s,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           strftime(ts, '%Y-%m-%d') AS day_str,
           CAST(year(ts) AS BIGINT) AS yr,
           CAST(month(ts) AS BIGINT) AS mo,
           epoch_us(ts - INTERVAL 1 HOUR) AS minus_1h_us,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
             AS days_since
    FROM events
    """,
)
def f7_f10_time_functions(spark, sf_dir):
    """F7 epoch<->timestamp + format (`code/RCLIF_vitals.Rmd:60`), F8 parse,
    F9 date parts (`code/RCLIF_dialysis.Rmd:164-167`), F10 interval
    arithmetic (`ts - hours(1)`, `code/RCLIF_dialysis.Rmd:59`)."""
    ev = io.load_table(spark, sf_dir, "events")
    usc = us("ts")
    epoch_s = ((usc - F.pmod(usc, F.lit(1_000_000))) / F.lit(1_000_000)) \
        .cast("long")
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        S.ts_to_rclif_string(F.col("ts")).alias("ts_str"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.year("ts").cast("long").alias("yr"),
        F.month("ts").cast("long").alias("mo"),
        us(F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("minus_1h_us"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
         .cast("long").alias("days_since"))


@query(
    "f8_parse_roundtrip",
    oracle="""
    SELECT event_id,
           epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                             '%Y-%m-%d %H:%M:%S')) AS reparsed_us
    FROM events
    """,
)
def f8_parse_roundtrip(spark, sf_dir):
    """F8 string->timestamp parse (`ymd_hms`, `code/RCLIF_medications.Rmd:143`):
    format to the RCLIF string form (second precision) and re-parse — the
    fidelity boundary the reference's string-typed datetimes live behind."""
    ev = io.load_table(spark, sf_dir, "events")
    reparsed = S.parse_ts(S.ts_to_rclif_string(F.col("ts")))
    return ev.select("event_id", us(reparsed).alias("reparsed_us"))


@query(
    "f11_cast_clamp",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           least(greatest(l_quantity, 5.0), 45.0) AS qty_clamped,
           COALESCE(TRY_CAST(l_returnflag AS DOUBLE), -1.0) AS junk_cast
    FROM lineitem
    """,
)
def f11_cast_clamp(spark, sf_dir):
    """F11 numeric cast with junk->NULL fidelity (`as.numeric`,
    `code/RCLIF_vitals.Rmd:213-216`) + clamp (lpm cleaning `:146-148`)."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        S.clamp(F.col("l_quantity"), lo=5.0, hi=45.0).alias("qty_clamped"),
        F.coalesce(F.col("l_returnflag").try_cast("double"), F.lit(-1.0))
         .alias("junk_cast"))


@query(
    "f12_hash_pseudonymize",
    oracle="""
    SELECT c_custkey, sha256(c_name) AS sha, md5(c_name) AS md5_hash
    FROM customer
    """,
)
def f12_hash_pseudonymize(spark, sf_dir):
    """F12 pseudonymization hash (`digest`, `code/RCLIF_disposition.Rmd:89-90`):
    sha2-256 (engine default) + md5 (R digest's default), both bit-identical
    across engines."""
    c = io.load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        S.hash_id(F.col("c_name")).alias("sha"),
        F.md5(F.col("c_name")).alias("md5_hash"))


@query(
    "f14_from_json_typed",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def f14_from_json_typed(spark, sf_dir):
    """Schema-driven JSON parsing (engine surface the reference lacks, the
    semi-structured twin of P11's regex extraction): ``from_json`` with an
    explicit schema turns the props payload into a typed struct inside
    codegen — the scalable path for JSON columns (one parse per row, typed
    downstream; regex re-extracts per field). Malformed rows yield NULL
    fields, the same junk->NULL policy as F11 casts."""
    ev = io.load_table(spark, sf_dir, "events")
    j = ev.withColumn("j", F.from_json("props", "k BIGINT"))
    return (j.filter(F.col("j.k").isNotNull())
             .groupBy((F.col("j.k") % 10).alias("k_bucket"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("event_id").cast("bigint").alias("first_event")))


@query(
    "f15_minmax_normalize",
    oracle="""
    WITH b AS (
      SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN b.hi > b.lo THEN (e.value - b.lo) / (b.hi - b.lo)
           END AS v_norm
    FROM events e JOIN b USING (event_type)
    WHERE e.value IS NOT NULL
    """,
)
def f15_minmax_normalize(spark, sf_dir):
    """Per-group min-max feature scaling — the normalization pass a model
    pipeline applies before training: group bounds in a dimension-sized
    aggregate broadcast back over the scan, then one IEEE-exact
    (v - lo) / (hi - lo) per row (identical operand order on both
    engines, so bit-comparable); degenerate constant groups normalize to
    NULL, not a fabricated midpoint."""
    ev = io.load_table(spark, sf_dir, "events")
    src = ev.filter(F.col("value").isNotNull())
    bounds = (src.groupBy("event_type")
                 .agg(F.min("value").alias("lo"), F.max("value").alias("hi")))
    return (src.join(F.broadcast(bounds), "event_type")
               .select("event_id", "event_type",
                       F.when(F.col("hi") > F.col("lo"),
                              (F.col("value") - F.col("lo"))
                              / (F.col("hi") - F.col("lo")))
                       .alias("v_norm")))


@query(
    "f16_accent_fold",
    oracle=f"""
    -- The ASCII corpus gets accents PLANTED (a->á etc.) then folded back:
    -- a full round trip through both engines' codepoint translate.
    WITH accented AS (
      SELECT doc_id, translate(text, 'aeion', 'áéíóñ') AS t
      FROM documents
    )
    SELECT doc_id,
           translate(t, '{S.ACCENTED}', '{S.FOLDED}') AS folded,
           CAST(length(t) - length(translate(t, '{S.ACCENTED}', ''))
                AS BIGINT) AS n_accented
    FROM accented
    """,
)
def f16_accent_fold(spark, sf_dir):
    """F16 accent folding (match-key normalization for vocab joins and
    dedup): accents planted on the ASCII corpus, folded back with the
    engine's codepoint translate, plus the accented-char count via the
    delete-form of translate (a shorter 'to' string deletes — same rule
    both engines). Pure narrow codegen expressions, zero shuffle."""
    d = io.load_table(spark, sf_dir, "documents")
    accented = d.select(
        "doc_id", F.translate("text", "aeion", "áéíóñ").alias("t"))
    return accented.select(
        "doc_id",
        S.fold_accents(F.col("t")).alias("folded"),
        (F.length("t") - F.length(F.translate("t", S.ACCENTED, "")))
        .cast("long").alias("n_accented"))
