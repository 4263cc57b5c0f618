"""Driver-gated pipeline recompositions (SURVEY §3).

The §3 pipelines are exercised by golden-fixture unit tests
(tests/test_pipelines.py), but until round 5 none faced the driver's DuckDB
differential gate — this module closes that gap for the flagship vitals
lifecycle (§3.1, `code/RCLIF_vitals.Rmd`).

The pipelines consume the reference's EHR extract schema (c19_flow_lds),
which the driver's star-schema testdata does not ship. The gated query
therefore SYNTHESIZES a deterministic flowsheet from the ``events`` table
with closed-form columns (pure integer arithmetic on event_id/user_id — no
float formatting, so both engines render identical strings), runs the REAL
``pipelines.vitals.build_vitals`` composition on it, and the oracle mirrors
the flow synthesis plus the pipeline's relational algebra in DuckDB SQL:
broadcast vocab join + not-null filter, the "120/80" split with R
``separate()`` NA fill, the sbp/dbp unpivot (NULL values retained), the
branch union, junk->NULL double casts, and the epoch->timestamp conversion
(projected back to epoch micros for cross-engine hashing, per the registry's
timestamp policy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clif_spark.pipelines import vitals as vitals_pipeline
from clif_spark.queries import pq, query

#: Closed-form flowsheet synthesis shared verbatim by both engines. Pure
#: integer arithmetic -> identical strings; event_id%5 picks the measurement
#: (0/4 BP, 1 pulse, 2 resp rate, 3 unmapped -> dropped by the vocab gate);
#: every 11th BP lacks the '/' (separate() NA fill path); every 7th pulse is
#: junk (as.numeric -> NULL path).
_FLOW_SYNTH = """
    SELECT CAST(user_id AS STRING) AS C19_PATIENT_ID,
           CAST(user_id * 10 + event_id % 3 AS STRING) AS C19_HAR_ID,
           CAST(1700000000 + event_id * 60 AS BIGINT) AS recorded_time,
           CASE WHEN event_id % 5 IN (0, 4) THEN 'BLOOD PRESSURE'
                WHEN event_id % 5 = 1 THEN 'PULSE'
                WHEN event_id % 5 = 2 THEN 'RESP RATE'
                ELSE 'UNMAPPED THING' END AS flo_meas_name,
           CASE WHEN event_id % 5 IN (0, 4) THEN
                  CASE WHEN event_id % 11 = 0
                       THEN CAST(100 + event_id % 60 AS STRING)
                       ELSE CONCAT(CAST(100 + event_id % 60 AS STRING), '/',
                                   CAST(60 + event_id % 40 AS STRING)) END
                WHEN event_id % 5 = 1 THEN
                  CASE WHEN event_id % 7 = 0 THEN 'junk'
                       ELSE CAST(60 + event_id % 100 AS STRING) END
                ELSE CAST(10 + event_id % 20 AS STRING) END AS meas_value,
           CASE WHEN event_id % 2 = 0 THEN 'arm' ELSE 'leg' END
             AS meas_site_name
    FROM {table}
"""

_VOCAB = [("BLOOD PRESSURE", "blood_pressure"), ("PULSE", "heart_rate"),
          ("RESP RATE", "resp_rate")]


@query(
    "pipeline_vitals",
    oracle=f"""
    WITH flow AS ({_FLOW_SYNTH.format(table='events')}),
    mapped AS (
      SELECT f.*, v.vital_name
      FROM flow f
      JOIN (VALUES {', '.join(repr(t) for t in _VOCAB)})
           AS v(flo_meas_name, vital_name)
        ON f.flo_meas_name = v.flo_meas_name
    ),
    bp AS (
      SELECT C19_PATIENT_ID, C19_HAR_ID, recorded_time, meas_site_name,
             str_split(meas_value, '/')[1] AS sbp,
             str_split(meas_value, '/')[2] AS dbp
      FROM mapped WHERE vital_name = 'blood_pressure'
    ),
    longform AS (
      SELECT C19_PATIENT_ID, C19_HAR_ID, recorded_time, meas_site_name,
             vital_name, meas_value AS vital_value
      FROM mapped WHERE vital_name <> 'blood_pressure'
      UNION ALL
      SELECT C19_PATIENT_ID, C19_HAR_ID, recorded_time, meas_site_name,
             'sbp', sbp FROM bp
      UNION ALL
      SELECT C19_PATIENT_ID, C19_HAR_ID, recorded_time, meas_site_name,
             'dbp', dbp FROM bp
    )
    SELECT C19_PATIENT_ID AS patient_id, C19_HAR_ID AS encounter_id,
           CAST(recorded_time * 1000000 AS BIGINT) AS recorded_us,
           vital_name, TRY_CAST(vital_value AS DOUBLE) AS vital_value,
           meas_site_name
    FROM longform
    """,
)
def pipeline_vitals(spark, sf_dir):
    """§3.1 vitals lifecycle end-to-end through the engine's own operator
    compositions (vocab broadcast join, not-null gate, BP split + unpivot
    with NULL retention, branch union, junk->NULL cast, epoch->ts), gated
    against a DuckDB replica of the same algebra over an identical
    synthesized flowsheet."""
    flow = spark.sql(_FLOW_SYNTH.format(table=pq(sf_dir, "events")))
    vocab = spark.createDataFrame(_VOCAB, ["flo_meas_name", "vital_name"])
    out = vitals_pipeline.build_vitals(flow, vocab)
    return out.select(
        "patient_id", "encounter_id",
        F.unix_micros("recorded_time").alias("recorded_us"),
        "vital_name", "vital_value", "meas_site_name")
