from clif_spark.operators import core, profile, reshape, windows  # noqa: F401
