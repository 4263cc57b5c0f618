from clif_spark.functions import scalars, text  # noqa: F401
