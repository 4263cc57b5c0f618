"""clif_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kaveriC/CLIF (see SURVEY.md), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) and designed for 100 TB scale.
"""
__version__ = "0.1.0"
