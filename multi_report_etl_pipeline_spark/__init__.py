"""multi_report_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query semantics of
``jarpaivan-wq/multi-report-etl-pipeline`` (reference at /root/reference,
read-only): a staging layer of cleansing/dedup views plus a reporting layer
of left-join report queries, extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing, streaming analytics).

Everything is declared with the DataFrame / Spark SQL API so Catalyst owns
optimization (predicate pushdown, column pruning, join planning, AQE).
"""

__version__ = "0.1.0"

from multi_report_etl_pipeline_spark.session import get_spark  # noqa: F401
