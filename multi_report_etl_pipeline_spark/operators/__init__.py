"""Extension operators beyond the reference surface (SURVEY.md §2.9):
deduplication (exact / n-gram Jaccard / MinHash / SimHash / connected
components), embedding similarity search (brute-force, random-projection
LSH, IVF), temporal joins (as-of, time-range), text analysis, and
multimodal feature extraction."""

from multi_report_etl_pipeline_spark.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    similarity,
    skew,
    text,
)
