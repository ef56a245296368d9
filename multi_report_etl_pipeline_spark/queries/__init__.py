"""Query registry.

Each submodule exposes ``QUERIES: dict[str, QuerySpec]``. ``all_queries()``
merges them; ``__spark_entry__`` (driver contract) is a thin shim over it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A declared query: Spark implementation + optional DuckDB oracle.

    ``oracle`` is None for genuinely non-SQL-expressible ops (streaming,
    LSH-approximate); the driver then records a weaker rows-only check and
    tests/ cover those with threshold-based assertions instead.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def all_queries() -> dict[str, QuerySpec]:
    from multi_report_etl_pipeline_spark.queries import (  # noqa: PLC0415
        events,
        llm_ops,
        reference,
        tpch,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (reference, tpch, llm_ops, events):
        merged.update(module.QUERIES)
    return merged
