"""SparkSession factory with scale-aware defaults.

The reference (01_staging_layer.sql:13-14) relies on B-tree indexes for its
join performance; on Spark the equivalent physical-design levers are AQE
(runtime join re-planning + skew handling), broadcast joins for small
deduplicated sides, and a shuffle-partition count sized to the cluster.
These defaults target local[32] for tests but are the same knobs a
1000-executor cluster run would set (with bigger numbers).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "multi-report-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Notes on the non-default choices:

    - ``spark.sql.session.timeZone=UTC``: date/timestamp formatting must be
      deterministic and match the DuckDB oracle regardless of host TZ.
    - AQE on (+ skew join): replaces the reference's static index-based
      physical design with runtime re-planning; at 100 TB hot account_ids
      are split by the skew-join rule instead of stalling a task.
    - ``spark.sql.shuffle.partitions``: sized to cores locally; on a real
      cluster this should be ~2-3x total executor cores, and AQE's
      coalescePartitions trims empty ones after the fact.
    - Arrow enabled: every pandas_udf / mapInPandas operator (similarity,
      multimodal decode) moves batches via Arrow, not pickled rows.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns type, so
        # read as long and convert (io.read_table) — truncation to micros
        # matches DuckDB's ns->us cast.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Split parquet scans finer than the 128m default: the local
        # fixtures are single files, and a task only reads the row
        # groups whose MIDPOINT falls in its byte range — sf1 events
        # (12.3 MB, 9 row groups) was one task at 16m, serializing
        # every scan-side projection/partial-agg. 2m was measured best
        # across the scan-agg family at sf1 (windowed_counts 0.46 s ->
        # 0.26 s, top_customers 0.68 -> 0.53, q1 0.50 -> 0.40; 1m adds
        # only empty ranges between row-group midpoints). On a real
        # cluster raise this back toward 128m-256m — scan task count
        # there is file-count-dominated and 2m would over-schedule.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
        # local mode runs every executor thread inside the driver JVM,
        # whose default heap (1g) OOMs once inputs pass ~sf0.5; on a real
        # cluster this knob is per-executor memory instead. Only takes
        # effect at JVM launch — set the env var before first getOrCreate.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
