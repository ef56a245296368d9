"""A/B: F.window("ts", "1 hour") vs date_trunc("hour", ts) as the
tumbling-window group key in events_windowed_counts (sf100ev, 100M
rows). For an epoch-aligned tumbling window the two are value-identical
(window.start == date_trunc), but F.window compiles to a
precisetimestampconversion CASE struct per row while date_trunc is one
intrinsic — the projection is the only per-row work besides the partial
agg, so the expression cost is visible at 100M rows.

Interleaved ABBA min-of-3, one session, noop count sinks.

    python scripts/ab_window_expr.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf100ev")


def main() -> None:
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.queries.events import (
        TS_FMT_SPARK,
        sum_value_double,
    )
    from multi_report_etl_pipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="ab_window_expr")
    spark.sparkContext.setLogLevel("ERROR")

    def form_window():
        ev = read_table(spark, SF_DIR, "events")
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), sum_value_double().alias("sum_value"))
            .select(
                F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
                "event_type", "cnt", "sum_value",
            )
        )

    def form_trunc():
        ev = read_table(spark, SF_DIR, "events")
        return (
            ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), sum_value_double().alias("sum_value"))
            .select(
                F.date_format("h", TS_FMT_SPARK).alias("window_start"),
                "event_type", "cnt", "sum_value",
            )
        )

    arms = {"F.window": form_window, "date_trunc": form_trunc}
    # value identity first
    a = sorted(map(tuple, form_window().collect()))
    b = sorted(map(tuple, form_trunc().collect()))
    print("value-identical:", a == b, flush=True)

    best: dict[str, float] = {}
    for rep in range(3):
        order = list(arms) if rep % 2 == 0 else list(reversed(list(arms)))
        for name in order:
            t0 = time.perf_counter()
            arms[name]().count()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{rep} {name}: {dt:.2f} s", flush=True)
    print("---- min-of-3 ----")
    for name, dt in best.items():
        print(f"{name}: {dt:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
