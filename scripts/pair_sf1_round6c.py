"""sf1 Spark-vs-DuckDB pairing for the audio-fingerprint additions
(acoustic hash + audio near-dup), same sitting, min-of-3 Spark noop
sinks vs median-of-3 DuckDB fetchall after one warm run each — the
BASELINE.md pairing-table convention.

    python3 scripts/pair_sf1_round6c.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf1")

BATCH = [
    "docs_audio_fingerprint",
    "docs_audio_near_dup",
]


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.io import TABLES
    from multi_report_etl_pipeline_spark.session import get_spark

    reg = entry_mod.queries()
    osql = entry_mod.oracle_sql()

    spark = get_spark(app_name="pair_sf1_round6c")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    spark_t: dict[str, float] = {}
    for name in BATCH:
        force(reg[name](spark, SF_DIR))  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(reg[name](spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        spark_t[name] = round(min(samples), 3)
        print(f"spark  {name}: {spark_t[name]:.2f} s", flush=True)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    duck_t: dict[str, float] = {}
    for name in BATCH:
        sql = osql[name]
        con.execute(sql).fetchall()  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        duck_t[name] = round(statistics.median(samples), 3)
        print(f"duckdb {name}: {duck_t[name]:.2f} s", flush=True)

    print(json.dumps({"spark": spark_t, "duckdb": duck_t}))
    print(f"\n{'query':30s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name in BATCH:
        r = spark_t[name] / duck_t[name] if duck_t[name] else float("inf")
        print(f"{name:30s} {spark_t[name]:8.2f} {duck_t[name]:8.2f} {r:7.2f}")
    print(
        f"{'TOTAL':30s} {sum(spark_t.values()):8.2f} "
        f"{sum(duck_t.values()):8.2f} "
        f"{sum(spark_t.values()) / sum(duck_t.values()):7.2f}"
    )


if __name__ == "__main__":
    main()
