"""Streaming throughput sitting (VERDICT r6 item 8): measure a REAL
multi-micro-batch drain rate for the image-dedup stream — docs/sec and
per-batch latency — instead of the single-batch availableNow drains the
correctness tests use.

Setup: N_DOCS documents from the sf10 corpus are written as N_FILES
parquet files into a landing-zone dir (the crawler-drop shape the
file source models); the stream reads them with maxFilesPerTrigger=1,
so every file is one micro-batch through the SAME pipeline as the
registered streaming_image_dedup query (in-plan PGM construction ->
Arrow decode -> dHash -> complete-mode group state, 8 shuffle
partitions). Per-batch numbers come from the query's progress events.

    python scripts/bench_streaming_throughput.py [n_docs] [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 20
SRC = os.path.join(REPO_ROOT, "testdata_sf10")


def main() -> None:
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.operators import multimodal
    from multi_report_etl_pipeline_spark.queries.llm_ops import _dhash_media
    from multi_report_etl_pipeline_spark.session import get_spark
    from multi_report_etl_pipeline_spark.streaming import DOCUMENTS_SCHEMA

    spark = get_spark(app_name="bench_streaming_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    land = tempfile.mkdtemp(prefix="stream_land_")
    try:
        (
            spark.read.parquet(os.path.join(SRC, "documents.parquet"))
            .limit(N_DOCS)
            .repartition(N_FILES)
            .write.mode("overwrite")
            .parquet(land)
        )
        docs = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(land)
        )
        groups = (
            multimodal.image_dhash(_dhash_media(docs))
            .groupBy("dhash_hi", "dhash_lo")
            .agg(
                F.min("media_id").alias("rep_id"),
                F.count(F.lit(1)).alias("n_docs"),
            )
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t0 = time.monotonic()
        q = (
            groups.writeStream.format("memory")
            .queryName("q_throughput")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        spark.conf.set("spark.sql.shuffle.partitions", prev)

        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        n_groups = spark.table("q_throughput").count()
        rows = sum(p["numInputRows"] for p in progress)
        durs = sorted(p["durationMs"]["triggerExecution"] for p in progress)
        med = durs[len(durs) // 2] if durs else 0
        print(f"docs={rows} files={N_FILES} batches={len(progress)} "
              f"groups={n_groups}")
        print(f"wall={wall:.1f} s  throughput={rows / wall:.0f} docs/s")
        print(f"per-batch latency ms: min={durs[0]} med={med} max={durs[-1]}")
        print("batch rows/s:",
              [round(1000 * p['numInputRows'] /
                     p['durationMs']['triggerExecution'])
               for p in progress])
    finally:
        shutil.rmtree(land, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
