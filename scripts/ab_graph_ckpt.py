"""A/B: localCheckpoint of the near-dup edge frame in graph.pagerank /
graph.triangle_stats vs re-evaluating the pair lineage per walk
(round-5 verdict item #1). Interleaved min-of-3, noop count() sink,
one session — the BASELINE.md A/B convention.

    python scripts/ab_graph_ckpt.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf1")


def main() -> None:
    from pyspark.sql import SparkSession

    from multi_report_etl_pipeline_spark.io import fan_out, read_table
    from multi_report_etl_pipeline_spark.operators import dedup, graph
    from multi_report_etl_pipeline_spark.queries.llm_ops import _PAGERANK_ITERS

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("ab_graph_ckpt")
        .getOrCreate()
    )
    docs = fan_out(read_table(spark, SF_DIR, "documents"), spark, cols=("doc_id",))

    def pairs():
        return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)

    variants = {
        "pagerank ckpt=False": lambda: graph.pagerank(
            pairs(), iters=_PAGERANK_ITERS, checkpoint_edges=False
        ),
        "pagerank ckpt=True": lambda: graph.pagerank(
            pairs(), iters=_PAGERANK_ITERS, checkpoint_edges=True
        ),
        "triangle ckpt=False": lambda: graph.triangle_stats(
            pairs(), checkpoint_pairs=False
        ),
        "triangle ckpt=True": lambda: graph.triangle_stats(
            pairs(), checkpoint_pairs=True
        ),
    }
    best: dict[str, float] = {}
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.monotonic()
            n = fn().count()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{rep} {name}: {dt:.2f} s ({n} rows)", flush=True)
    print("---- min-of-3 ----")
    for name, dt in best.items():
        print(f"{name}: {dt:.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
