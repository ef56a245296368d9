"""A/B: minhash_near_dup_pairs hot-band guard (collapse_exact) vs the
raw banded pipeline on a synthetic 10%-duplicate corpus (round-5
verdict item #7). Builds sf documents + planted duplicate groups: 10%
of the corpus is byte-identical copies, concentrated so one document
has a large hot group (the boilerplate-page pathology). Interleaved
min-of-3, noop count() sink, one session — the BASELINE.md convention.

    python scripts/ab_minhash_guard.py [sf_dir] [hot_copies]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "testdata_sf1")
HOT_COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("ab_minhash_guard")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()
    if HOT_COPIES == 0:
        # clean-corpus mode: measure pure guard overhead + the adaptive
        # mode's detection cost with NO planted duplicate mass (the
        # sf0.1/sf1 fixtures are near-duplicate-free: max group 2)
        corpus = base.localCheckpoint(eager=True)
        print(f"corpus: {corpus.count()} docs (clean, no planted dups)", flush=True)
        _run(spark, corpus)
        spark.stop()
        return
    # 10% duplicates: one hot group of HOT_COPIES byte-identical copies
    # + the rest as 10-copy groups, all planted above the id range
    n_dup = n_base // 10
    n_small_groups = max((n_dup - HOT_COPIES) // 10, 0)
    hot_src = base.orderBy("doc_id").limit(1)
    hot = (
        hot_src.crossJoin(
            spark.range(HOT_COPIES).select(F.col("id").alias("i"))
        ).select((F.lit(10_000_000) + F.col("i")).alias("doc_id"), "text")
    )
    small_src = base.orderBy("doc_id").limit(n_small_groups + 1).filter(
        F.col("doc_id") > hot_src.first().doc_id
    )
    small = (
        small_src.crossJoin(spark.range(10).select(F.col("id").alias("i")))
        .select(
            (F.lit(20_000_000) + F.col("doc_id") * 100 + F.col("i")).alias(
                "doc_id"
            ),
            "text",
        )
    )
    corpus = base.unionByName(hot).unionByName(small)
    corpus = corpus.localCheckpoint(eager=True)  # isolate build cost
    print(
        f"corpus: {corpus.count()} docs ({n_base} base, "
        f"{HOT_COPIES} hot copies, {n_small_groups} x10 groups)",
        flush=True,
    )

    _run(spark, corpus)
    spark.stop()


def _run(spark, corpus) -> None:
    from multi_report_etl_pipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    variants = {
        "guard=off": lambda: minhash_near_dup_pairs(corpus, collapse_exact=False),
        "guard=on": lambda: minhash_near_dup_pairs(corpus, collapse_exact=True),
        "guard=adaptive": lambda: minhash_near_dup_pairs(
            corpus, collapse_exact=None
        ),
    }
    best: dict[str, float] = {}
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.monotonic()
            n = fn().count()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, 1e9), dt)
            print(f"rep{rep} {name}: {dt:.2f} s ({n} pairs)", flush=True)
    print("---- min-of-3 ----")
    for name, dt in best.items():
        print(f"{name}: {dt:.2f} s")


if __name__ == "__main__":
    main()
