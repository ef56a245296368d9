"""ANN sitting on the CLUSTERED 200k fixture vs the near-random one
(VERDICT r6 item 5): IVF exists to exploit cluster structure; the
round-6 sitting only showed its worst case (near-random vectors, ~50%
probe cut, 107 s vs 40 s brute). This sitting measures, in ONE session,
interleaved min-of-2 per arm:

- brute exact cosine top-10 (the yardstick, GEMM-prune path)
- IVF at the registered query's oracle-bound params (10 cells, probe 5)
- IVF at scale params (100 cells, probe 10 -> 10% candidate cut), the
  configuration a deployment would pick knowing ~100 true clusters

over BOTH fixtures:
- testdata_sf10emb  (near-random, make_scale x100 of sf0.1)
- testdata_embclu   (scripts/make_clustered_emb.py: 100 Gaussian
  clusters, intra-cosine ~0.9)

Recall@10 is computed against the brute result on the same fixture
(mean per-query |topk_ivf ∩ topk_brute| / 10).

    python scripts/bench_ann_clustered.py [fixture_dir ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

FIXTURES = sys.argv[1:] or [
    os.path.join(REPO_ROOT, "testdata_sf10emb"),
    os.path.join(REPO_ROOT, "testdata_embclu"),
]
N_Q = 500  # the bounded query-set contract (_TOPK_MAX_Q)


def topk_sets(rows) -> dict[int, set[int]]:
    by_q = defaultdict(set)
    for r in rows:
        by_q[r["q_id"]].add(r["c_id"])
    return by_q


def recall(got: dict[int, set[int]], want: dict[int, set[int]]) -> float:
    per_q = [
        len(got.get(q, set()) & cs) / len(cs) for q, cs in want.items() if cs
    ]
    return sum(per_q) / len(per_q)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.io import fan_out, read_table
    from multi_report_etl_pipeline_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("bench_ann_clustered")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for fx in FIXTURES:
        emb = fan_out(read_table(spark, fx, "embeddings"), spark, cols=("vec_id",))
        queries = emb.filter(F.col("vec_id") % 100 == 0).orderBy("vec_id").limit(N_Q)
        q_rows = queries.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        ).collect()
        # the wide-query arm: when |Q| grows, scoring (|Q| x |C| GEMM)
        # dominates the corpus scan and the probe cut starts to pay
        big_q = emb.filter(F.col("vec_id") % 10 == 0).orderBy("vec_id").limit(4096)
        big_rows = big_q.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        ).collect()
        n = emb.count()
        print(f"\n=== {os.path.basename(fx)}: {n} vectors, {len(q_rows)} queries ===")

        cent_small = similarity.train_centroids_portable(
            emb, n_cells=10, iters=3, train_sample=256
        )
        cent_scale = similarity.train_centroids_portable(
            emb, n_cells=100, iters=3, train_sample=4096
        )
        arms = {
            "brute": lambda: similarity.brute_topk(
                emb, queries, k=10, q_rows=q_rows
            ),
            "ivf 10c/p5 (registered params)": lambda: similarity.ivf_topk(
                emb, queries, k=10, n_probe=5, centroids=cent_small
            ),
            "ivf 100c/p10 (scale params)": lambda: similarity.ivf_topk(
                emb, queries, k=10, n_probe=10, n_cells=100, centroids=cent_scale
            ),
            "brute 4096q": lambda: similarity.brute_topk(
                emb, big_q, k=10, q_rows=big_rows
            ),
            "ivf 100c/p10 4096q": lambda: similarity.ivf_topk(
                emb, big_q, k=10, n_probe=10, n_cells=100, centroids=cent_scale
            ),
        }
        best: dict[str, float] = {}
        results: dict[str, dict] = {}
        for rep in range(2):
            for name, fn in arms.items():
                t0 = time.monotonic()
                rows = fn().collect()
                dt = time.monotonic() - t0
                best[name] = min(best.get(name, 1e9), dt)
                results[name] = topk_sets(rows)
                print(f"rep{rep} {name}: {dt:.2f} s ({len(rows)} rows)", flush=True)
        print("---- min-of-2 ----")
        for name, dt in best.items():
            want = results["brute 4096q" if "4096q" in name else "brute"]
            r = recall(results[name], want)
            print(f"{name}: {dt:.2f} s  recall@10={r:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
