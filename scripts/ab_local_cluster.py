"""Multi-process shuffle sanity row (VERDICT r8 item 9): the weak-list
residue on the fact-shuffle queries is attributed to ONE-BOX shuffle
I/O — every map output and every reduce fetch lands on the same
kernel/page-cache/disk path. If that attribution is right, splitting
the same 32 cores into 4 separate executor PROCESSES
(local-cluster[4,8,8g]) should roughly preserve wall-clock (the work
is the same, now with real serialization + socket fetches), while a
genuine shuffle-I/O ceiling would show local-cluster RECOVERING time
the way adding machines would. Either outcome is evidence: 'flat ==
cluster' means the residue is CPU (serialization/hash/sort) that more
boxes WOULD distribute, 'cluster >> flat' means the local numbers
understate a real cluster (extra copy/socket cost), 'cluster << flat'
would falsify the one-box attribution.

Each arm runs in its own fresh JVM (subprocess), interleaved
F C C F per rep to cancel box drift; min-of-N per arm.

Usage:
    python scripts/ab_local_cluster.py --sf-dir testdata_sf100 \
        --queries tpch_q3_shipping_priority,tpch_q10_returned_items
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

RESULT_TAG = "AB_LC_RESULT "
CLUSTER_MASTER = "local-cluster[4,8,8192]"


def child(sf_dir: str, query: str, master: str, reps: int) -> None:
    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    extra = {}
    if master.startswith("local-cluster"):
        # executors are separate JVMs: ship the worker python and keep
        # per-executor memory inside the [n,cores,mem_mb] envelope
        extra["spark.executor.memory"] = "7g"
    spark = get_spark(app_name=f"ablc:{query}", master=master, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[query]

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run()  # warm (page cache, codegen, AQE stats)
    samples = [run() for _ in range(reps)]
    print(RESULT_TAG + json.dumps({"samples": samples}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]))
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    def one(query: str, master: str) -> float:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             args.sf_dir, query, master, str(args.reps)],
            capture_output=True, text=True, timeout=2400, cwd=REPO_ROOT,
        )
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(RESULT_TAG):
                return min(json.loads(line[len(RESULT_TAG):])["samples"])
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"child failed: {query} {master}")

    for query in args.queries.split(","):
        flat: list[float] = []
        clus: list[float] = []
        for _ in range(args.rounds):  # F C C F interleave
            flat.append(one(query, f"local[{os.cpu_count()}]"))
            clus.append(one(query, CLUSTER_MASTER))
            clus.append(one(query, CLUSTER_MASTER))
            flat.append(one(query, f"local[{os.cpu_count()}]"))
        print(json.dumps({
            "metric": "ab_local_cluster", "query": query,
            "flat_min": min(flat), "cluster_min": min(clus),
            "flat": flat, "cluster": clus,
            "cluster_over_flat": round(min(clus) / min(flat), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
