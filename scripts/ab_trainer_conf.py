"""Interleaved config A/B for the ITERATIVE-TRAINER family (round-7
verdict item 1): docs_bpe_merges regressed 1.83 -> 4.92 s at sf0.1 on
unchanged code between rounds 5 and 6; the round-6 session-config swap
is the suspect because its A/Bs only ever re-measured the scan-heavy
ledger, never the many-tiny-jobs trainers.

Arms toggle the ROUND-6 config deltas individually (all runtime-settable,
so one Spark session interleaves them ABBA-style):

  r6       : the shipped round-6 config (control)
  init32   : r6 but adaptive.initialPartitionNum back to 32 (r5 had none)
  scan-r5  : r6 but maxPartitionBytes=2m + openCostInBytes=4m (r5 scan)
  bcast64  : r6 but autoBroadcastJoinThreshold=64m (r5 static broadcast)
  r5-all   : all three reverted together

Queries: docs_bpe_merges and docs_quality_logreg rebuild (train) every
call, so fn(spark, sf_dir) sits inside the timer; staging_materialize
is the third drifted query from the judge's table.

Usage: python scripts/ab_trainer_conf.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from multi_report_etl_pipeline_spark.queries import all_queries  # noqa: E402
from multi_report_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

ARMS: dict[str, dict[str, str]] = {
    "r6": {},
    "init32": {"spark.sql.adaptive.coalescePartitions.initialPartitionNum": "32"},
    "scan-r5": {
        "spark.sql.files.maxPartitionBytes": "2m",
        "spark.sql.files.openCostInBytes": "4m",
    },
    "bcast64": {"spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024)},
    "r5-all": {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "32",
        "spark.sql.files.maxPartitionBytes": "2m",
        "spark.sql.files.openCostInBytes": "4m",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    },
}
R6_BASE = {
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.files.openCostInBytes": "1m",
    "spark.sql.autoBroadcastJoinThreshold": "10m",
}


def main() -> None:
    spark = get_spark(app_name="ab-trainer-conf")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    from multi_report_etl_pipeline_spark.queries.reference import (  # noqa: PLC0415
        clear_materialized_staging,
        materialize_staging,
    )

    def run_materialize() -> None:
        clear_materialized_staging(SF_DIR)
        materialize_staging(spark, SF_DIR)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    tasks = {
        "docs_bpe_merges": lambda: force(
            registry["docs_bpe_merges"].fn(spark, SF_DIR)
        ),
        "docs_quality_logreg": lambda: force(
            registry["docs_quality_logreg"].fn(spark, SF_DIR)
        ),
        "staging_materialize": run_materialize,
    }

    def set_arm(overrides: dict[str, str]) -> None:
        for k, v in R6_BASE.items():
            spark.conf.set(k, overrides.get(k, v))
        for k, v in overrides.items():
            spark.conf.set(k, v)

    # warm-up: one pass of everything under the control arm
    set_arm(ARMS["r6"])
    for fn in tasks.values():
        fn()

    results: dict[str, dict[str, list[float]]] = {
        q: {a: [] for a in ARMS} for q in tasks
    }
    for r in range(ROUNDS):
        # alternate arm order per round (ABBA) so drift cancels
        order = list(ARMS) if r % 2 == 0 else list(reversed(list(ARMS)))
        for arm in order:
            set_arm(ARMS[arm])
            for q, fn in tasks.items():
                t0 = time.perf_counter()
                fn()
                results[q][arm].append(time.perf_counter() - t0)
        print(f"round {r + 1}/{ROUNDS} done", flush=True)

    print(f"\nsf_dir={SF_DIR} rounds={ROUNDS} (min / median shown)")
    for q in tasks:
        print(f"\n{q}:")
        for arm in ARMS:
            s = sorted(results[q][arm])
            med = s[len(s) // 2]
            print(f"  {arm:9s} min={s[0]:6.2f}s med={med:6.2f}s all={[round(x,2) for x in s]}")
    spark.stop()


if __name__ == "__main__":
    main()
