"""Round-11 probes (VERDICT r10 items 4 and 8).

  staging — decompose staging_materialize's survivor pipeline by its
      row_fp hash primitive: arm A = shipped md5-hash60, arm B =
      xxhash64 (NOT shippable — no DuckDB-portable equivalent, the
      oracle cannot re-derive it; measurement only, bounds the md5
      share), arm C = arithmetic surrogate (no hash at all; bounds the
      total derive share). Interleaved A B C C B A in one JVM,
      fn-in-timer min over reps.

  media — checkpoint-vs-recompute A/B for the dhash/audio near-dup
      rows (their decoded-hash `groups` frame is referenced ~10x
      downstream): arm A = shipped localCheckpoint, arm B = same plan
      without the checkpoint. fn-in-timer (the checkpoint job IS part
      of the timed construction under the round-10 semantics).

Usage:
    python scripts/probe_r11.py staging [sf_dir]
    python scripts/probe_r11.py media  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spark(name: str):
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name=name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def probe_staging(sf_dir: str) -> None:
    from multi_report_etl_pipeline_spark import domain, staging
    from multi_report_etl_pipeline_spark.io import fan_out, read_table

    spark = _spark("probe_staging")
    n_splits = spark.sparkContext.defaultParallelism

    def survivors(hash60):
        orig = domain.DIALECTS["spark"]["hash60"]
        domain.DIALECTS["spark"]["hash60"] = hash60
        try:
            orders = read_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey"
            )
            l_cols = [
                c for c in domain._ACTIVITY_SOURCE_COLS if c.startswith("l_")
            ]
            lineitem = fan_out(
                read_table(spark, sf_dir, "lineitem").select(*l_cols),
                spark,
                n_splits,
                cols=("l_orderkey",),
            )
            sact = domain.stg_activities_df(
                lineitem, F.broadcast(orders), repartition_by_account=n_splits
            )
            return staging.combined_contact_survivors(sact)
        finally:
            domain.DIALECTS["spark"]["hash60"] = orig

    arms = {
        "A_md5": domain._hash60_spark,
        "B_xxh": lambda expr: f"xxhash64({expr})",
        "C_arith": lambda expr: (
            "CAST(l_orderkey * 1000003 + l_linenumber * 9176 + l_partkey "
            "AS BIGINT)"
        ),
    }
    for name, h in arms.items():  # warm each arm's plan + page cache
        _force(survivors(h))
    out: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(2):
        for name in ("A_md5", "B_xxh", "C_arith", "C_arith", "B_xxh", "A_md5"):
            t0 = time.perf_counter()
            _force(survivors(arms[name]))
            out[name].append(round(time.perf_counter() - t0, 3))
    for name, samples in out.items():
        print(f"staging {name}: min {min(samples):.3f}  {samples}")
    spark.stop()


def probe_media(sf_dir: str) -> None:
    from multi_report_etl_pipeline_spark.operators import dedup
    from multi_report_etl_pipeline_spark.queries import llm_ops

    spark = _spark("probe_media")

    def near_dup(frame_fn, cols, checkpoint: bool):
        hashes = frame_fn(spark, sf_dir, with_twins=True)
        hi, lo = cols
        groups = hashes.groupBy(hi, lo).agg(
            F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n_docs")
        )
        if checkpoint:
            groups = groups.localCheckpoint(eager=True)
        sigs = groups.select(
            F.col("rep_id").alias("doc_id"),
            F.col(lo).alias("sig_lo"),
            F.col(hi).alias("sig_hi"),
        )
        pairs = dedup.hamming_banded_pairs(
            sigs, max_hamming=3, materialize=False
        ).select(
            F.col("doc_id_1").alias("rep_id_1"),
            F.col("doc_id_2").alias("rep_id_2"),
            "hamming",
        )
        n1 = groups.select(
            F.col("rep_id").alias("rep_id_1"), F.col("n_docs").alias("n_docs_1")
        )
        n2 = groups.select(
            F.col("rep_id").alias("rep_id_2"), F.col("n_docs").alias("n_docs_2")
        )
        return pairs.join(n1, "rep_id_1").join(n2, "rep_id_2").select(
            "rep_id_1", "rep_id_2", "hamming", "n_docs_1", "n_docs_2"
        )

    cases = {
        "dhash": (llm_ops._dhash_frame, ("dhash_hi", "dhash_lo")),
        "audio": (llm_ops._audio_fp_frame, ("afp_hi", "afp_lo")),
    }
    for cname, (fn, cols) in cases.items():
        for arm in (True, False):  # warm both
            _force(near_dup(fn, cols, arm))
        out = {True: [], False: []}
        for arm in (True, False, False, True, True, False):
            t0 = time.perf_counter()
            _force(near_dup(fn, cols, arm))
            out[arm].append(round(time.perf_counter() - t0, 3))
        print(
            f"{cname}: checkpoint min {min(out[True]):.3f} {out[True]}  "
            f"recompute min {min(out[False]):.3f} {out[False]}"
        )
    spark.stop()


def probe_tfidf(sf_dir: str) -> None:
    """VERDICT r10 item 7: tf-keyed-exchange arm vs shipped form at a
    scale where tokenize dominates. Arm A = shipped (tf rides the doc
    partitioning, no exchange of its own; tokenize runs once per
    consumer — 2x). Arm B = tf repartitioned by token after the
    aggregate: ONE tokenize behind a reused exchange, at the cost of
    shuffling every distinct (doc, token) pair."""
    from pyspark.sql import Window

    from multi_report_etl_pipeline_spark.io import fan_out, read_table
    from multi_report_etl_pipeline_spark.operators import text

    spark = _spark("probe_tfidf")

    def arm_a():
        docs = fan_out(
            read_table(spark, sf_dir, "documents"), spark, cols=("doc_id",)
        )
        return text.tfidf_top_terms(docs)

    def arm_b():
        docs = fan_out(
            read_table(spark, sf_dir, "documents"), spark, cols=("doc_id",)
        )
        tok = docs.select(
            F.col("doc_id"), F.explode(text.words("text")).alias("token")
        )
        tf = (
            tok.groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .filter(F.col("token").isNotNull())
            .repartition("token")
        )
        dfreq = tf.groupBy("token").agg(F.count("doc_id").alias("df"))
        n_docs = docs.select(F.countDistinct(F.col("doc_id")).alias("n_docs"))
        scored = (
            tf.join(dfreq, "token")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id",
                "token",
                "tf",
                F.round(
                    F.col("tf").cast("double")
                    * F.log(
                        F.col("n_docs").cast("double")
                        / F.col("df").cast("double")
                    ),
                    6,
                ).alias("tfidf"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("tfidf"), F.asc("token")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("doc_id", "rank", "token", "tf", "tfidf")
        )

    # value parity first (the arms must agree before timing means anything)
    a = {tuple(r) for r in arm_a().collect()}
    b = {tuple(r) for r in arm_b().collect()}
    print(f"tfidf arms agree: {a == b}  ({len(a)} rows)")

    for fn in (arm_a, arm_b):
        _force(fn())
    out = {"A": [], "B": []}
    for name in ("A", "B", "B", "A", "A", "B"):
        fn = arm_a if name == "A" else arm_b
        t0 = time.perf_counter()
        _force(fn())
        out[name].append(round(time.perf_counter() - t0, 3))
    print(
        f"tfidf A(shipped) min {min(out['A']):.3f} {out['A']}  "
        f"B(tf-keyed exchange) min {min(out['B']):.3f} {out['B']}"
    )
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    if mode == "staging":
        probe_staging(sf_dir)
    elif mode == "media":
        probe_media(sf_dir)
    elif mode == "tfidf":
        probe_tfidf(sf_dir)
    else:
        raise SystemExit(f"unknown mode {mode}")
