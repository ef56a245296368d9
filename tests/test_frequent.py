"""Misra-Gries + exact-verify heavy hitters (operators/frequent.py):
planted-skew correctness at cardinality >> capacity (the regime the
31-token document fixture cannot reach), guarantee-boundary behavior,
and the loud capacity contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.operators.frequent import heavy_hitters


def _planted(spark, n_noise_keys, heavy_spec, parts=8):
    """A long tail of distinct noise keys (one row each) plus planted
    heavy keys with the given counts, shuffled deterministically."""
    rows = [(f"noise_{i}",) for i in range(n_noise_keys)]
    for key, cnt in heavy_spec.items():
        rows += [(key,)] * cnt
    df = spark.createDataFrame(rows, "k string")
    # spread rows across partitions by a deterministic hash so every
    # partition sees a mix of noise and heavy keys
    return df.repartition(parts, F.crc32(F.col("k"))).persist()


def test_planted_heavy_keys_exact_at_high_cardinality(spark):
    """10_000 distinct noise keys through capacity-64 summaries (the
    decrement path runs constantly) must still return EXACTLY the keys
    over n/k_inv, with exact counts."""
    heavy = {"hot_a": 3000, "hot_b": 1200, "warm": 400}
    df = _planted(spark, 10_000, heavy)
    n = 10_000 + sum(heavy.values())  # 14_600
    k_inv = 32  # threshold n/32 = 456.25 -> hot_a, hot_b qualify; warm not
    got = {r.k: r.cnt for r in heavy_hitters(df, "k", k_inv, capacity=64).collect()}
    want = {k: c for k, c in heavy.items() if c * k_inv > n}
    assert got == want == {"hot_a": 3000, "hot_b": 1200}
    df.unpersist()


def test_threshold_is_strict_integer_comparison(spark):
    """A key with cnt * k_inv == n exactly must NOT qualify (strict >),
    and cnt * k_inv == n + k_inv must."""
    # n = 1000: "edge" has 100 rows, k_inv = 10 -> 100*10 == 1000: out.
    # "over" has 101 rows -> n = 1001... build explicitly instead:
    rows = [("edge",)] * 100 + [("over",)] * 112 + [
        (f"n_{i}",) for i in range(788)
    ]
    df = spark.createDataFrame(rows, "k string")  # n = 1000
    got = {r.k: r.cnt for r in heavy_hitters(df, "k", 10, capacity=100).collect()}
    assert "edge" not in got  # 100 * 10 == 1000, not >
    assert got == {"over": 112}  # 112 * 10 = 1120 > 1000


def test_capacity_below_k_inv_is_rejected(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "k", k_inv=100, capacity=50)


def test_matches_trivial_groupby_on_fixture(spark):
    """Differential vs the full-shuffle exact form on the documents
    fixture tokens (the same frame the registered query scans)."""
    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.operators import text
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents")
    tok = docs.select(F.explode(text.words("text")).alias("token"))
    n = tok.count()
    trivial = {
        (r.token, r.cnt)
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 500 > n)
        .collect()
    }
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(tok, "token", 500, capacity=1000).collect()
    }
    assert got == trivial and len(got) > 0


def test_grouped_planted_heavy_keys_exact_per_group(spark):
    """Keyed variant (grouped_heavy_hitters): two groups with planted
    heavy keys under different noise tails, cardinality >> capacity so
    the per-group decrement path runs; each group's result must be
    exactly its keys over n_g/k_inv with exact counts, and a group
    with no qualifying keys must be absent."""
    from multi_report_etl_pipeline_spark.operators.frequent import (
        grouped_heavy_hitters,
    )

    rows = []
    # group A: 5000 noise + hot 900, warm 120 -> n_A = 6020
    rows += [("A", f"na_{i}") for i in range(5000)]
    rows += [("A", "hot")] * 900 + [("A", "warm")] * 120
    # group B: 3000 noise + big 800 -> n_B = 3800
    rows += [("B", f"nb_{i}") for i in range(3000)]
    rows += [("B", "big")] * 800
    # group C: pure flat noise -> nothing can qualify
    rows += [("C", f"nc_{i}") for i in range(2000)]
    df = (
        spark.createDataFrame(rows, "g string, k string")
        .repartition(8, F.crc32(F.col("k")))
        .persist()
    )
    k_inv = 16  # thresholds: A 376.25, B 237.5, C 125
    out = grouped_heavy_hitters(df, "g", "k", k_inv, capacity=32).collect()
    got = {(r.g, r.k): (r.cnt, r.n_group) for r in out}
    assert got == {
        ("A", "hot"): (900, 6020),
        ("B", "big"): (800, 3800),
    }, got
    df.unpersist()


def test_grouped_capacity_contract_is_loud(spark):
    from multi_report_etl_pipeline_spark.operators.frequent import (
        grouped_heavy_hitters,
    )

    df = spark.createDataFrame([("g", "k")], "g string, k string")
    with pytest.raises(ValueError, match="capacity"):
        grouped_heavy_hitters(df, "g", "k", k_inv=64, capacity=10)


def test_bucket_sketch_planted_heavy_keys_exact_per_group(spark):
    """bucket_sketch_heavy_hitters must return the same exact rows as
    the MG form on planted per-group skew (same scenario as the
    grouped MG test), including the empty flat group."""
    from multi_report_etl_pipeline_spark.operators.frequent import (
        bucket_sketch_heavy_hitters,
    )

    rows = []
    rows += [("A", f"na_{i}") for i in range(5000)]
    rows += [("A", "hot")] * 900 + [("A", "warm")] * 120
    rows += [("B", f"nb_{i}") for i in range(3000)]
    rows += [("B", "big")] * 800
    rows += [("C", f"nc_{i}") for i in range(2000)]
    df = (
        spark.createDataFrame(rows, "g string, k string")
        .repartition(8, F.crc32(F.col("k")))
        .persist()
    )
    out = bucket_sketch_heavy_hitters(df, "g", "k", k_inv=16).collect()
    got = {(r.g, r.k): (r.cnt, r.n_group) for r in out}
    assert got == {
        ("A", "hot"): (900, 6020),
        ("B", "big"): (800, 3800),
    }, got
    df.unpersist()


def test_bucket_sketch_collisions_are_verified_away(spark):
    """With a tiny bucket count every noise key collides into the heavy
    key's bucket — the verify pass must still emit ONLY the truly
    heavy key with its exact count."""
    from multi_report_etl_pipeline_spark.operators.frequent import (
        bucket_sketch_heavy_hitters,
    )

    rows = [("g", "hot")] * 500 + [("g", f"n_{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, k string")
    out = bucket_sketch_heavy_hitters(df, "g", "k", k_inv=10, n_buckets=2).collect()
    got = {(r.g, r.k): (r.cnt, r.n_group) for r in out}
    assert got == {("g", "hot"): (500, 1000)}, got
