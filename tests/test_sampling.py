"""Sampling/packing operators: determinism, exactness, and plan-shape
properties beyond the oracle differential in test_llm_ops.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.io import read_table
from multi_report_etl_pipeline_spark.operators import sampling
from multi_report_etl_pipeline_spark.plans import physical_plan
from multi_report_etl_pipeline_spark.queries.llm_ops import QUERIES
from tests.conftest import SF_DIR, SF_DIR_MED


def test_hash_sample_rate_and_stability(spark):
    docs = read_table(spark, SF_DIR_MED, "documents")
    n = docs.count()
    picked = sampling.hash_sample(docs, "doc_id", 10)
    ids = {r.doc_id for r in picked.select("doc_id").collect()}
    # 16-bit hash at 10%: binomial tolerance, fixture n=500
    assert 0.05 * n <= len(ids) <= 0.15 * n, (len(ids), n)
    # membership is a key property: repartitioning must not change it
    reparted = sampling.hash_sample(docs.repartition(7), "doc_id", 10)
    assert {r.doc_id for r in reparted.select("doc_id").collect()} == ids
    # rate=0 and rate=100 are exact
    assert sampling.hash_sample(docs, "doc_id", 0).count() == 0
    assert sampling.hash_sample(docs, "doc_id", 100).count() == n


def test_hash_sample_is_narrow_no_shuffle(spark):
    docs = read_table(spark, SF_DIR_MED, "documents")
    plan = physical_plan(sampling.hash_sample(docs, "doc_id", 10))
    assert "Exchange" not in plan, plan[:2000]


def test_stratified_sample_exact_k_per_stratum(spark):
    docs = read_table(spark, SF_DIR_MED, "documents")
    k = 7
    out = sampling.stratified_sample(docs, ["lang"], "doc_id", k)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    truth = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {lang: min(k, n) for lang, n in truth.items()}
    # deterministic: same pick on rerun
    again = sampling.stratified_sample(docs, ["lang"], "doc_id", k)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_stratified_sample_uses_window_group_limit(spark):
    plan = physical_plan(QUERIES["docs_stratified_sample"].fn(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_token_packing_budget_overflow_bound(spark):
    budget = 512
    docs = read_table(spark, SF_DIR_MED, "documents")
    from multi_report_etl_pipeline_spark.operators.text import token_count_ws

    packed = sampling.pack_by_token_budget(
        docs, "doc_id", token_count_ws("text"), budget=budget, n_shards=4
    )
    rows = packed.collect()
    # every document is assigned exactly once
    assert len(rows) == docs.count()
    by_pack: dict[tuple, list[int]] = {}
    for r in rows:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r.n_tokens)
    for (shard, pack), toks in by_pack.items():
        # offset packing: a pack holds < budget tokens before its last
        # doc lands, so total < budget + max single doc
        assert sum(toks) < budget + max(toks), (shard, pack, sum(toks))
    # the first pack of every shard starts at offset 0 (pack ids can
    # legitimately skip a multiple when one doc spans a whole budget)
    for shard in {r.shard for r in rows}:
        packs = sorted({r.pack_id for r in rows if r.shard == shard})
        assert packs[0] == 0, (shard, packs)


def test_split_assignment_partitions_and_aligns_with_hash_sample(spark):
    """Every row gets exactly one split; proportions are within sampling
    noise of 90/5/5; and the train split's membership is consistent with
    hash_sample at the same rate (same md5 bucket), so samples and
    splits compose on a shared key."""
    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.operators.sampling import (
        hash_sample,
        split_assignment,
    )
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents")
    assigned = split_assignment(docs, "doc_id")
    counts = {r.split: r.cnt for r in assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / total > 0.8
    first_95 = {
        r.doc_id
        for r in hash_sample(docs, "doc_id", 95).select("doc_id").collect()
    }
    non_test = {
        r.doc_id
        for r in assigned.filter(F.col("split") != "test").select("doc_id").collect()
    }
    assert first_95 == non_test


def test_split_assignment_validates_percents(spark):
    from multi_report_etl_pipeline_spark.operators.sampling import split_assignment

    with pytest.raises(ValueError):
        split_assignment(None, "k", {"train": 50, "val": 10})
    with pytest.raises(ValueError):
        split_assignment(None, "k", {"train": 110, "val": -10})


def test_mixture_sample_copy_counts_and_determinism(spark):
    """Integer rates repeat every row exactly floor(r) times; fractional
    parts add copies at the declared per-source frequency; rate 0 drops
    the source entirely; membership/copy counts are stable under
    repartitioning. copy_id is 1..n per row."""
    from multi_report_etl_pipeline_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 4 == 0 else "b" if i % 4 == 1 else "c" if i % 4 == 2 else "d")
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"a": 2.0, "b": 0.0, "c": 0.5, "d": 3.0}
    out = mixture_sample(df, "doc_id", "source", rates).collect()
    by_key: dict[tuple[int, str], list[int]] = {}
    for r in out:
        by_key.setdefault((r.doc_id, r.source), []).append(r.copy_id)
    # a: exactly 2 copies each; d: exactly 3; b: none
    a_keys = [k for k in by_key if k[1] == "a"]
    assert len(a_keys) == 100 and all(
        sorted(by_key[k]) == [1, 2] for k in a_keys
    )
    assert all(k[1] != "b" for k in by_key)
    d_keys = [k for k in by_key if k[1] == "d"]
    assert len(d_keys) == 100 and all(
        sorted(by_key[k]) == [1, 2, 3] for k in d_keys
    )
    # c: ~half the rows, one copy each, deterministic subset
    c_keys = [k for k in by_key if k[1] == "c"]
    assert 25 <= len(c_keys) <= 75 and all(by_key[k] == [1] for k in c_keys)
    again = mixture_sample(
        df.repartition(7), "doc_id", "source", rates
    ).collect()
    assert sorted((r.doc_id, r.source, r.copy_id) for r in again) == sorted(
        (r.doc_id, r.source, r.copy_id) for r in out
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_sample(df, "doc_id", "source", {"a": -1.0})


def test_temperature_rates_formula_and_composition(spark):
    """tau=1 reproduces natural proportions (all rates equal); tau->inf
    approaches uniform shares; expected output size equals the budget;
    rates compose with mixture_sample to a deterministic resample."""
    import math

    from multi_report_etl_pipeline_spark.operators.sampling import (
        mixture_sample,
        temperature_rates,
    )

    counts = {"big": 8000, "mid": 1500, "small": 500}
    nat = temperature_rates(counts, tau=1.0)
    assert all(abs(r - 1.0) < 1e-12 for r in nat.values())
    flat = temperature_rates(counts, tau=1e9)
    # uniform shares: each source's expected rows = N/3
    total = sum(counts.values())
    for s, n in counts.items():
        assert abs(flat[s] * n - total / 3) < 1.0
    t2 = temperature_rates(counts, tau=2.0)
    expected_out = sum(t2[s] * n for s, n in counts.items())
    assert abs(expected_out - total) < 1e-6
    assert t2["small"] > 1.0 > t2["big"]  # scarce upsampled, bulk downsampled
    half = temperature_rates(counts, tau=2.0, budget=total / 2)
    assert all(abs(half[s] - t2[s] / 2) < 1e-12 for s in counts)

    rows = [(i, "big" if i % 4 != 3 else "small") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got_counts = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rates = temperature_rates(got_counts, tau=3.0)
    out = mixture_sample(df, "doc_id", "source", rates)
    n_out = out.count()
    assert abs(n_out - 200) <= 25  # expected size == budget, binomial spread

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_rates(counts, tau=0)
    with _pytest.raises(ValueError):
        temperature_rates({}, tau=1.0)


def test_weighted_sample_matches_bruteforce_reference(spark):
    """Efraimidis-Spirakis top-k: priorities, selection, and ranks must
    equal the literal Python computation from the same md5-derived
    uniforms; zero/NULL weights are excluded."""
    import hashlib

    from multi_report_etl_pipeline_spark.operators.sampling import weighted_sample

    rows = [(i, float(w)) for i, w in zip(range(40), [1, 2, 5, 10] * 10)]
    rows += [(100, 0.0), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, weight double")

    def u_of(key):
        bucket = int(hashlib.md5(str(key).encode()).hexdigest()[:4], 16) % 65536
        return (bucket + 0.5) / 65536.0

    expect = sorted(
        (
            (round(u_of(i) ** (1.0 / w), 9), i)
            for i, w in rows
            if w is not None and w > 0
        ),
        key=lambda x: (-x[0], x[1]),
    )[:10]

    got = weighted_sample(df, "doc_id", "weight", k=10).collect()
    assert [(r["priority"], r["doc_id"]) for r in got] == expect
    assert [r["sample_rank"] for r in got] == list(range(1, 11))
    # determinism across invocations
    again = weighted_sample(df, "doc_id", "weight", k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_weighted_sample_priority_monotone_in_weight(spark):
    """For a fixed key (fixed uniform), a higher weight must never
    lower the priority — the defining property of u^(1/w)."""
    from multi_report_etl_pipeline_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(7, 1.0), (7, 2.0), (7, 8.0)], "doc_id long, weight double"
    )
    pris = [
        r["priority"]
        for r in sorted(
            weighted_sample(df, "doc_id", "weight", k=3).collect(),
            key=lambda r: r["weight"],
        )
    ]
    assert pris == sorted(pris), pris


def test_weighted_sample_excludes_nan_weights(spark):
    """Spark compares NaN greater than any number, so NaN weights pass a
    bare `w > 0` filter and their NaN priorities sort FIRST descending —
    the ADVICE-flagged seizure. The isnan guard must drop them."""
    from multi_report_etl_pipeline_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 2.0), (4, float("nan"))],
        "doc_id long, weight double",
    )
    got = weighted_sample(df, "doc_id", "weight", k=4).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 3]
    assert all(r["priority"] == r["priority"] for r in got)  # no NaN priority


def test_weighted_sample_rejects_bad_k(spark):
    import pytest

    from multi_report_etl_pipeline_spark.operators.sampling import weighted_sample

    with pytest.raises(ValueError):
        weighted_sample(None, "doc_id", "weight", k=0)


def _dsir_python_reference(corpus, targets, n_buckets, bucket_of):
    """Literal DSIR definition: hashed-unigram bucket counts with
    add-one smoothing, integer micro-nat log-ratio sums."""
    import math

    c_raw: dict[int, int] = {}
    c_t: dict[int, int] = {}
    for _id, src, text in corpus:
        for t in text.split():
            b = bucket_of(t)
            c_raw[b] = c_raw.get(b, 0) + 1
            if src in targets:
                c_t[b] = c_t.get(b, 0) + 1
    n_raw, n_t = sum(c_raw.values()), sum(c_t.values())

    def lr(b):
        return round(
            math.log(
                ((c_t.get(b, 0) + 1.0) / (n_t + n_buckets))
                / ((c_raw.get(b, 0) + 1.0) / (n_raw + n_buckets))
            )
            * 1e6
        )

    out = {}
    for _id, _src, text in corpus:
        toks = text.split()
        out[_id] = round(sum(lr(bucket_of(t)) for t in toks) / 1e6, 6)
    return out


def test_dsir_sample_matches_python_reference(spark):
    """Exact log weights vs the literal definition (same md5 bucketing),
    target-slice docs outrank off-target docs, and the result is
    invariant under repartitioning (integer micro-nat sums)."""
    import hashlib

    from multi_report_etl_pipeline_spark.operators.sampling import dsir_sample

    corpus = [
        (1, "good", "alpha beta alpha gamma"),
        (2, "good", "alpha beta beta"),
        (3, "bulk", "zeta eta theta iota kappa"),
        (4, "bulk", "alpha zeta zeta eta"),
        (5, "bulk", "alpha beta gamma alpha"),
    ]
    n_buckets = 64

    def bucket_of(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % n_buckets

    want = _dsir_python_reference(corpus, {"good"}, n_buckets, bucket_of)
    docs = spark.createDataFrame(corpus, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_sample(
            docs, F.col("source") == "good", k=5, n_buckets=n_buckets
        ).collect()
    }
    assert got == want
    # doc 5 has target-like content from a bulk source: DSIR must rank it
    # with the target docs, above the off-target doc 3
    assert got[5] > got[3]
    assert min(got[1], got[2]) > got[3]
    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_sample(
            docs.repartition(5), F.col("source") == "good", k=5, n_buckets=n_buckets
        ).collect()
    }
    assert got == again


def test_dsir_pretrained_stats_score_unseen_corpus(spark):
    """A fitted estimator must transfer: scoring a corpus with tokens
    the fit never saw falls back to the both-unseen default ratio
    instead of dropping tokens (the LEFT join + coalesce path), and
    n_tokens still counts every token."""
    from multi_report_etl_pipeline_spark.operators.sampling import (
        dsir_bucket_stats,
        dsir_sample,
    )

    fit = spark.createDataFrame(
        [(1, "good", "alpha beta"), (2, "bulk", "zeta eta")],
        "doc_id long, source string, text string",
    )
    stats = dsir_bucket_stats(fit, F.col("source") == "good", n_buckets=8)
    fresh = spark.createDataFrame(
        [(10, "totally unseen tokens here")], "doc_id long, text string"
    )
    got = dsir_sample(fresh, k=1, stats=stats).collect()
    assert len(got) == 1 and got[0]["n_tokens"] == 4
    # all-unseen docs score n * default_micro exactly
    assert got[0]["log_weight"] == round(4 * stats["default_micro"] / 1e6, 6)


def test_dsir_sample_rejects_bad_args(spark):
    from multi_report_etl_pipeline_spark.operators.sampling import dsir_sample

    with pytest.raises(ValueError):
        dsir_sample(None, F.lit(True), k=0)
    with pytest.raises(ValueError):
        dsir_sample(None, None, k=5)
