"""Deterministic sampling and sequence-packing operators for
training-data curation.

A 100 TB curation pipeline needs samples that are (a) reproducible
across reruns and engines — no RNG state, no seed-per-partition
coupling — and (b) computable in one narrow pass. All three operators
here derive their randomness from md5 of a key column, which both Spark
and DuckDB compute identically, so every operator is differentially
oracle-checked value-for-value (no rows-only weak gate):

- ``hash_sample``: Bernoulli-style p% sample — keep rows whose keyed
  hash bucket falls under the rate. Pure narrow filter: no shuffle, no
  state, evaluates inside the parquet scan's codegen stage at any
  scale, and membership is stable under repartitioning/reruns.
- ``stratified_sample``: exact k rows per stratum, picked by hash
  order. One shuffle on the strata columns; row_number over the hash
  ordering compiles to WindowGroupLimit, so each map task keeps at
  most k rows per stratum before the exchange.
- ``pack_by_token_budget``: assign documents to fixed-token-budget
  packs (context-window packing for LLM pretraining). Documents are
  hash-sharded, ordered deterministically within each shard, and a
  running token total maps each doc to the pack its start offset falls
  in. One shuffle on the shard id; shard count scales with the
  cluster, and each shard's cumulative sum is an independent window.

The reference pipeline has no sampling surface (its scale needs none —
README.md:116 "current scale" keeps views unmaterialized); these extend
SURVEY.md §2.9's training-data family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(key: Column, buckets: int) -> Column:
    """Uniform bucket in [0, buckets) derived from md5 of the key.

    Uses the first 4 hex digits (16 bits) of md5 — identical on Spark
    and DuckDB, and 65536 source values are enough for percent-level
    sampling rates to be accurate to ~0.002%.
    """
    h16 = F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
    return F.pmod(h16.cast("int"), F.lit(buckets))


def hash_sample(df: DataFrame, key_col: str, pct: int) -> DataFrame:
    """Deterministic ~pct% sample keyed on ``key_col``.

    Unlike ``DataFrame.sample`` this is reproducible across engines,
    reruns, and repartitioning (membership depends only on the key),
    and it composes with joins: sampling two tables on a shared key at
    the same rate yields aligned samples.
    """
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    return df.filter(_hash_bucket(F.col(key_col), 100) < pct)


def split_assignment(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    from the same 16-bit md5 bucket ``hash_sample`` uses.

    ``splits``: name -> percent, summing to 100; bucket ranges are
    cumulative in the given order, so membership is deterministic
    across engines, reruns, repartitioning, AND monotone under
    rebalancing (growing one split only steals keys from its
    neighbor's boundary, never reshuffles everything — the property
    that keeps eval sets stable as ratios are tuned). A narrow codegen
    projection inside the scan stage: no shuffle, no RNG state.
    """
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != 100 or any(v <= 0 for v in splits.values()):
        raise ValueError(f"split percents must be positive and sum to 100: {splits}")
    bucket = _hash_bucket(F.col(key_col), 100)
    expr = None
    cum = 0
    for name, pct in splits.items():
        cum += pct
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, strata_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order.

    The hash ordering makes the pick pseudo-random but deterministic;
    ``key_col`` (unique) breaks md5-collision ties so the survivor set
    is total-ordered. The row_number-<=-k shape compiles to Spark's
    WindowGroupLimit: each task pre-prunes to k rows per stratum before
    the exchange, so the shuffle carries O(strata * k), not the table.
    Output keeps ``sample_rank`` (1..k within the stratum) so consumers
    can sub-slice without re-sampling.
    """
    from pyspark.sql import Window

    order = [F.md5(F.col(key_col).cast("string")), F.col(key_col)]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-source mixture sampling — the operator that turns a pile of
    heterogeneous corpora into a training mix with declared per-source
    weights (upsample scarce high-quality sources, downsample bulk
    crawl). ``rates[source] = r`` keeps each of that source's rows
    ``floor(r)`` times always, plus one more copy when the row's keyed
    hash falls under ``frac(r)`` — so r=0.25 is a quarter-sample,
    r=2.5 repeats every row twice and half the rows a third time
    ("epoch repetition" with a deterministic fractional epoch).

    Determinism contract matches the rest of this module: the extra
    copy depends only on md5 of the key (16-bit bucket, so rates
    quantize to 1/65536), stable across engines/reruns/repartitioning,
    and oracle-checkable value-for-value. Output repeats input rows
    with ``copy_id`` (1..n) distinguishing copies. One narrow map +
    bounded explode, no shuffle, no RNG state; sequence() is guarded so
    n=0 emits nothing (an unguarded sequence(1, 0) runs DESCENDING).
    """
    for s, r in rates.items():
        if not (r >= 0.0 and r == r and r != float("inf")):
            raise ValueError(f"rate for {s!r} must be finite and >= 0, got {r}")
    if not (default_rate >= 0.0 and default_rate != float("inf")):
        raise ValueError(f"default_rate must be finite and >= 0, got {default_rate}")

    def split_rate(r: float) -> tuple[int, int]:
        base = int(r)
        return base, round((r - base) * 65536)

    u16 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("int")
    d_base, d_thr = split_rate(default_rate)
    base_c: Column = F.lit(d_base)
    thr_c: Column = F.lit(d_thr)
    for s, r in sorted(rates.items()):
        b, t = split_rate(r)
        base_c = F.when(F.col(source_col) == s, b).otherwise(base_c)
        thr_c = F.when(F.col(source_col) == s, t).otherwise(thr_c)
    n = base_c + F.when(u16 < thr_c, 1).otherwise(0)
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    # explode must be the top-level expression of its projection (a cast
    # around a generator is rejected); cast in a follow-up projection
    out = df.withColumn("copy_id", F.explode(copies))
    return out.withColumn("copy_id", F.col("copy_id").cast("bigint"))


def temperature_rates(
    counts: dict[str, int], tau: float, budget: float | None = None
) -> dict[str, float]:
    """Per-source mixture rates from temperature-smoothed frequencies —
    the standard multilingual/multi-corpus re-balancing formula: the
    target share of source s is p_s^(1/tau) / sum(p^(1/tau)) where
    p_s = n_s / N. tau=1 reproduces natural proportions; tau>1 flattens
    toward uniform (upsampling scarce sources); tau->inf is uniform.

    Returns the ``rates`` dict for ``mixture_sample``: rate_s =
    target_share_s * budget / n_s, where ``budget`` is the desired
    output row count (default N, a same-size resample). A pure driver
    function over the bounded per-source count map (one small groupBy
    to obtain), so the sampling itself stays engine-deterministic —
    rates become literals in the plan.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    if any(n <= 0 for n in counts.values()) or not counts:
        raise ValueError("counts must be non-empty with positive values")
    total = float(sum(counts.values()))
    budget = float(budget if budget is not None else total)
    smoothed = {s: (n / total) ** (1.0 / tau) for s, n in counts.items()}
    z = sum(smoothed.values())
    return {s: (w / z) * budget / counts[s] for s, w in smoothed.items()}


def pack_by_token_budget(
    df: DataFrame,
    key_col: str,
    token_count: Column,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Assign each document to a (shard, pack) so packs hold ~``budget``
    tokens — offset-based sequence packing for pretraining batches.

    Within a shard (pmod of the key), documents are ordered by key and
    a running token total assigns each doc to the pack containing its
    start offset: pack_id = floor((running - own_tokens) / budget).
    Packs can overflow by at most one document — the standard
    greedy-offset packing tradeoff, chosen because it is a pure window
    expression (no sequential driver loop, no stateful UDF) and
    deterministic. At cluster scale ``n_shards`` rises with parallelism;
    each shard's cumulative sum is an independent 1-pass window, so the
    operator is one hash shuffle of (key, n_tokens) pairs — the text
    column never moves.
    """
    key = F.col(key_col)
    shard = F.pmod(key, F.lit(n_shards)).alias("shard")
    from pyspark.sql import Window

    slim = df.select(key.alias(key_col), shard, token_count.alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    return slim.withColumn(
        "pack_id",
        F.floor((running - F.col("n_tokens")) / F.lit(float(budget))).cast("bigint"),
    )


def es_priority(key_col: str, weight_col: str) -> Column:
    """The Efraimidis-Spirakis sampling priority round(u^(1/w), 9) with
    u = (md5bucket16(key) + 0.5)/65536 — shared by the batch
    ``weighted_sample`` and the streaming per-shard top-k twin
    (streaming.weighted_topk_stream), so stream and batch rank by the
    IDENTICAL deterministic value."""
    u = (_hash_bucket(F.col(key_col), 65536).cast("double") + F.lit(0.5)) / F.lit(
        65536.0
    )
    return F.round(F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, top-``k``
    by Efraimidis-Spirakis priority (2006): each row draws a keyed
    uniform u in (0, 1) and is ranked by u^(1/w) — the k highest
    priorities form an exact weight-proportional sample (a row with 2x
    the weight has exactly 2x the inclusion odds in the limit), the
    standard training-mix selection when weights are per-document
    quality scores rather than per-source rates (``mixture_sample``).

    Engine-portable randomness: u derives from the same 16-bit md5
    bucket every sampler here uses (u = (bucket + 0.5)/65536, never 0
    or 1), so the selection is reproducible across engines/reruns and
    the DuckDB twin (queries/llm_ops.py docs_weighted_sample) replays
    it value-for-value. Rows with weight NULL, <= 0, or NaN are
    excluded (NaN compares greater than any number in Spark, so an
    unguarded ``w > 0`` filter would let NaN priorities seize the
    top-k slots). Scale shape: narrow projection + TakeOrdered —
    nothing shuffles.

    Usable weight range: u has 16 bits of entropy and priority is
    rounded to 9dp before ranking, so u^(1/w) saturates at the ends —
    for w >~ 1.5e4 the largest-u rows all round to 1.0 (ties then
    resolve key-ascending, quietly degrading the sample toward key
    order), and for w <~ 0.5 the smallest-u rows round to 0.0
    (harmless unless k exceeds the nonzero-priority count). Keep
    weights within roughly [1e-2, 1e4] — per-document quality scores
    naturally do — or rescale; ranking only depends on weight RATIOS,
    so any positive rescale preserves the distribution.

    Output adds ``priority`` (rounded to 9dp; ranking before rounding
    would risk cross-engine tie flips, so the ROUNDED value is the sort
    key) and ``sample_rank``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    pri = es_priority(key_col, weight_col)
    ranked = (
        df.filter((w > 0.0) & ~F.isnan(w))
        .withColumn("priority", pri)
        .orderBy(F.col("priority").desc(), F.col(key_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window  # noqa: PLC0415

    # ORDER MATTERS: the unpartitioned row_number window is safe ONLY
    # because it runs above the `.limit(k)` — a single partition of k
    # rows. Ranking before the limit would funnel the whole corpus
    # through one task's global sort (tests/test_plans.py pins the
    # limit-then-rank shape so a reorder fails loudly).
    rank_w = Window.orderBy(F.col("priority").desc(), F.col(key_col).asc())
    return ranked.withColumn("sample_rank", F.row_number().over(rank_w))


def dsir_bucket_stats(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
):
    """Fit the DSIR importance estimator (Xie et al. 2023,
    arXiv:2302.03169 "Data Selection for Language Models via Importance
    Resampling"): hashed-unigram bucket counts for the raw corpus and
    its target slice, in ONE explode + hash-agg pass whose map-side
    partial counts cap the exchange at ``n_buckets`` rows per task.
    The collect is bounded by ``n_buckets`` — this is the persisted
    estimator artifact (like the BM25 stats row and the unigram LM): a
    deployment fits it once against the target distribution and scores
    any number of raw shards with it.

    Per-bucket importance log-ratios come from the exact integer counts
    with add-one smoothing, fixed as integer micro-nats:
    lr[b] = round(ln(((c_t+1)/(n_t+B)) / ((c_raw+1)/(n_raw+B))) * 1e6).
    ``default_micro`` is the both-unseen ratio — tokens hashing to a
    bucket the fit never saw (possible only when scoring a DIFFERENT
    corpus than the fit) score ln((n_raw+B)/(n_t+B)).
    """
    import math  # noqa: PLC0415

    from multi_report_etl_pipeline_spark.operators.text import words  # noqa: PLC0415

    tok = docs.select(
        target_pred.cast("long").alias("is_t"),
        F.explode(words(F.col(text_col))).alias("token"),
    )
    rows = (
        tok.groupBy(_hash_bucket(F.col("token"), n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c_raw"), F.sum("is_t").alias("c_t"))
        .collect()
    )
    n_raw = sum(int(r["c_raw"]) for r in rows)
    n_t = sum(int(r["c_t"]) for r in rows)
    b = float(n_buckets)

    def lr_micro(c_raw: int, c_t: int) -> int:
        return round(
            math.log(((c_t + 1.0) / (n_t + b)) / ((c_raw + 1.0) / (n_raw + b))) * 1e6
        )

    return {
        "n_buckets": n_buckets,
        "n_raw": n_raw,
        "n_t": n_t,
        "lr_micro": [
            (int(r["bucket"]), lr_micro(int(r["c_raw"]), int(r["c_t"]))) for r in rows
        ],
        "default_micro": lr_micro(0, 0),
    }


def dsir_sample(
    docs: DataFrame,
    target_pred: Column | None = None,
    k: int = 64,
    n_buckets: int = 1024,
    stats=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR data selection: keep the ``k`` documents whose hashed-unigram
    feature distribution looks most like the target slice. Each doc's
    log importance weight is the sum of its tokens' per-bucket
    log-ratios — exact int64 micro-nat arithmetic, so the value is
    independent of partitioning and engine (the long-cents convention).
    (The paper resamples with Gumbel noise; the deterministic top-k here
    composes with ``weighted_sample`` when sampled — not ranked —
    selection is wanted.)

    Plan shape: the ≤B-row estimator broadcasts into the exploded token
    stream (broadcast hash join — the corpus never shuffles), the
    per-doc sum partial-aggregates map-side so the only exchange
    carries one slim row per document, and the final cut is a
    TakeOrdered top-k ((log_weight DESC, id ASC) — no global sort).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if stats is None:
        if target_pred is None:
            raise ValueError("need target_pred when no fitted stats are passed")
        stats = dsir_bucket_stats(docs, target_pred, n_buckets, text_col)
    from multi_report_etl_pipeline_spark.operators.text import words  # noqa: PLC0415

    spark = docs.sparkSession
    lr = spark.createDataFrame(
        stats["lr_micro"] or [(0, 0)], "bucket int, lr_micro long"
    )
    if not stats["lr_micro"]:
        lr = lr.filter(F.lit(False))
    tok = docs.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("token")
    )
    per = (
        tok.select(
            F.col(id_col), _hash_bucket(F.col("token"), stats["n_buckets"]).alias("bucket")
        )
        .join(F.broadcast(lr), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.coalesce(F.col("lr_micro"), F.lit(stats["default_micro"]))
            ).alias("_s"),
        )
    )
    return (
        per.select(
            F.col(id_col),
            "n_tokens",
            F.round(F.col("_s").cast("double") / F.lit(1000000.0), 6).alias(
                "log_weight"
            ),
        )
        .orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
        .limit(k)
    )
