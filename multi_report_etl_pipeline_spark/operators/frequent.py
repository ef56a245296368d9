"""Exact heavy hitters with bounded state: Misra-Gries candidates +
exact verify.

The trivial exact form (groupBy key HAVING count > n/k) shuffles the
FULL key space — at 100 TB with billions of distinct keys that is the
dominant exchange of the job even though only a handful of keys can
possibly qualify. This operator replaces it with the standard two-pass
sketch-then-verify shape:

pass 1 (candidates) — each partition maintains a Misra-Gries summary of
  at most ``capacity`` counters (Arrow batches merge their exact batch
  counts into the summary, then the summary prunes by subtracting the
  (capacity+1)-th largest count — the mergeable-summaries MERGE of
  Agarwal et al. 2012, which preserves the MG error bound). A key whose
  partition count exceeds n_p/(capacity+1) is guaranteed to survive its
  partition's summary, and summing that bound over partitions gives the
  global guarantee: every key with total count > n/(capacity+1) appears
  in the union of candidates. With ``capacity >= k_inv`` the union is
  therefore a SUPERSET of every key over the n/k_inv threshold. Emitted
  state is <= partitions x capacity keys — bounded at any data size.

pass 2 (verify) — one broadcast left-join tags candidate rows and ONE
  partial-agg pass counts them exactly (non-candidates collapse into a
  single NULL group, so the aggregate state is <= candidates + 1 rows);
  the threshold test is exact integer arithmetic (cnt * k_inv > n — no
  division), making the OUTPUT deterministic and engine-reproducible
  regardless of how the sketch pruned: MG only ever proposes a
  superset, the verify pass decides membership.

Reference surface: none (extension family — frequency analysis beside
operators/text.vocabulary's top-k and the count-min sketch family in
queries/llm_ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k_inv: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact (key, cnt) rows for every key with cnt * k_inv > n, where
    n = total row count of ``df`` — computed without ever shuffling the
    full key space. ``capacity`` (default ``2 * k_inv``) sizes the
    per-partition Misra-Gries summary; it must be >= k_inv for the
    superset guarantee, enforced loudly."""
    import pandas as pd  # noqa: PLC0415

    from collections.abc import Iterator  # noqa: PLC0415

    if capacity is None:
        capacity = 2 * k_inv
    if capacity < k_inv:
        raise ValueError(
            f"capacity {capacity} < k_inv {k_inv}: the Misra-Gries union "
            "would only guarantee keys over n/(capacity+1) — candidates "
            "could miss qualifying keys. Use capacity >= k_inv."
        )
    dtype = dict(df.dtypes)[key_col]

    def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # exact within-batch counts, merged into the running summary
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                dec = vals[capacity]  # the (capacity+1)-th largest
                counters = {
                    k: v - dec for k, v in counters.items() if v - dec > 0
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    cands = (
        df.select(key_col)
        .mapInPandas(mg_candidates, f"{key_col} {dtype}")
        .distinct()
        .withColumn("_cand", F.lit(1))
    )
    # one exact counting pass: candidate keys keep their identity, every
    # other row folds into the NULL group — aggregate state is bounded
    # by the candidate count, not the key cardinality
    tagged = df.select(key_col).join(F.broadcast(cands), key_col, "left")
    agg = tagged.groupBy(
        F.when(F.col("_cand") == 1, F.col(key_col)).alias("_k")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        agg.withColumn("_n", total)
        .filter(F.col("_k").isNotNull() & (F.col("cnt") * k_inv > F.col("_n")))
        .select(F.col("_k").alias(key_col), "cnt")
    )


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k_inv: int,
    capacity: int | None = None,
) -> DataFrame:
    """Per-GROUP exact heavy hitters with bounded state: for every
    group g, the exact (group, key, cnt, n_group) rows of every key
    whose count exceeds n_g / k_inv — without shuffling the full
    (group, key) space. This is the serving path for per-window
    top-user style reports whose exact form shuffles ~|rows| distinct
    pairs (events_hourly_top_users: 95.6M pairs in 100M events at
    sf100ev — the irreducible floor VERDICT r7/r8 documented).

    Same two-pass shape as ``heavy_hitters``, keyed:

    pass 1 — each partition keeps a Misra-Gries summary PER GROUP
      (<= capacity counters each; groups are bounded window keys —
      hours, days — so per-task state is |groups| x capacity). Batch
      counts accumulate vectorized (pandas groupby-sum); a group's
      summary prunes by subtracting its (capacity+1)-th largest count,
      preserving the per-group MG bound.
    pass 2 — per-partition summaries (WITH residual counts) merge per
      group via one bounded groupBy-applyInPandas (the mergeable-
      summaries MERGE: sum counts by key, prune to capacity), so the
      global candidate set is <= |groups| x capacity REGARDLESS of
      partition count — broadcastable at any scale.
    pass 3 (verify) — broadcast candidate pairs, tag, ONE partial-agg
      pass counts candidates exactly per group (non-candidates fold
      into the group's NULL row, which also completes n_g), and the
      exact integer threshold cnt * k_inv > n_g decides membership.

    The OUTPUT is exact and deterministic (the sketch only proposes a
    superset; every key over the threshold is guaranteed into the
    union by the per-group MG bound) — so it sits under a full value
    oracle. NOTE the contract is share > 1/k_inv, not unconditional
    top-k: on pairwise-flat data (every key appearing ~once per group)
    no sub-linear summary can certify a count-1 "top" key, and the
    result is honestly empty."""
    import pandas as pd  # noqa: PLC0415

    from collections.abc import Iterator  # noqa: PLC0415

    if capacity is None:
        capacity = 2 * k_inv
    if capacity < k_inv:
        raise ValueError(
            f"capacity {capacity} < k_inv {k_inv}: candidates could miss "
            "qualifying keys. Use capacity >= k_inv."
        )
    dtypes = dict(df.dtypes)
    schema = (
        f"{group_col} {dtypes[group_col]}, {key_col} {dtypes[key_col]}, "
        "mg_cnt long"
    )

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Merge-and-prune is BATCHED (~500k pending counter rows per
        # cycle), not per-Arrow-batch: a per-batch cycle rebuilt the
        # |groups| x capacity accumulator index thousands of times and
        # put the whole pass at ~1M rows/s/task (measured 105 s on the
        # 100M-row sf100ev fixture); amortizing the index work over
        # ~50 batches and pruning all over-capacity groups in one
        # vectorized groupby brings the pass back to scan speed. The
        # merge schedule does not affect the MG bound (each cycle
        # subtracts at most the (capacity+1)-th largest per group) and
        # never affects OUTPUT values (the verify pass is exact).
        acc: pd.Series | None = None
        pending: list[pd.Series] = []
        pending_rows = 0
        proto: pd.DataFrame | None = None  # zero-row frame carrying dtypes

        def merge() -> None:
            nonlocal acc, pending, pending_rows
            if not pending:
                return
            s = pd.concat(pending).groupby(level=[0, 1], sort=False).sum()
            acc = s if acc is None else acc.add(s, fill_value=0)
            pending, pending_rows = [], 0
            sizes = acc.groupby(level=0, sort=False).size()
            over = sizes[sizes > capacity].index
            if len(over):
                mask = acc.index.get_level_values(0).isin(over)
                sub = acc[mask]
                dec = sub.groupby(level=0, sort=False).transform(
                    lambda g: g.sort_values(ascending=False).iloc[capacity]
                )
                keep = sub > dec
                sub = sub[keep] - dec[keep]
                # pruning can empty a group (or everything, on
                # pairwise-flat data where every count ties the
                # decrement) — keep only non-empty parts so a degraded
                # empty index never poisons the accumulator dtypes
                parts = [p for p in (acc[~mask], sub) if len(p)]
                acc = pd.concat(parts) if parts else None

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if proto is None:
                proto = pdf.iloc[:0][[group_col, key_col]]
            pending.append(pdf.groupby([group_col, key_col], sort=False).size())
            pending_rows += len(pending[-1])
            if pending_rows >= 500_000:
                merge()
        merge()
        base = (
            proto.copy()
            if proto is not None
            else pd.DataFrame({group_col: [], key_col: []})
        )
        if acc is None or not len(acc):
            base["mg_cnt"] = pd.Series(dtype="int64")
            yield base
            return
        out = acc.rename("mg_cnt").reset_index()
        if proto is not None:
            # empty-prune cycles can widen index dtypes; restore the
            # Arrow-facing schema from the input batch's dtypes
            out[group_col] = out[group_col].astype(proto[group_col].dtype)
            out[key_col] = out[key_col].astype(proto[key_col].dtype)
        out["mg_cnt"] = out["mg_cnt"].astype("int64")
        yield out

    def mg_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.groupby(key_col, sort=False)["mg_cnt"].sum()
        if len(s) > capacity:
            dec = s.sort_values(ascending=False).iloc[capacity]
            s = s - dec
            s = s[s > 0]
        out = s.reset_index()[[key_col]]
        out[key_col] = out[key_col].astype(pdf[key_col].dtype)
        out.insert(
            0,
            group_col,
            pd.Series(
                [pdf[group_col].iloc[0]] * len(out),
                dtype=pdf[group_col].dtype,
                index=out.index,
            ),
        )
        return out

    summaries = df.select(group_col, key_col).mapInPandas(mg_partition, schema)
    cands = (
        summaries.groupBy(group_col)
        .applyInPandas(mg_merge, f"{group_col} {dtypes[group_col]}, {key_col} {dtypes[key_col]}")
        .withColumn("_cand", F.lit(1))
    )
    tagged = df.select(group_col, key_col).join(
        F.broadcast(cands), [group_col, key_col], "left"
    )
    agg = tagged.groupBy(
        group_col,
        F.when(F.col("_cand") == 1, F.col(key_col)).alias("_k"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    n_g = Window.partitionBy(group_col)
    return (
        agg.withColumn("_n", F.sum("cnt").over(n_g))
        .filter(F.col("_k").isNotNull() & (F.col("cnt") * k_inv > F.col("_n")))
        .select(
            group_col,
            F.col("_k").alias(key_col),
            "cnt",
            F.col("_n").alias("n_group"),
        )
    )


def bucket_sketch_heavy_hitters(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k_inv: int,
    n_buckets: int = 8192,
) -> DataFrame:
    """Per-group exact heavy hitters via a JVM-side BUCKET-SKETCH
    candidate pass (the count-min idea, one row of buckets per group)
    — same exact output contract as ``grouped_heavy_hitters``
    ((group, key, cnt, n_group) for every key with cnt * k_inv >
    n_group), different candidate machinery chosen for the regime
    where the input is a full-volume event stream:

    pass 1 — ONE codegen scan aggregates (group, xxhash64(key) % B)
      counts: the exchange carries <= |groups| x B cells at any volume,
      and a bucket's count >= any member key's count, so every bucket
      holding a qualifying key necessarily crosses the threshold —
      candidates are a guaranteed SUPERSET (collisions only ever add
      false positives). Group totals fall out of the same aggregate
      (per-group sum over bounded rows), no extra scan.
    pass 2 — broadcast the heavy (group, bucket, n) rows (empty on
      flat data), semi-filter the stream on the SAME hash expression,
      and count survivors exactly; the integer threshold decides.

    Why not the Misra-Gries pass here: ``grouped_heavy_hitters``
    streams every row through an Arrow/pandas boundary, and at 100M
    events (sf100ev) that pass measured 37-105 s against the exact
    twin's 10.9 s — the Python crossing itself is the floor, not the
    summary maintenance. The bucket sketch keeps pass 1 inside
    whole-stage codegen. MG remains the right shape when the input is
    already a bounded aggregate or when |groups| x B state would
    exceed the map-side hash budget (B scales per deployment)."""
    hb = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).alias("_b")
    ba = df.select(group_col, hb).groupBy(group_col, "_b").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    n_g = Window.partitionBy(group_col)
    heavy_buckets = (
        ba.withColumn("_n", F.sum("_bc").over(n_g))
        .filter(F.col("_bc") * k_inv > F.col("_n"))
        .select(group_col, "_b", "_n")
    )
    left = df.select(group_col, key_col).alias("_l")
    cand_rows = left.join(
        F.broadcast(heavy_buckets.alias("_hb")),
        (F.col(f"_l.{group_col}") == F.col(f"_hb.{group_col}"))
        & (
            F.pmod(F.xxhash64(F.col(f"_l.{key_col}")), F.lit(n_buckets))
            == F.col("_hb._b")
        ),
    ).select(
        F.col(f"_l.{group_col}").alias(group_col),
        F.col(f"_l.{key_col}").alias(key_col),
        F.col("_hb._n").alias("_n"),
    )
    return (
        cand_rows.groupBy(group_col, key_col)
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("_n").alias("n_group"))
        .filter(F.col("cnt") * k_inv > F.col("n_group"))
        .select(group_col, key_col, "cnt", "n_group")
    )
