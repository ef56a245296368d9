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
        acc: pd.Series | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cnts = pdf.groupby([group_col, key_col], sort=False).size()
            acc = cnts if acc is None else acc.add(cnts, fill_value=0)
            sizes = acc.groupby(level=0, sort=False).size()
            over = sizes[sizes > capacity].index
            if len(over):
                parts = []
                for g in over:
                    s = acc.loc[g]
                    dec = s.sort_values(ascending=False).iloc[capacity]
                    s = s - dec
                    parts.append((g, s[s > 0]))
                keep = acc.drop(index=list(over), level=0)
                fixed = pd.concat(
                    {g: s for g, s in parts}, names=[group_col, key_col]
                )
                acc = pd.concat([keep, fixed])
        if acc is None or not len(acc):
            yield pd.DataFrame(
                {group_col: [], key_col: [], "mg_cnt": []}
            ).astype({"mg_cnt": "int64"})
            return
        out = acc.rename("mg_cnt").reset_index()
        out["mg_cnt"] = out["mg_cnt"].astype("int64")
        yield out

    def mg_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.groupby(key_col, sort=False)["mg_cnt"].sum()
        if len(s) > capacity:
            dec = s.sort_values(ascending=False).iloc[capacity]
            s = s - dec
            s = s[s > 0]
        out = s.reset_index()[[key_col]]
        out[group_col] = pdf[group_col].iloc[0]
        return out[[group_col, key_col]]

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
