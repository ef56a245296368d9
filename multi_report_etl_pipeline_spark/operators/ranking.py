"""Distributed exact ranking: global row_number / NTILE without the
single-task sort an unpartitioned ``Window.orderBy`` plans.

An unpartitioned window funnels the whole input through ONE task
(``Exchange SinglePartition`` + one sort) — the classic Spark scale
trap. The distributed-exact alternative used here is the standard
two-pass pattern:

1. ``repartitionByRange`` on the order keys (parallel range shuffle —
   Spark samples split points, but correctness never depends on where
   they fall) + ``sortWithinPartitions``;
2. count rows per partition (a bounded n_partitions-row collect),
   prefix-sum the counts into per-partition rank offsets;
3. per-partition ``row_number`` (parallel — the window partitions on
   ``spark_partition_id``) + the broadcast offset = exact global rank.

NTILE is then pure arithmetic on the rank: with n rows and k buckets,
q = n div k and r = n mod k, SQL NTILE gives the first r buckets q+1
rows and the rest q — reproduced piecewise and exactly (the tempting
closed form floor((rank-1)*k/n)+1 is NOT SQL NTILE: n=6,k=4 puts
rank 4 in bucket 3 instead of 2).

Total order must be made unique by the caller (tiebreak column) or
equal keys may straddle a range boundary nondeterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_RANK = "__rank_global"


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank under ``order_cols`` (must be a total
    order), computed with a parallel range sort instead of a
    single-task window. One extra job counts partition sizes over the
    persisted range-partitioned frame (n_partitions longs cross the
    driver); the frame is unpersisted before returning, so the
    returned plan re-reads the shuffle files, not the source scan.
    """
    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # localCheckpoint, NOT persist+unpersist: repartitionByRange samples
    # its split points with a seed derived from the underlying RDD id,
    # which changes on every physical planning — so two separate actions
    # on the same lineage can land rows in DIFFERENT partitions, and
    # offsets computed by the count job would silently misalign with the
    # caller's later execution (observed as small rank drift under test).
    # Checkpointing materializes one partitioning that both the count job
    # and the returned frame read. The checkpointed state is one narrow
    # projection of the caller's frame, block-distributed per executor.
    ranged = (
        df.repartitionByRange(nparts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # prefix-sum the counts into a dense 1-indexed array literal — a
    # single element_at lookup stays flat at any partition count, where
    # a chained WHEN would nest nparts conditionals in codegen
    offsets_arr = []
    acc = 0
    for pid in range(nparts):
        offsets_arr.append(acc)
        acc += counts.get(pid, 0)
    offset_expr = F.element_at(
        F.array(*[F.lit(o) for o in offsets_arr]), F.col(_PID) + 1
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        ranged.withColumn(
            out_col, (F.row_number().over(w) + offset_expr).cast("bigint")
        )
        .drop(_PID)
    )


def ntile_from_rank(rank: Column, n_rows: int, k: int) -> Column:
    """SQL-exact NTILE(k) from a 1-based global rank, as a literal
    piecewise expression (n_rows is a driver-known count)."""
    q, r = divmod(n_rows, k)
    head = r * (q + 1)
    if q == 0:
        return rank.cast("int")
    return (
        F.when(rank <= F.lit(head), ((rank - 1) / F.lit(q + 1)).cast("int") + 1)
        .otherwise(
            F.lit(r) + ((rank - F.lit(head) - 1) / F.lit(q)).cast("int") + 1
        )
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out_col: str,
    n_rows: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """NTILE(k) OVER (ORDER BY order_cols) without a single-task sort.

    ``n_rows``: pass the already-known row count to skip the extra
    count job (it must equal df's count); otherwise it is derived from
    the same bounded partition-count collect the rank pass runs anyway.
    """
    ranked = with_global_rank(df, order_cols, _RANK, num_partitions)
    if n_rows is None:
        n_rows = df.count()
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col(_RANK), n_rows, k).cast("int")
    ).drop(_RANK)
