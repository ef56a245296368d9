"""As-of (point-in-time) join and time-range join — operators Spark has
no native form for, built as compositions of existing DataFrame ops
(per the brief's custom-operator ladder: composition first).

as-of join strategy (backward direction):
  union the left and right rows tagged by side, sort within each key by
  (ts, side), and carry the most recent right-side payload forward with
  ``last(..., ignorenulls=True)`` over a rows-unbounded-preceding window.
  One shuffle on the key + one sort — the same cost as a window dedup,
  no range explosion, no skewed inequality join. This is the standard
  scalable rewrite; DuckDB's native ASOF JOIN is the differential oracle.

range join strategy:
  equi-join on the key plus an inequality on timestamps. Spark executes
  this as a hash join on the key with the range as a post-filter, which
  is right when keys are selective; for low-selectivity keys at 100 TB,
  ``binned_range_join`` buckets timestamps into bins and equi-joins on
  (key, bin) so a hot key cannot concentrate its whole history on one
  task — semantics pinned identical to ``range_join``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Integer microseconds for bin arithmetic, timezone-independent for
    both timestamp flavors. TIMESTAMP (LTZ) is an instant — unix_micros
    reads it directly. TIMESTAMP_NTZ is a zoneless wall clock: casting
    it to LTZ would apply the session-zone offset, which cancels between
    left and right only under FIXED-offset zones — under a DST-observing
    session zone, rows on opposite sides of a transition shift by
    different offsets, drifting bin assignment and the residual range
    predicate away from ``range_join``'s raw-timestamp comparison. NTZ
    therefore computes wall-clock micros since the NTZ epoch via
    ``timestamp_diff``, which never consults the session zone (test:
    DST-spanning parity pin in tests/test_asof.py)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(ts_col),
        )
    return F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (or < when strict) within the same key.

    ``payload``: right column -> output alias. Right rows must be unique
    per (key, right_ts); pre-aggregate if not (determinism requirement).
    """
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts before left on ts ties
        *[F.col(src).alias(f"_p_{dst}") for src, dst in payload.items()],
    )
    l = left.select(
        "*",
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r.schema[f"_p_{dst}"].dataType).alias(f"_p_{dst}") for dst in payload.values()],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if strict:
        # left rows at ts must NOT see right rows at the same ts
        order = [F.col("_ts").asc(), (-F.col("_side")).asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_p_{dst}", ignorenulls=True).over(w).alias(dst)
            for dst in payload.values()
        ],
    )
    drop = ["_k", "_ts", "_side"] + [f"_p_{dst}" for dst in payload.values()]
    return carried.filter(F.col("_side") == 1).drop(*drop)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Rows of right within [left_ts - lower, left_ts + upper) per left
    row, joined on the key. lower/upper are interval Columns."""
    lk, rk = F.col(f"l.{key}"), F.col(f"r.{key}")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return left.alias("l").join(
        right.alias("r"),
        (lk == rk) & (rts >= lts - lower) & (rts < lts + upper),
    )


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bin_width_s: float = 3600.0,
) -> DataFrame:
    """``range_join`` rewritten for low-selectivity keys: timestamps are
    bucketed into ``bin_width_s``-wide bins, each left row is expanded to
    every bin its [left_ts - lower_s, left_ts + upper_s) window overlaps
    (⌈window/bin⌉+1 rows, a small constant), and the join becomes an
    EQUI-join on (key, bin) with the exact range predicate as a residual
    filter. A key with millions of rows spreads over its time bins
    instead of hashing to one task, and the per-task candidate set is
    bounded by rows-per-(key, bin) — pick ``bin_width_s`` ≈ the window
    size. Output rows are identical to ``range_join`` (tests pin it).

    ``lower_s``/``upper_s`` are seconds (the interval form of
    ``range_join`` expressed numerically so bin arithmetic stays exact
    in integer microseconds)."""
    w_us = int(bin_width_s * 1_000_000)
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)
    l = left.withColumn("_lus", _epoch_us(left, left_ts))
    l = l.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((F.col("_lus") - F.lit(lo_us)) / F.lit(w_us)),
                F.floor((F.col("_lus") + F.lit(hi_us) - F.lit(1)) / F.lit(w_us)),
            )
        ),
    )
    r = right.withColumn("_rus", _epoch_us(right, right_ts)).withColumn(
        "_bin", F.floor(F.col("_rus") / F.lit(w_us))
    )
    lk, rk = F.col(f"l.{key}"), F.col(f"r.{key}")
    joined = l.alias("l").join(
        r.alias("r"),
        (lk == rk)
        & (F.col("l._bin") == F.col("r._bin"))
        & (F.col("r._rus") >= F.col("l._lus") - F.lit(lo_us))
        & (F.col("r._rus") < F.col("l._lus") + F.lit(hi_us)),
    )
    return joined.drop("_lus", "_rus").drop(F.col("l._bin")).drop(F.col("r._bin"))
