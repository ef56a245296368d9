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


# ---------------------------------------------------------------------------
# Selection-based NTILE (VERDICT r7 item 3): bucket assignment WITHOUT any
# global sort. NTILE(k) over a total order only needs the k-1 BOUNDARY rows
# — the order statistics at ranks e_1..e_{k-1} (the cumulative SQL bucket
# sizes). Each boundary is found by iterative histogram narrowing (the
# classic distributed exact-selection algorithm): every round is ONE
# partial-aggregate job that histograms all still-unresolved boundaries at
# once (<= n_buckets counters each, driver traffic bounded by
# boundaries x n_buckets longs), shrinking each boundary's candidate value
# interval by ~n_buckets x per round — so an integral metric resolves in
# ceil(log_B(range)) rounds regardless of row count, and custkey
# tie-breaks at a boundary value resolve by the same loop on the tie
# column restricted to that value. Bucket assignment is then a pure
# in-row comparison against the k-1 (value, tie) thresholds: NO shuffle,
# no join, no rank materialization. Value-identical to SQL NTILE with the
# same (value, tie) order — ties at a boundary split exactly where the
# tie-column rank puts them.
# ---------------------------------------------------------------------------


def _sql_ntile_cuts(n_rows: int, k: int) -> list[int]:
    """The 1-based global ranks of the last row of buckets 1..k-1 under
    SQL NTILE sizing (first n_rows%k buckets get one extra row). With
    n_rows < k the trailing empty buckets repeat the previous cut."""
    q, r = divmod(n_rows, k)
    sizes = [q + 1] * r + [q] * (k - r)
    cuts, acc = [], 0
    for s in sizes[: k - 1]:
        acc += s
        cuts.append(acc)
    return cuts


def select_order_statistics(
    df: DataFrame,
    specs: dict,
    n_buckets: int = 2048,
) -> dict:
    """Batched exact order statistics over integral columns.

    ``specs`` maps an opaque key to a dict with:
      - ``value``: Column expression (must be integral, may be negated
        for descending order),
      - ``tie``: tie-break Column name (integral, UNIQUE across rows —
        makes the (value, tie) order total),
      - ``rank``: the 1-based target rank under (value ASC, tie ASC).

    Returns ``{key: (v_star, c_star)}`` where the boundary row is the
    rank-th smallest pair: ``c_star is None`` means every row with
    value ``v_star`` sorts at-or-before the boundary, so the membership
    test collapses to ``value <= v_star`` (the common no-split case);
    otherwise rows with ``value == v_star`` split on ``tie <= c_star``.

    Cost: one min/max seed job + ceil(log_B(value range)) histogram
    rounds (+ the same again on the tie column for boundaries landing
    inside a tied run), each a partial aggregate emitting at most
    |unresolved| x n_buckets rows to the driver. No sort, no shuffle of
    ``df`` itself.
    """
    if not specs:
        return {}
    # Seed job: global min/max per distinct value expression + row count
    # (callers pass rank <= n by contract). Tie min/max seeds phase 2.
    agg_cols = []
    for key, sp in specs.items():
        agg_cols.append(F.min(sp["value"]).alias(f"mn_{key}"))
        agg_cols.append(F.max(sp["value"]).alias(f"mx_{key}"))
        agg_cols.append(F.min(F.col(sp["tie"])).alias(f"tmn_{key}"))
        agg_cols.append(F.max(F.col(sp["tie"])).alias(f"tmx_{key}"))
    seed = df.agg(*agg_cols).collect()[0]

    # Active search state per key. phase "v": narrowing the value
    # interval [lo, hi]; phase "t": value resolved to v_star, narrowing
    # the tie interval among rows with value == v_star.
    state: dict = {}
    out: dict = {}
    for key, sp in specs.items():
        mn, mx = seed[f"mn_{key}"], seed[f"mx_{key}"]
        if mn is None:
            raise ValueError(f"select_order_statistics: no rows for {key!r}")
        state[key] = {
            "phase": "v",
            "pred": None,
            "col": sp["value"],
            "tie": sp["tie"],
            "lo": int(mn),
            "hi": int(mx),
            "before": 0,
            "rank": int(sp["rank"]),
            "tmn": int(seed[f"tmn_{key}"]),
            "tmx": int(seed[f"tmx_{key}"]),
        }

    while state:
        # Resolve any single-point intervals without a job.
        for key in list(state):
            st = state[key]
            if st["lo"] != st["hi"]:
                continue
            if st["phase"] == "v":
                # Value pinned; j = how many tied rows sort at-or-before
                # the boundary. Whether the tied run SPLITS here decides
                # if a tie-column pass is needed — that needs the run's
                # size, which the histogram round that pinned the value
                # recorded in st["cnt"] (the seed min==max degenerate
                # case falls through to one histogram round of width 1).
                cnt = st.get("cnt")
                j = st["rank"] - st["before"]
                if cnt is not None and j >= cnt:
                    # boundary is the LAST row of this tied run: no
                    # split, membership collapses to value <= v_star
                    out[key] = (st["lo"], None)
                    del state[key]
                else:
                    # run splits (or the seed min==max degenerate case,
                    # cnt unknown): find the j-th smallest tie among
                    # rows AT this value by the same narrowing loop.
                    # An uncut run resolves to c_star == max(tie) —
                    # equivalent to the collapsed form, just not
                    # simplified.
                    st.update(
                        phase="t",
                        pred=st["col"] == F.lit(st["lo"]),
                        vstar=st["lo"],
                        col=F.col(st["tie"]),
                        lo=st["tmn"],
                        hi=st["tmx"],
                        before=0,
                        rank=j,
                        cnt=None,
                    )
            else:
                out[key] = (st["vstar"], st["lo"])
                del state[key]
        if not state:
            break

        # One histogram job covering every unresolved boundary: each row
        # contributes (key_index, bucket) for every boundary whose
        # predicate it satisfies and whose interval contains its value.
        keys = list(state)
        widths = {}
        entries = []
        for i, key in enumerate(keys):
            st = state[key]
            span = st["hi"] - st["lo"] + 1
            w = max(1, -(-span // n_buckets))  # ceil
            widths[key] = w
            in_range = st["col"].between(F.lit(st["lo"]), F.lit(st["hi"]))
            if st["pred"] is not None:
                in_range = st["pred"] & in_range
            entries.append(
                F.when(
                    in_range,
                    F.struct(
                        F.lit(i).alias("ki"),
                        # exact long division (`div`): double division can
                        # misbucket once the value span exceeds 2^53
                        F.call_function(
                            "div",
                            (st["col"] - F.lit(st["lo"])).cast("long"),
                            F.lit(w),
                        ).alias("b"),
                    ),
                )
            )
        hist = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .filter(F.col("e").isNotNull())
            .groupBy(F.col("e.ki").alias("ki"), F.col("e.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        by_key: dict[int, list] = {}
        for row in hist:
            by_key.setdefault(row["ki"], []).append((row["b"], row["cnt"]))
        for i, key in enumerate(keys):
            st = state[key]
            w = widths[key]
            target = st["rank"] - st["before"]
            acc = 0
            for b, cnt in sorted(by_key.get(i, [])):
                if acc + cnt >= target:
                    st["before"] += acc
                    st["lo"] = st["lo"] + int(b) * w
                    st["hi"] = min(st["hi"], st["lo"] + w - 1)
                    st["cnt"] = int(cnt) if w == 1 else None
                    break
                acc += cnt
            else:
                raise AssertionError(
                    f"select_order_statistics: rank {st['rank']} beyond "
                    f"row count for {key!r} (histogram exhausted)"
                )
    return out


def ntile_threshold_expr(
    value: Column,
    tie: Column,
    thresholds: list[tuple[int, int | None]],
    descending: bool = False,
) -> Column:
    """NTILE bucket number as a pure in-row expression: 1 + the number
    of boundary thresholds the row sorts strictly AFTER. ``thresholds``
    are ``select_order_statistics`` results in bucket order, computed on
    the NEGATED value column when ``descending`` (pass the ORIGINAL
    column here; the comparison flips accordingly)."""
    score: Column = F.lit(1)
    for v_star, c_star in thresholds:
        v_thresh = -v_star if descending else v_star
        if descending:
            after = value < F.lit(v_thresh)
            at = value == F.lit(v_thresh)
        else:
            after = value > F.lit(v_thresh)
            at = value == F.lit(v_thresh)
        gt = after if c_star is None else (after | (at & (tie > F.lit(c_star))))
        score = score + F.when(gt, 1).otherwise(0)
    return score.cast("int")


def select_cumulative_boundaries(
    df: DataFrame,
    specs: dict,
    n_buckets: int = 2048,
) -> dict:
    """Batched exact WEIGHTED-prefix boundaries — the Pareto/ABC
    selection: under ORDER BY (value ASC, tie ASC), find where the
    running weight sum crosses a rational share of the total, without
    sorting anything.

    ``specs`` maps a key to a dict with:
      - ``value``: integral Column (negate for descending order),
      - ``tie``: unique integral tie-break column name,
      - ``weight``: non-negative integral Column (the summed measure;
        for revenue-share classes this is the revenue itself).
        PRECONDITION: within any tied ``value`` run all rows must carry
        the SAME weight — guaranteed when weight == the ordering value,
        asserted at runtime via ``wsum % cnt == 0`` (necessary, not
        sufficient; callers with independent weights need a different
        split rule),
      - ``a``, ``b``: integers defining membership — a row is IN the
        prefix while ``a * cum_weight <= b * total_weight`` (exact
        integer comparison, same as the window form's boundary test).

    Returns ``{key: (v_star, c_star, j, cnt)}``: the boundary sits in
    the tied run at ``value == v_star``; ``j`` of that run's ``cnt``
    rows (lowest ``tie`` first) are in the prefix, and ``c_star`` is
    the j-th run member's tie value (None when j == 0 or j == cnt —
    no split). Membership test for a row:
      value < v_star, or (value == v_star and (j == cnt or
      (j > 0 and tie <= c_star))).

    Same narrowing loop and cost model as ``select_order_statistics``,
    with per-bucket (count, weight-sum) histograms: one seed aggregate
    (which also produces the exact total), then
    ~ceil(log_B(value range)) rounds, each ONE partial-agg job over
    all unresolved keys. Within a pinned tied run every row carries
    the same weight (= |value| for revenue-ordered-by-revenue), so the
    split index is closed-form and only the j-th-smallest-tie lookup
    recurses (count-based, equal weights)."""
    if not specs:
        return {}
    agg_cols = []
    for key, sp in specs.items():
        agg_cols.append(F.min(sp["value"]).alias(f"mn_{key}"))
        agg_cols.append(F.max(sp["value"]).alias(f"mx_{key}"))
        agg_cols.append(F.sum(sp["weight"]).alias(f"tw_{key}"))
        agg_cols.append(F.min(F.col(sp["tie"])).alias(f"tmn_{key}"))
        agg_cols.append(F.max(F.col(sp["tie"])).alias(f"tmx_{key}"))
    seed = df.agg(*agg_cols).collect()[0]

    state: dict = {}
    out: dict = {}
    for key, sp in specs.items():
        mn = seed[f"mn_{key}"]
        if mn is None:
            raise ValueError(f"select_cumulative_boundaries: no rows for {key!r}")
        state[key] = {
            "phase": "v",
            "pred": None,
            "col": sp["value"],
            "tie": sp["tie"],
            "weight": sp["weight"],
            "lo": int(mn),
            "hi": int(seed[f"mx_{key}"]),
            "wbefore": 0,
            "a": int(sp["a"]),
            "b": int(sp["b"]),
            "total": int(seed[f"tw_{key}"]),
            "tmn": int(seed[f"tmn_{key}"]),
            "tmx": int(seed[f"tmx_{key}"]),
        }

    while state:
        for key in list(state):
            st = state[key]
            if st["lo"] != st["hi"]:
                continue
            if st["phase"] == "v":
                run_cnt, run_w = st.get("cnt"), st.get("wsum")
                if run_cnt is None:
                    # seed min == max: leave the key unresolved for one
                    # histogram round (width 1 over the single point),
                    # which fills in the run's (cnt, wsum)
                    continue
                # per-row weight within the run is uniform ONLY when the
                # weight IS the |value| (revenue ordered by revenue); a
                # caller violating that would get silently-truncated
                # boundaries, so check the cheap necessary condition
                if run_w % run_cnt != 0:
                    raise AssertionError(
                        "select_cumulative_boundaries: tied-value run has "
                        f"non-uniform weights (wsum={run_w}, cnt={run_cnt} "
                        f"for {key!r}) — the closed-form split requires "
                        "weight == ordering value within each run"
                    )
                w_each = run_w // run_cnt
                a, b, tot, wb = st["a"], st["b"], st["total"], st["wbefore"]
                if w_each == 0:
                    j = run_cnt if a * wb <= b * tot else 0
                else:
                    j = (b * tot - a * wb) // (a * w_each)
                    j = max(0, min(run_cnt, j))
                if 0 < j < run_cnt:
                    st.update(
                        phase="t",
                        pred=st["col"] == F.lit(st["lo"]),
                        vstar=st["lo"],
                        col=F.col(st["tie"]),
                        lo=st["tmn"],
                        hi=st["tmx"],
                        before=0,
                        rank=j,
                        j=j,
                        runcnt=run_cnt,
                        cnt=None,
                    )
                else:
                    out[key] = (st["lo"], None, j, run_cnt)
                    del state[key]
            else:
                out[key] = (st["vstar"], st["lo"], st["j"], st["runcnt"])
                del state[key]
        if not state:
            break

        keys = list(state)
        widths = {}
        entries = []
        for i, key in enumerate(keys):
            st = state[key]
            span = st["hi"] - st["lo"] + 1
            w = max(1, -(-span // n_buckets))
            widths[key] = w
            in_range = st["col"].between(F.lit(st["lo"]), F.lit(st["hi"]))
            if st["pred"] is not None:
                in_range = st["pred"] & in_range
            wcol = (
                F.lit(1).cast("long")
                if st["phase"] == "t"
                else st["weight"].cast("long")
            )
            entries.append(
                F.when(
                    in_range,
                    F.struct(
                        F.lit(i).alias("ki"),
                        # exact long division, as in select_order_statistics
                        F.call_function(
                            "div",
                            (st["col"] - F.lit(st["lo"])).cast("long"),
                            F.lit(w),
                        ).alias("b"),
                        wcol.alias("w"),
                    ),
                )
            )
        hist = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .filter(F.col("e").isNotNull())
            .groupBy(F.col("e.ki").alias("ki"), F.col("e.b").alias("b"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("e.w").alias("wsum"),
            )
            .collect()
        )
        by_key: dict[int, list] = {}
        for row in hist:
            by_key.setdefault(row["ki"], []).append(
                (row["b"], row["cnt"], row["wsum"])
            )
        for i, key in enumerate(keys):
            st = state[key]
            w = widths[key]
            if st["phase"] == "t":
                # count-based j-th-smallest-tie narrowing (equal weights)
                target = st["rank"] - st["before"]
                acc = 0
                for b, cnt, _ in sorted(by_key.get(i, [])):
                    if acc + cnt >= target:
                        st["before"] += acc
                        st["lo"] = st["lo"] + int(b) * w
                        st["hi"] = min(st["hi"], st["lo"] + w - 1)
                        break
                    acc += cnt
                else:
                    raise AssertionError(
                        f"cumulative boundary tie rank beyond run for {key!r}"
                    )
                continue
            # weighted narrowing: find the bucket where a*(wbefore+cum)
            # first EXCEEDS b*total — the boundary row lives there
            a, b_, tot = st["a"], st["b"], st["total"]
            accw = 0
            buckets = sorted(by_key.get(i, []))
            chosen = None
            for bk, cnt, wsum in buckets:
                if a * (st["wbefore"] + accw + int(wsum)) > b_ * tot:
                    chosen = (bk, cnt, wsum)
                    break
                accw += int(wsum)
            if chosen is None:
                # the condition never crosses inside this interval: the
                # whole interval stays in the prefix; the boundary is
                # the interval's LAST row
                bk, cnt, wsum = buckets[-1]
                accw -= int(wsum)
                chosen = (bk, cnt, wsum)
            bk, cnt, wsum = chosen
            st["wbefore"] += accw
            st["lo"] = st["lo"] + int(bk) * w
            st["hi"] = min(st["hi"], st["lo"] + w - 1)
            if w == 1:
                st["cnt"], st["wsum"] = int(cnt), int(wsum)
    return out


def cumulative_prefix_expr(
    value: Column,
    tie: Column,
    res: tuple,
    descending: bool = False,
) -> Column:
    """In-row membership test for a ``select_cumulative_boundaries``
    result: True iff the row sorts at-or-before the weighted-prefix
    boundary. Pass the ORIGINAL (un-negated) value column with
    ``descending=True`` when the selection ran on the negated one."""
    v_star, c_star, j, cnt = res
    v_thresh = -v_star if descending else v_star
    before = value > F.lit(v_thresh) if descending else value < F.lit(v_thresh)
    at = value == F.lit(v_thresh)
    if j <= 0:
        return before
    if j >= cnt:
        return before | at
    return before | (at & (tie <= F.lit(c_star)))
