"""Round-10 decomposition probes (VERDICT r9 items 2/4/5/7): staged
plans that split a weak row's cost into scan / join / agg layers, all
timed interleaved in ONE session (min-of-3 per stage, stages rotated
per rep so a slow-box episode hits every stage equally).

Usage:
    python scripts/probe_r10.py q3     [sf_dir]   # default testdata_sf100
    python scripts/probe_r10.py q21    [sf_dir]
    python scripts/probe_r10.py gapfill [sf_dir]  # default testdata_sf100ev
    python scripts/probe_r10.py hll    [sf_dir]   # default testdata_sf100ev

Each probe prints per-stage minima and a DuckDB-paired floor where the
stage has a clean SQL twin (aggregate consumption on both sides — a
fetchall of 300M rows would measure the client, not the engine).
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

REPS = 3


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed_stages(stages: dict[str, object]) -> dict[str, float]:
    """Interleaved min-of-REPS: one full rotation of every stage per
    rep, so global load episodes spread across stages."""
    mins: dict[str, float] = {}
    for name, df in stages.items():  # warm each plan once, untimed
        _force(df)
        mins[name] = float("inf")
    for _ in range(REPS):
        for name, df in stages.items():
            t0 = time.perf_counter()
            _force(df)
            mins[name] = min(mins[name], time.perf_counter() - t0)
    return {k: round(v, 3) for k, v in mins.items()}


def _duck(sf_dir: str, probes: dict[str, str]) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out: dict[str, float] = {}
    for name, sql in probes.items():
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def probe_q3(sf_dir: str) -> None:
    from multi_report_etl_pipeline_spark.queries import tpch
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-q3")
    spark.sparkContext.setLogLevel("ERROR")

    li = tpch._fact(spark, sf_dir, "lineitem", "bucketed").filter(  # noqa: SLF001
        F.col("l_shipdate") >= F.lit("1998-01-02 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    # consume via aggregation (noop still pays row batch iteration; the
    # agg twin is what DuckDB can pair with)
    li_agg = li.agg(
        F.sum("l_orderkey").alias("a"), F.sum("l_extendedprice").alias("b"),
        F.sum("l_discount").alias("c"), F.count(F.lit(1)).alias("n"),
    )
    from multi_report_etl_pipeline_spark.io import read_table

    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        tpch._fact(spark, sf_dir, "orders", "bucketed")  # noqa: SLF001
        .filter(F.col("o_orderdate")
                < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"),
              "left_semi")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    join_agg = joined.agg(F.count(F.lit(1)).alias("n"),
                          F.sum("l_extendedprice").alias("b"))
    full = tpch.q3_shipping_priority(spark, sf_dir, layout="bucketed")

    stages = {
        "scan_noop": li,
        "scan_agg": li_agg,
        "orders_prune": orders,
        "join_agg": join_agg,
        "full_q3": full,
    }
    print("spark stages:", _timed_stages(stages), flush=True)
    duck = _duck(sf_dir, {
        "scan_agg": """
            SELECT SUM(l_orderkey), SUM(l_extendedprice), SUM(l_discount),
                   COUNT(*)
            FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-02'""",
        "join_agg": """
            SELECT COUNT(*), SUM(l_extendedprice)
            FROM lineitem
            JOIN (SELECT o_orderkey FROM orders
                  JOIN customer ON o_custkey = c_custkey
                  WHERE o_orderdate < TIMESTAMP '1998-01-01'
                    AND c_mktsegment = 'BUILDING') o
              ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1998-01-02'""",
    })
    print("duckdb stages:", duck, flush=True)
    spark.stop()


def probe_q21(sf_dir: str) -> None:
    from multi_report_etl_pipeline_spark.queries import tpch
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-q21")
    spark.sparkContext.setLogLevel("ERROR")

    orders = tpch._fact(spark, sf_dir, "orders", "bucketed").filter(  # noqa: SLF001
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = tpch._fact(spark, sf_dir, "lineitem", "bucketed").select(  # noqa: SLF001
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    join_agg = lines.agg(F.count(F.lit(1)).alias("n"),
                         F.sum(F.col("late").cast("int")).alias("nl"))
    pairs = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late"),
        F.sum(F.col("late").cast("int")).alias("late_lines"),
    )
    pairs_agg = pairs.agg(F.count(F.lit(1)).alias("n"),
                          F.sum("late_lines").alias("ll"))
    full = tpch.q21_suppliers_kept_waiting(spark, sf_dir, layout="bucketed")
    stages = {
        "li_scan": li,
        "join_agg": join_agg,
        "pairs_agg": pairs_agg,
        "full_q21": full,
    }
    print("spark stages:", _timed_stages(stages), flush=True)
    duck = _duck(sf_dir, {
        "join_agg": """
            SELECT COUNT(*),
                   SUM(CASE WHEN l_shipdate > o_orderdate
                                 + INTERVAL 60 DAY THEN 1 ELSE 0 END)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'""",
        "pairs_agg": """
            WITH pairs AS (
                SELECT l_orderkey, l_suppkey,
                       SUM(CASE WHEN l_shipdate > o_orderdate
                                     + INTERVAL 60 DAY THEN 1 ELSE 0 END)
                           AS late_lines
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY 1, 2)
            SELECT COUNT(*), SUM(late_lines) FROM pairs""",
    })
    print("duckdb stages:", duck, flush=True)
    spark.stop()


def probe_gapfill(sf_dir: str) -> None:
    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.queries import events as ev_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-gapfill")
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_table(spark, sf_dir, "events")
    tl = F.col("ts").cast("timestamp_ltz").cast("long")
    hour = tl - F.pmod(tl, F.lit(3600))
    # (a) hour-only agg: the scan + hash-agg floor with a LONG key
    agg_hour = ev.groupBy(hour.alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("av"))
    # (b) the query's real pre-aggregate: (hour, STRING type) key
    agg_str = ev.groupBy(hour.alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("av"))
    # (c) dict-encoded key: (hour, INT idx) — the transition-matrix
    # trick applied to the partial agg's hash key
    types = ev_mod._event_type_dict(spark, sf_dir)  # noqa: SLF001
    dict_arr = F.array(*[F.lit(t) for t in types])
    agg_int = ev.groupBy(
        hour.alias("h"),
        F.array_position(dict_arr, F.col("event_type")).alias("ti"),
    ).agg(F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("av"))
    full = ev_mod.events_gap_filled_hourly(spark, sf_dir)
    stages = {
        "agg_hour_only": agg_hour,
        "agg_hour_strtype": agg_str,
        "agg_hour_inttype": agg_int,
        "full_gapfill": full,
    }
    print("spark stages:", _timed_stages(stages), flush=True)
    duck = _duck(sf_dir, {
        "agg_hour_strtype": """
            SELECT date_trunc('hour', ts) AS h, event_type,
                   COUNT(*), AVG(value)
            FROM events GROUP BY 1, 2""",
    })
    print("duckdb stages:", duck, flush=True)
    spark.stop()


def probe_hll(sf_dir: str) -> None:
    from multi_report_etl_pipeline_spark.io import read_table
    from multi_report_etl_pipeline_spark.queries import llm_ops
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-hll")
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_table(spark, sf_dir, "events")
    tl = F.col("ts").cast("timestamp_ltz").cast("long")
    hour = tl - F.pmod(tl, F.lit(3600))
    floor = ev.groupBy(hour.alias("h")).agg(F.count(F.lit(1)).alias("n"))

    def sketch(mode: str):
        spark.conf.set("spark.sql.graft.hllHash", mode)
        df = llm_ops.events_hourly_uniques_sketch(spark, sf_dir)
        spark.conf.unset("spark.sql.graft.hllHash")
        return df

    stages = {
        "scan_floor_count_by_hour": floor,
        "sketch_md5": sketch("md5"),
        "sketch_xxhash64": sketch("xxhash64"),
        "sketch_rawbits": sketch("raw"),
    }
    print("spark stages:", _timed_stages(stages), flush=True)
    duck = _duck(sf_dir, {
        "scan_floor_count_by_hour": """
            SELECT date_trunc('hour', ts) AS h, COUNT(*)
            FROM events GROUP BY 1""",
        "md5_derive_only": """
            SELECT COUNT(DISTINCT CAST('0x' ||
                substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) >> 40)
            FROM events""",
    })
    print("duckdb stages:", duck, flush=True)
    spark.stop()


def main() -> None:
    mode = sys.argv[1]
    default = {
        "q3": "testdata_sf100", "q21": "testdata_sf100",
        "gapfill": "testdata_sf100ev", "hll": "testdata_sf100ev",
    }[mode]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO_ROOT, default)
    {"q3": probe_q3, "q21": probe_q21,
     "gapfill": probe_gapfill, "hll": probe_hll}[mode](sf_dir)


if __name__ == "__main__":
    main()
