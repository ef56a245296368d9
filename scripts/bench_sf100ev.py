"""Events-only x100 scale probe (round 6).

The sf10 sitting left the events family's ratios floor-flavored:
events.parquet is only ~116 MB at sf10, so DuckDB's denominators stay
cache-resident. This probe replicates the sf10 events table 10x (100M
rows, ~1.1 GB parquet) with disjoint event/user id ranges so the
distinct-user and sessionization cardinalities scale with the data,
then runs the 9 events-family ledger queries on BOTH engines.

    python scripts/bench_sf100ev.py --generate   # build testdata_sf100ev/
    python scripts/bench_sf100ev.py              # run the pairing

Spark: min-of-3 noop sinks after one warm run. DuckDB: median-of-3
fetchall after one warm run, 32 threads. One sitting — cross-sitting
numbers on this VM swing 2-3x and are not decision-grade.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.path.join(REPO_ROOT, "testdata_sf100ev")
SRC = os.path.join(REPO_ROOT, "testdata_sf10", "events.parquet")

QS = [
    "events_windowed_counts",
    "events_gap_filled_hourly",
    "events_binned_percentiles",
    "events_transition_matrix",
    "events_ewma_anomaly",
    "events_hourly_top_users",
    "events_hourly_unique_users",
    "events_session_paths",
    "events_daily_type_unpivot",
]


def generate() -> None:
    import duckdb

    os.makedirs(SF_DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    # Disjoint id offsets per replica keep COUNT(DISTINCT user_id) and
    # per-user session structure data-proportional instead of 10 exact
    # copies of the same users.
    body = (
        "SELECT event_id + i * 100000000 AS event_id, ts, "
        "user_id + i * 1000000 AS user_id, event_type, value, props "
        f"FROM '{SRC}' t, range(10) r(i)"
    )
    con.execute(
        f"COPY ({body}) TO '{SF_DIR}/events.parquet' (FORMAT PARQUET)"
    )
    n, u = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    print(f"rows={n} distinct_users={u}")


def pair() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from multi_report_etl_pipeline_spark.session import get_spark

    reg, osql = entry_mod.queries(), entry_mod.oracle_sql()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="bench_sf100ev")
    spark.sparkContext.setLogLevel("ERROR")
    st: dict[str, float] = {}
    for name in QS:
        fn = reg[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        sm = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sm.append(time.perf_counter() - t0)
        st[name] = min(sm)
        print(f"spark  {name}: {st[name]:.2f}", flush=True)
    spark.stop()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    dt: dict[str, float] = {}
    for name in QS:
        sql = osql[name]
        con.execute(sql).fetchall()
        sm = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            sm.append(time.perf_counter() - t0)
        dt[name] = statistics.median(sm)
        print(f"duckdb {name}: {dt[name]:.2f}", flush=True)

    print(f"\n{'query':32s} {'spark':>7s} {'duckdb':>7s} {'ratio':>6s}")
    for n in QS:
        print(f"{n:32s} {st[n]:7.2f} {dt[n]:7.2f} {st[n] / dt[n]:6.2f}")
    tot_s, tot_d = sum(st.values()), sum(dt.values())
    print(f"{'TOTAL':32s} {tot_s:7.2f} {tot_d:7.2f} {tot_s / tot_d:6.2f}")


if __name__ == "__main__":
    if "--generate" in sys.argv:
        generate()
    else:
        pair()
