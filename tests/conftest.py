"""Shared fixtures: one local SparkSession per test session, plus a
DuckDB-differential comparer that mimics the driver's correctness gate
(row count + schema names + order-insensitive value hash)."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from multi_report_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.parquet.aggregatePushdown": "false"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf in (SF_DIR, SF_DIR_MED):
        schema = "sf_small" if sf == SF_DIR else "sf_med"
        con.execute(f"CREATE SCHEMA {schema}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {schema}.{t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
    yield con
    con.close()


def _canon_value(v):
    """Normalize a cell so Spark and DuckDB values compare equal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(columns, rows):
    """Sort columns by name, stringify cells, sort rows — the same
    canonicalization idea the driver's value-hash uses."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return [c for _, c in sorted(zip(columns, columns))], out


def assert_matches_oracle(spark_df, duck_con, sql: str, schema: str = "sf_small"):
    """Differential check: our Spark result vs DuckDB on the same tables."""
    duck_con.execute(f"SET search_path = '{schema}'")
    duck_res = duck_con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    _, canon_spark = canon_rows(spark_cols, spark_rows)
    _, canon_duck = canon_rows(duck_cols, duck_rows)
    mismatches = [
        (s, d) for s, d in zip(canon_spark, canon_duck) if s != d
    ]
    assert not mismatches, f"value mismatch, first 3: {mismatches[:3]}"
