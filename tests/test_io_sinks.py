"""Sink parity: CSV export (reference README.md:71-76), partitioned
parquet (the at-scale canonical sink), bucketed tables (the CREATE INDEX
replacement for co-located joins)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark.io import read_table, write_csv, write_parquet
from multi_report_etl_pipeline_spark.queries.reference import QUERIES
from tests.conftest import SF_DIR


def test_csv_export_roundtrip(spark, tmp_path):
    report = QUERIES["report_mortgage_portfolio"].fn(spark, SF_DIR)
    out = str(tmp_path / "mortgage_portfolio_report")
    write_csv(report, out, single_file=True)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert len(files) == 1, "single_file export must produce one csv"
    back = spark.read.option("header", True).csv(out)
    assert back.count() == report.count()
    assert back.columns == report.columns


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    orders = read_table(spark, SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(orders, out, partition_by=["order_year"])
    years = [d for d in os.listdir(out) if d.startswith("order_year=")]
    assert len(years) > 1
    back = spark.read.parquet(out).filter(F.col("order_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "order_year" in plan
    want = orders.filter(F.col("order_year") == 1995).count()
    assert back.count() == want


def test_bucketed_table_join_avoids_shuffle(spark, tmp_path):
    """Bucketed-by-key tables joined on the bucket key need no exchange —
    the Spark replacement for the reference's account_id indexes."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = str(tmp_path / "wh")
    orders = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_parquet(orders, f"{warehouse}/b_orders", bucket_by=(8, ["o_orderkey"]), table_name="b_orders")
    write_parquet(li, f"{warehouse}/b_lineitem", bucket_by=(8, ["l_orderkey"]), table_name="b_lineitem")
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() == li.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
