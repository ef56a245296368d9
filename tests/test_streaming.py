"""Batch/stream parity: each streaming operator drained with
trigger=availableNow over the static events table must agree with its
batch twin (or its exact batch-computable expectation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_report_etl_pipeline_spark import streaming
from multi_report_etl_pipeline_spark.io import read_table
from multi_report_etl_pipeline_spark.queries import events as batch_events
from tests.conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_windowed_counts_parity(spark):
    stream = streaming.read_events_stream(spark, SF_DIR)
    agg = streaming.windowed_counts_stream(stream)
    streaming.run_available_now(agg, "wc_stream", "complete")
    got = spark.table("wc_stream")
    want = batch_events.windowed_counts(spark, SF_DIR)
    cols = ["window_start", "event_type", "cnt", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sessionization_parity(spark):
    stream = streaming.read_events_stream(spark, SF_DIR)
    agg = streaming.sessionization_stream(stream)
    streaming.run_available_now(agg, "sess_stream", "complete")
    got = spark.table("sess_stream")
    want = batch_events.sessionization(spark, SF_DIR)
    cols = ["user_id", "session_start", "n_events", "session_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dedup_stream_drops_nothing_on_unique_keys(spark):
    """event_id is unique in the fixture, so watermark dedup must be a
    row-preserving pass-through."""
    stream = streaming.read_events_stream(spark, SF_DIR)
    deduped = streaming.dedup_stream(stream)
    streaming.run_available_now(deduped, "dedup_stream", "append")
    got = spark.table("dedup_stream").count()
    want = read_table(spark, SF_DIR, "events").count()
    assert got == want


def test_user_totals_stateful(spark):
    stream = streaming.read_events_stream(spark, SF_DIR)
    totals = streaming.user_totals_stream(stream)
    streaming.run_available_now(totals, "totals_stream", "update")
    got = spark.table("totals_stream")
    # update mode: keep the last emitted row per user (one batch -> one row)
    want = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.round(F.sum("value"), 2).alias("value_total"),
        )
    )
    got_rows = {r.user_id: (r.events_seen, round(r.value_total, 2)) for r in got.collect()}
    want_rows = {r.user_id: (r.events_seen, round(r.value_total, 2)) for r in want.collect()}
    assert got_rows == want_rows


def test_streaming_contact_survivors_equals_batch_view(spark):
    """The incrementally-maintained staging layer (min_by survivor agg
    over the lineitem stream) must reproduce the batch
    clean_contacts_primary view row-for-row after an availableNow drain."""
    from multi_report_etl_pipeline_spark.queries.events import (
        streaming_contact_survivors,
    )
    from multi_report_etl_pipeline_spark.queries.reference import (
        QUERIES as REF_QUERIES,
    )

    got = sorted(
        tuple(map(repr, r))
        for r in streaming_contact_survivors(spark, SF_DIR).collect()
    )
    want = sorted(
        tuple(map(repr, r))
        for r in REF_QUERIES["clean_contacts_primary"].fn(spark, SF_DIR).collect()
    )
    assert got == want


def test_interval_join_parity(spark):
    """The watermarked stream-stream interval join drained with
    availableNow must emit exactly the batch interval join's pairs."""
    stream = streaming.read_events_stream(spark, SF_DIR)
    joined = streaming.interval_join_stream(stream)
    streaming.run_available_now(joined, "ij_stream", "append")
    got = spark.table("ij_stream")
    ev = read_table(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    )
    cols = ["purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"]
    assert _rows(got, cols) == _rows(want, cols)
