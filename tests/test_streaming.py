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


def test_user_totals_recovers_state_from_checkpoint(spark, tmp_path):
    """The exactly-once story a deployment leans on: kill a stateful
    stream after it has processed part of the input, then resume FROM
    THE CHECKPOINT with a freshly-built query (new source, new sink —
    a process restart). The resumed run must (a) restore the state
    store — cumulative totals include pre-kill events it never read,
    (b) restore source offsets — already-committed files are NOT
    reprocessed (users only present pre-kill are not re-emitted in
    update mode), and (c) end exactly hash-equal to the batch oracle
    over the full input."""
    import datetime

    in_dir, ck = str(tmp_path / "landing"), str(tmp_path / "ckpt")

    def ev(eid, uid, minute, value):
        return (
            eid,
            datetime.datetime(2026, 1, 1, 10, minute),
            uid,
            "click",
            float(value),
            "{}",
        )

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    phase1 = [ev(1, 1, 0, 10.0), ev(2, 1, 1, 5.0), ev(3, 2, 2, 7.0)]
    phase2 = [ev(4, 2, 3, 1.0), ev(5, 3, 4, 2.0)]
    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("append").parquet(
        in_dir
    )

    def drain(_name):
        # rebuilt from scratch each call: a genuine restart, only the
        # checkpoint carries over. Sink is foreachBatch — the sink kind
        # that supports checkpoint recovery (the memory sink refuses in
        # update mode).
        emitted: dict[int, tuple[int, float]] = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                emitted[r.user_id] = (r.events_seen, r.value_total)

        stream = spark.readStream.schema(schema).parquet(in_dir)
        totals = streaming.user_totals_stream(stream)
        q = (
            totals.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    got1 = drain("ckpt_phase1")
    assert got1 == {1: (2, 15.0), 2: (1, 7.0)}

    # the stream is dead; new files land; resume from the checkpoint
    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(
        in_dir
    )
    got2 = drain("ckpt_phase2")
    # (b) no reprocessing: user 1 has no phase-2 events, so update mode
    # must not re-emit it
    assert 1 not in got2
    # (a) state recovery: user 2's total spans BOTH phases though this
    # run only read the phase-2 file
    assert got2[2] == (2, 8.0)
    assert got2[3] == (1, 2.0)

    # (c) merged view equals the batch aggregate over the full input
    merged = {**got1, **got2}
    want = {
        r.user_id: (r.cnt, r.total)
        for r in spark.read.parquet(in_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert merged == want


def test_snapshot_merge_resumes_from_checkpoint(spark, tmp_path):
    """Same restart contract for the streaming MERGE: after a kill, the
    resumed complete-mode aggregation must still hold every key from
    the pre-kill files (state store recovery), apply latest-wins over
    keys spanning the restart, and equal the batch merge over the full
    input."""
    in_dir, ck = str(tmp_path / "orders_landing"), str(tmp_path / "orders_ckpt")
    schema = "o_orderkey long, o_totalprice double"
    spark.createDataFrame(
        [(7, 100.0), (13, 50.0), (2, 30.0)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    def drain(table_name):
        stream = spark.readStream.schema(schema).parquet(in_dir)
        merged = streaming.snapshot_merge_stream(stream)
        q = (
            merged.writeStream.format("memory")
            .queryName(table_name)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r.o_orderkey: (str(r.s.price), r.s.version, r.s.deleted)
            for r in spark.table(table_name).collect()
        }

    got1 = drain("merge_phase1")
    # key 7 (divisible by 7): update applied; key 13: tombstoned base? no
    # — 13 % 7 != 0, single base row; 2: base row
    assert got1[7] == ("110.00", 2, False)
    assert got1[13] == ("50.00", 1, False)
    assert got1[2] == ("30.00", 1, False)

    spark.createDataFrame([(91, 10.0), (3, 20.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    got2 = drain("merge_phase2")
    # complete mode after restart: pre-kill keys still present (state
    # recovered), new keys merged in; 91 = 7*13 gets update AND tombstone
    assert got2[7] == ("110.00", 2, False)
    assert got2[2] == ("30.00", 1, False)
    assert got2[91] == ("20.00", 2, True)
    assert got2[3] == ("20.00", 1, False)
    assert len(got2) == 5


def test_streaming_weighted_sample_equals_batch(spark):
    """The per-shard top-k state machine must reproduce the batch
    Efraimidis-Spirakis selection EXACTLY (deterministic md5
    priorities): same rows, same priorities, same ranks."""
    from multi_report_etl_pipeline_spark.queries.events import (
        QUERIES as EV_QUERIES,
    )
    from multi_report_etl_pipeline_spark.queries.llm_ops import (
        QUERIES as LLM_QUERIES,
    )

    got = EV_QUERIES["streaming_weighted_sample"].fn(spark, SF_DIR)
    want = LLM_QUERIES["docs_weighted_sample"].fn(spark, SF_DIR)
    cols = ["doc_id", "lang", "source", "weight", "priority", "sample_rank"]
    assert got.columns == want.columns == cols
    assert _rows(got, cols) == _rows(want, cols)


def test_weighted_topk_state_is_bounded(spark):
    """Each shard's emitted rows per batch never exceed k, and the
    drained table's final state holds at most n_shards * k rows — the
    state-boundedness contract that makes the operator scale."""
    docs = streaming.read_documents_stream(spark, SF_DIR).select(
        "doc_id",
        "lang",
        "source",
        (F.col("n_chars") / F.lit(100.0)).alias("weight"),
    )
    streaming.run_available_now(
        streaming.weighted_topk_stream(docs, k=5, n_shards=4),
        "wtopk_bound_stream",
        "update",
    )
    t = spark.table("wtopk_bound_stream")
    per = {
        (r["shard"], r["seq"]): r["n"]
        for r in t.groupBy("shard", "seq").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per and all(n <= 5 for n in per.values()), per
    assert len({s for s, _ in per}) <= 4


def test_weighted_topk_resumes_from_checkpoint(spark, tmp_path):
    """Restart contract for the streaming top-k sampler: kill after
    phase 1, land new files, resume from the checkpoint with a rebuilt
    query. The resumed run must (a) restore per-shard top-k state (its
    final top-k retains phase-1 docs it never read), (b) not reprocess
    committed files (a shard with no phase-2 arrivals is not
    re-emitted), and (c) finish with each touched shard's top-k equal
    to the batch computation over the FULL input."""
    from pyspark.sql import functions as F

    from multi_report_etl_pipeline_spark.operators import sampling

    in_dir, ck = str(tmp_path / "docs_landing"), str(tmp_path / "docs_ckpt")
    schema = "doc_id long, lang string, source string, n_chars long"
    K, SHARDS = 3, 2

    def docs(ids):
        return [(i, "en", "src", 100 + 7 * i) for i in ids]

    spark.createDataFrame(docs(range(10)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    def drain():
        emitted = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                emitted.setdefault(r.shard, {})[r.seq] = emitted.get(
                    r.shard, {}
                ).get(r.seq, [])
                emitted[r.shard][r.seq].append((r.doc_id, r.priority))

        stream = spark.readStream.schema(schema).parquet(in_dir).select(
            "doc_id",
            "lang",
            "source",
            (F.col("n_chars") / F.lit(100.0)).alias("weight"),
        )
        q = (
            streaming.weighted_topk_stream(stream, k=K, n_shards=SHARDS)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    got1 = drain()
    assert set(got1) == {0, 1}

    # only even doc_ids land in phase 2 -> shard 1 gets no arrivals
    spark.createDataFrame(docs([10, 12, 14]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    got2 = drain()
    assert 1 not in got2  # (b) shard 1 untouched, not re-emitted

    # (a)+(c): shard 0's final emission equals the batch top-k over ALL
    # its docs, including phase-1 rows this run never read
    full = spark.createDataFrame(
        docs(list(range(10)) + [10, 12, 14]), schema
    ).select(
        "doc_id", (F.col("n_chars") / F.lit(100.0)).alias("weight")
    ).withColumn("priority", sampling.es_priority("doc_id", "weight"))
    want0 = [
        (r["doc_id"], r["priority"])
        for r in full.filter(F.col("doc_id") % SHARDS == 0)
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        .limit(K)
        .collect()
    ]
    final0 = got2[0][max(got2[0])]
    assert sorted(final0) == sorted(want0), (final0, want0)


def test_transitions_chain_across_batches_via_state(spark, tmp_path):
    """The transition op's core claim: the remembered last event per
    user PAIRS ACROSS micro-batches. Land file 1, drain, land file 2,
    resume from the checkpoint — the bridging transition (last event of
    phase 1 -> first event of phase 2) must be emitted by the second
    drain, and the union of both drains must equal the batch LEAD
    pairing over the full input."""
    import datetime

    in_dir, ck = str(tmp_path / "landing"), str(tmp_path / "ckpt")

    def ev(eid, uid, minute, etype):
        return (
            eid,
            datetime.datetime(2026, 1, 1, 10, minute),
            uid,
            etype,
            1.0,
            "{}",
        )

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    phase1 = [ev(1, 1, 0, "view"), ev(2, 1, 1, "click"), ev(3, 2, 2, "signup")]
    phase2 = [ev(4, 1, 3, "purchase"), ev(5, 2, 4, "error")]
    spark.createDataFrame(phase1, schema).coalesce(1).write.mode("append").parquet(
        in_dir
    )

    def drain():
        emitted: list[tuple[str, str]] = []

        def sink(batch_df, _bid):
            emitted.extend(
                (r.event_type, r.next_type) for r in batch_df.collect()
            )

        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            streaming.transitions_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    got1 = drain()
    assert sorted(got1) == [("view", "click")]

    spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(
        in_dir
    )
    got2 = drain()
    # the bridging pairs: phase-1 tails -> phase-2 heads, via state only
    assert sorted(got2) == [("click", "purchase"), ("signup", "error")]

    # union equals the batch LEAD pairing over the full input
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        spark.read.parquet(in_dir)
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    want = sorted((r.event_type, r.next_type) for r in batch.collect())
    assert sorted(got1 + got2) == want


def test_quality_counters_resume_from_checkpoint(spark, tmp_path):
    """The live data-quality monitor must survive a restart: land a
    commit with violations, drain, kill, land another, resume from the
    checkpoint — the complete-mode counters must span BOTH phases
    without reprocessing the first file's rows twice."""
    import datetime

    from pyspark.sql import functions as F

    in_dir, ck = str(tmp_path / "landing"), str(tmp_path / "ckpt")
    d = datetime.datetime(2026, 1, 1)
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    phase1 = [(1, 10, "O", 10.0, d, "x"), (2, 10, "X", 5.0, d, "x")]
    phase2 = [(3, 10, "O", 0.0, d, "x"), (4, 10, "X", 2.0, d, "x")]
    spark.createDataFrame(phase1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    rules = {
        "bad_status": F.col("o_orderstatus") != "O",
        "nonpositive_price": F.col("o_totalprice") <= 0,
    }

    def drain():
        from multi_report_etl_pipeline_spark import streaming

        got = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                got.update(n=r["_n"], **{k: r[f"_v_{k}"] for k in rules})

        st = spark.readStream.schema(
            streaming.ORDERS_QUALITY_SCHEMA
        ).parquet(in_dir)
        agg = st.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.when(p, 1).otherwise(0)).alias(f"_v_{k}")
                for k, p in rules.items()
            ],
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    got1 = drain()
    assert got1 == {"n": 2, "bad_status": 1, "nonpositive_price": 0}
    spark.createDataFrame(phase2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    got2 = drain()
    # counters span both phases via the recovered state store
    assert got2 == {"n": 4, "bad_status": 2, "nonpositive_price": 1}


def test_scd2_stream_closes_intervals_across_restart(spark, tmp_path):
    """The open-interval state must survive a restart: an interval whose
    change point arrived before the kill and whose closing change
    arrives after must be emitted exactly once, with valid_from from the
    pre-kill batch. Total output equals the batch LAG/LEAD build over
    the full input, restricted to closed intervals."""
    import pandas as pd

    in_dir, ck = str(tmp_path / "ev_landing"), str(tmp_path / "ev_ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def ts(s):
        return pd.Timestamp(s).to_pydatetime()

    batch1 = [
        (1, ts("2024-01-01 00:00:00"), 1, "view"),
        (2, ts("2024-01-01 00:10:00"), 1, "view"),
        (3, ts("2024-01-01 00:20:00"), 1, "click"),
        (4, ts("2024-01-01 00:05:00"), 2, "signup"),
    ]
    batch2 = [
        (5, ts("2024-01-01 00:30:00"), 1, "view"),
        (6, ts("2024-01-01 00:40:00"), 2, "purchase"),
        (7, ts("2024-01-01 00:50:00"), 2, "purchase"),
        (8, ts("2024-01-01 01:00:00"), 2, "error"),
    ]

    out_dir = str(tmp_path / "scd2_out")

    def drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(schema).parquet(in_dir)
        # file sink, not memory: the memory sink cannot recover an
        # append query from a checkpoint — and a parquet landing zone is
        # the production shape for emitted SCD2 facts anyway
        q = (
            streaming.scd2_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us)
            for r in spark.read.parquet(out_dir).collect()
        }

    got1 = drain(batch1)
    # user 1: view[00:00 -> 00:20) closed by the click; click still open.
    # user 2: signup still open. Nothing else may be emitted.
    us = lambda s: int(pd.Timestamp(s).value // 1000)  # noqa: E731
    assert got1 == {
        (1, "view", us("2024-01-01 00:00:00"), us("2024-01-01 00:20:00")),
    }

    got2 = drain(batch2)
    # restart: user 1's open click (from pre-kill state) closes at 00:30;
    # user 2's open signup closes at 00:40, purchase run closes at 01:00.
    # (the file sink accumulates, so phase-1's interval is still there)
    assert got2 == got1 | {
        (1, "click", us("2024-01-01 00:20:00"), us("2024-01-01 00:30:00")),
        (2, "signup", us("2024-01-01 00:05:00"), us("2024-01-01 00:40:00")),
        (2, "purchase", us("2024-01-01 00:40:00"), us("2024-01-01 01:00:00")),
    }


def test_scd2_current_stream_recovers_open_segment_start(spark, tmp_path):
    """The CURRENT-view twin must carry the open segment's start across
    a restart: a user whose post-restart rows have the SAME type as the
    pre-kill open interval must keep the pre-kill valid_from (state
    loss would restart the segment at the new batch's first ts). The
    emissions land in an append log (the production shape for an
    update stream without an update-capable sink) and the latest row
    per user is recovered with the same deterministic
    (valid_from_us, from_event_id) max the registered query uses."""
    import pandas as pd

    in_dir, ck = str(tmp_path / "ev_landing"), str(tmp_path / "ev_ckpt")
    out_dir = str(tmp_path / "cur_out")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def ts(s):
        return pd.Timestamp(s).to_pydatetime()

    batch1 = [
        (1, ts("2024-01-01 00:00:00"), 1, "view"),
        (2, ts("2024-01-01 00:20:00"), 1, "click"),
        (3, ts("2024-01-01 00:07:00"), 3, "browse"),
    ]
    batch2 = [
        # same type as user 3's open interval: valid_from must stay 00:07
        (4, ts("2024-01-01 00:45:00"), 3, "browse"),
        # new type for user 1: segment restarts at 00:30
        (5, ts("2024-01-01 00:30:00"), 1, "view"),
    ]

    def drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(schema).parquet(in_dir)

        def sink(bdf, _bid):
            bdf.write.mode("append").parquet(out_dir)

        q = (
            streaming.scd2_current_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        log = spark.read.parquet(out_dir)
        latest = log.groupBy("user_id").agg(
            F.max_by(
                F.struct("valid_from_us", "event_type"),
                F.struct("valid_from_us", "from_event_id"),
            ).alias("cur")
        )
        return {
            (r.user_id, r.cur.event_type, r.cur.valid_from_us)
            for r in latest.collect()
        }

    us = lambda s: int(pd.Timestamp(s).value // 1000)  # noqa: E731
    got1 = drain(batch1)
    assert got1 == {
        (1, "click", us("2024-01-01 00:20:00")),
        (3, "browse", us("2024-01-01 00:07:00")),
    }
    got2 = drain(batch2)
    assert got2 == {
        (1, "view", us("2024-01-01 00:30:00")),
        (3, "browse", us("2024-01-01 00:07:00")),  # pre-kill start kept
    }


def test_ann_serving_two_batch_parity(spark, tmp_path):
    """ANN serving loop: the query census landed as TWO files (forced
    one-file micro-batches) must produce exactly the batch int8 top-k —
    each query answered once, in whichever batch it arrives, against
    the same static corpus."""
    from multi_report_etl_pipeline_spark.operators.similarity import int8_topk
    from multi_report_etl_pipeline_spark.streaming import (
        EMBEDDINGS_SCHEMA,
        ann_serving_drain,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter((F.col("vec_id") % 100) == 0)
    zone = str(tmp_path / "zone")
    queries.filter("vec_id < 200").coalesce(1).write.parquet(zone)
    queries.filter("vec_id >= 200").coalesce(1).write.mode("append").parquet(zone)
    stream = (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(zone)
    )
    pdf = ann_serving_drain(stream, emb, k=10)
    got = sorted(map(tuple, pdf.astype(str).to_numpy().tolist()))
    want = _rows(int8_topk(emb, queries, k=10), ["q_id", "rank", "c_id", "int8_cosine"])
    # pandas stringification of floats matches collect()'s repr for
    # 6dp-rounded doubles; compare on the rounded string forms
    assert len(got) == len(want) > 0
    assert got == want
