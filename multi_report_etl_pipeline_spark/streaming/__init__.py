"""Structured Streaming operators (SURVEY.md §2.9 "streaming analytics").

The reference is batch-only (views recomputed on demand, README.md:116);
this module provides the streaming expression of the same analytics the
batch `queries.events` pack declares, plus the late-data machinery batch
has no analog for:

- tumbling/sliding windowed aggregation under an event-time watermark
- session windows (gap-based) under a watermark
- exactly-once stream dedup via dropDuplicatesWithinWatermark
- arbitrary stateful processing via applyInPandasWithState
  (running per-user totals — the "custom stateful operator" shape)

Batch/stream parity is the test contract: each streaming query run with
trigger=availableNow over the same parquet input must equal its batch
twin (tests/test_streaming.py). Spark guarantees this for windowed aggs
in complete mode; it is what makes the batch oracle meaningful for the
streaming path at 100 TB (same plan, incremental execution).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# Same table when the file carries a Spark-native TIMESTAMP(MICROS) ts
# (the fixture generator has shipped both encodings across rounds).
EVENTS_SCHEMA_US = StructType(
    [f if f.name != "ts" else StructField("ts", TimestampType()) for f in EVENTS_SCHEMA]
)


LINEITEM_SOURCE_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_shipdate", TimestampType()),
    ]
)


DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming document landing zone: each new corpus file becomes a
    micro-batch (the shape a crawler/collector hands a training-data
    pipeline)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming query-vector landing zone: arriving embedding rows are
    retrieval REQUESTS to serve against a frozen corpus index (the ANN
    serving shape)."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def ann_serving_drain(
    query_stream: DataFrame,
    corpus: DataFrame,
    k: int = 10,
) -> "pd.DataFrame":
    """Serve streamed query vectors against a STATIC int8-quantized
    corpus — the online half of the ANN index lifecycle (build offline,
    serve requests as they arrive). Runs under ``foreachBatch``: the
    per-batch plan needs a per-query top-k window, which Structured
    Streaming forbids on unbounded frames but is exact batch semantics
    inside the sink hook — the idiomatic escape hatch for
    per-micro-batch plans. Each batch executes the FULL distributed
    int8 pipeline (Arrow GEMM prune over corpus partitions + exact
    integer JVM rescore, operators/similarity.int8_topk), so
    stream-vs-batch parity is bit-exact by construction and the drained
    union sits under the SAME value oracle as ``emb_int8_topk``.

    Scale: the corpus side stays fully distributed (nothing about it
    crosses the driver); each micro-batch's query set is a serving
    request batch — bounded by trigger sizing, the contract
    ``int8_topk`` enforces via ``max_q``. Returns the driver-side
    concatenation of per-batch results (|Q| x k rows — the same bound
    the driver pays to collect any top-k result)."""
    from multi_report_etl_pipeline_spark.operators import similarity  # noqa: PLC0415

    results: list[pd.DataFrame] = []

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = similarity.int8_topk(corpus, batch_df, k=k)
        results.append(res.toPandas())

    q = (
        query_stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        pd.concat(results, ignore_index=True)
        if results
        else pd.DataFrame(columns=["q_id", "rank", "c_id", "int8_cosine"])
    )


def curation_survivors_stream(docs: DataFrame) -> DataFrame:
    """Incremental curation: quality/language scoring is stateless per
    micro-batch; the exact-dedup survivor table is a streaming
    ``min(struct)`` aggregation keyed on the content fingerprint, so the
    survivor per duplicate set is min-doc_id — identical to the batch
    rule regardless of arrival order (the PLAN is literally the batch
    one: text.curation_survivors builds both). State is one slim struct
    per distinct fingerprint, i.e. exactly the output table (the same
    bound the batch materialization pays); at warehouse scale this
    state lives in the RocksDB state store and is the incremental
    alternative to re-scanning the corpus per curation run."""
    from multi_report_etl_pipeline_spark.operators import text  # noqa: PLC0415

    return text.curation_survivors(docs)


def vocabulary_stream(docs: DataFrame, k: int = 100) -> DataFrame:
    """Incrementally-maintained corpus heavy hitters: the token-count
    aggregation from ``text.vocabulary`` run as a streaming aggregation,
    with complete-mode sort + limit emitting the continuously-updated
    top-k table per micro-batch. State is one count per distinct token
    (|vocab|-bounded, independent of stream length). The batch form's
    document-frequency column needs a distinct aggregation Structured
    Streaming doesn't support — the stream twin carries token counts
    only (at scale, approx_count_distinct is the streaming-side df
    substitute)."""
    from multi_report_etl_pipeline_spark.operators import text  # noqa: PLC0415

    tok = docs.select(F.explode(text.words("text")).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )


def doc_perplexity_stream(docs: DataFrame, stats) -> DataFrame:
    """Score a streamed document landing zone under a FROZEN pretrained
    unigram LM artifact — the deployment shape of LM-perplexity
    filtering: the LM is fit offline on a reference snapshot
    (text.unigram_lm_stats) and applied to documents as they arrive.
    The plan IS the batch one (text.unigram_logprob: V-row LM broadcast
    into the exploded token stream, per-doc micro-nat sum aggregation),
    run as a streaming aggregation: per-doc state is one slim (count,
    sum) pair, and because a document's tokens all arrive in its single
    source row, each doc's score finalizes within its micro-batch."""
    from multi_report_etl_pipeline_spark.operators import text  # noqa: PLC0415

    return text.unigram_logprob(docs, stats=stats)


def quality_score_stream(docs: DataFrame, weights: list[float]) -> DataFrame:
    """Score a streamed document landing zone under FROZEN pretrained
    quality-classifier weights — the deployment shape of learned quality
    gating: the linear head is fit offline on a labeled snapshot
    (classifier.logistic_regression_fit) and applied to documents as
    they arrive. Scoring is a STATELESS narrow map (weights are plan
    literals), so the stream needs no state store, no watermark, and no
    aggregation — every micro-batch emits its scores in append mode."""
    from multi_report_etl_pipeline_spark.operators import (  # noqa: PLC0415
        classifier,
    )
    from multi_report_etl_pipeline_spark.queries import llm_ops  # noqa: PLC0415

    feats = llm_ops.logreg_features(docs)
    return classifier.logistic_regression_score(
        feats, [name for name, _ in llm_ops._LOGREG_FEATS], weights  # noqa: SLF001
    )


def read_activities_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form of the activity fact: a file-source stream over the
    lineitem landing zone, stream-static broadcast-joined to orders, with
    the same derived-column adapter as batch (domain.stg_activities_df).
    At scale the landing zone is the directory a collector appends to;
    every new file becomes an incremental micro-batch of activities."""
    from multi_report_etl_pipeline_spark import domain  # noqa: PLC0415
    from multi_report_etl_pipeline_spark.io import read_table  # noqa: PLC0415

    raw = (
        spark.readStream.schema(LINEITEM_SOURCE_SCHEMA)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return domain.stg_activities_df(raw, F.broadcast(orders))


def contact_survivors_stream(stg_activities: DataFrame) -> DataFrame:
    """Incrementally-maintained staging layer: the SAME min_by survivor
    aggregation the batch materialization uses
    (staging.combined_contact_survivors) run as a streaming aggregation —
    per-account state is four payload structs, bounded by account count
    and independent of stream length. Under complete output mode each
    micro-batch re-emits the current survivors, i.e. the reference's
    clean contact views stay continuously up to date as activities
    arrive, instead of being recomputed on demand (README.md:116)."""
    from multi_report_etl_pipeline_spark import staging  # noqa: PLC0415

    return staging.combined_contact_survivors(stg_activities)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one-file directory; at
    scale this is the landing zone a collector appends to). File streams
    need an explicit schema, so the footer is probed once (driver-side
    metadata read at plan time) to pick it: a TIMESTAMP(NANOS) file
    arrives as long (nanosAsLong) and converts exactly like the batch
    reader; a TIMESTAMP(MICROS) file is read natively — unconditionally
    converting would shrink native-µs values 1000x."""
    # set at runtime so the stream works under ANY session, not just ones
    # built by session.get_spark (the driver's harness owns its session)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    ts_is_long = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    schema = EVENTS_SCHEMA if ts_is_long else EVENTS_SCHEMA_US
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_long:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw


def windowed_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of queries.events.windowed_counts: tumbling 1-hour
    count+sum per event type, tolerating `watermark` of event-time
    lateness before a window is finalized."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # long-cents sum, /100.0 to double: exact, codegen-friendly,
            # identical to the batch twin (queries/events.VALUE_CENTS)
            (F.sum(F.expr("CAST(value * 100 + 0.5 AS BIGINT)")) / F.lit(100.0))
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental maintenance of the continuous aggregate
    (operators/rollup.hourly_rollup): the same (hour, event_type) ->
    (cnt, round-6 avg) rows the batch artifact stores, produced as a
    watermarked tumbling-window aggregate. A deployment keeps the
    rollup fresh by running THIS against the ingest stream (update
    mode into a MERGE sink) instead of rebuilding from raw — the
    claim the batch operator's docstring makes, here as runnable
    code under the same value oracle. Complete-mode state is
    |types| x |hours| rows, volume-independent."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 6).alias("av"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "cnt",
            "av",
        )
    )


def sessionization_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows per user (gap-based), the incremental
    form of queries.events.sessionization."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.expr("CAST(value * 100 + 0.5 AS BIGINT)")) / F.lit(100.0))
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once keyed dedup with bounded state: duplicates of
    event_id arriving within the watermark horizon are dropped, state for
    older keys is reclaimed — the streaming version of exact_dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def interval_join_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval self-join: each purchase joins the clicks
    of the same user in the 5 minutes before it.

    The canonical watermarked two-stream join: both sides buffer state,
    the event-time range condition bounds how long a click must be kept
    (watermark + 5 min) and how long a purchase can wait for late clicks
    (watermark), so state is reclaimed on both sides — this is the
    operator that makes stream-stream joins feasible at 100 TB, where an
    unbounded join buffer is not. Append output mode: a pair is emitted
    exactly once, when the watermark proves no earlier match can arrive.
    Batch twin = the same interval join over the static table (the
    driver's oracle)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


ORDERS_SOURCE_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_totalprice", DoubleType()),
    ]
)


def read_orders_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the orders landing zone (schema pruned to
    the merge's key + payload columns — the scan never reads the rest)."""
    return (
        spark.readStream.schema(ORDERS_SOURCE_SCHEMA)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )


def snapshot_merge_stream(orders: DataFrame) -> DataFrame:
    """CDC-style incremental MERGE: the streaming form of
    operators.snapshot.merge_upsert, maintaining a latest-wins snapshot
    as change rows arrive.

    Each arriving order contributes its base row and (deterministically,
    mirroring queries.tpch.orders_snapshot_merge so the same oracle
    applies) an update/tombstone row; the merged snapshot is a streaming
    ``max_by(payload, (version, src))`` aggregation. State is one slim
    struct per key — exactly the output table, the same bound the batch
    merge's shuffle pays — so at 100 TB this is the standing alternative
    to re-running the batch merge per update batch. Tombstones are kept
    IN state (filtered by the consumer, see the query): dropping them
    here would resurrect a key if a late older version arrived after its
    delete."""
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    base = F.struct(
        dec.alias("price"),
        F.lit(1).alias("version"),
        F.lit(False).alias("deleted"),
        F.lit(0).alias("src"),
    )
    upd = F.struct(
        (dec + F.lit(10).cast("decimal(18,2)")).cast("decimal(18,2)").alias("price"),
        F.lit(2).alias("version"),
        (F.col("o_orderkey") % 13 == 0).alias("deleted"),
        F.lit(1).alias("src"),
    )
    changes = orders.select(
        "o_orderkey",
        F.explode(
            F.when(F.col("o_orderkey") % 7 == 0, F.array(base, upd)).otherwise(
                F.array(base)
            )
        ).alias("r"),
    )
    return changes.groupBy("o_orderkey").agg(
        F.max_by(
            F.struct("r.price", "r.version", "r.deleted"),
            F.struct("r.version", "r.src"),
        ).alias("s")
    )


USER_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_total", DoubleType()),
    ]
)

USER_TOTALS_STATE = StructType(
    [StructField("events_seen", LongType()), StructField("value_total", DoubleType())]
)


def _update_user_totals(key, pdf_iter, state):
    """Running per-user totals (arbitrary stateful op). Pure pandas on
    Arrow batches; state is a (count, sum) pair per user."""
    (user_id,) = key
    if state.exists:
        seen, total = state.get
    else:
        seen, total = 0, 0.0
    for pdf in pdf_iter:
        seen += len(pdf)
        total += float(pdf["value"].sum())
    state.update((seen, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "events_seen": [seen], "value_total": [round(total, 2)]}
    )


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: continuously
    updated per-user aggregate with explicit state schema."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=USER_TOTALS_OUTPUT,
            stateStructType=USER_TOTALS_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


WEIGHTED_TOPK_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("seq", LongType()),
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("weight", DoubleType()),
        StructField("priority", DoubleType()),
    ]
)

WEIGHTED_TOPK_STATE = StructType(
    [
        StructField("seq", LongType()),
        StructField("doc_ids", ArrayType(LongType())),
        StructField("langs", ArrayType(StringType())),
        StructField("sources", ArrayType(StringType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("priorities", ArrayType(DoubleType())),
    ]
)


def _make_weighted_topk_updater(k: int):
    cols = ["doc_id", "lang", "source", "weight", "priority"]

    def update(key, pdf_iter, state):
        (shard,) = key
        seq, chunks = 0, []
        if state.exists:
            seq, ids, langs, sources, weights, pris = state.get
            chunks.append(
                pd.DataFrame(
                    {
                        "doc_id": list(ids),
                        "lang": list(langs),
                        "source": list(sources),
                        "weight": list(weights),
                        "priority": list(pris),
                    }
                )
            )
        for pdf in pdf_iter:
            if len(pdf):
                chunks.append(pdf[cols])
        if not chunks:  # empty batch for an unseen shard: nothing to emit
            return
        # the batch operator's exact order: priority DESC, doc_id ASC
        # (doc_id unique => total order, so head(k) is deterministic)
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            ["priority", "doc_id"], ascending=[False, True]
        ).head(k)
        seq += 1
        state.update(
            (
                seq,
                [int(x) for x in rows["doc_id"]],
                list(rows["lang"]),
                list(rows["source"]),
                [float(x) for x in rows["weight"]],
                [float(x) for x in rows["priority"]],
            )
        )
        out = rows.copy()
        out.insert(0, "seq", seq)
        out.insert(0, "shard", shard)
        yield out

    return update


def weighted_topk_stream(
    docs: DataFrame, k: int, n_shards: int = 8
) -> DataFrame:
    """Streaming weighted sampling (Efraimidis-Spirakis) as distributed
    top-k maintenance: every arriving document draws its DETERMINISTIC
    keyed priority (sampling.es_priority — the same value the batch
    operator ranks by), and each of ``n_shards`` state groups keeps only
    its current top-k rows via applyInPandasWithState. State is bounded
    at n_shards * k rows regardless of stream length; each micro-batch
    re-emits the updated shard top-k stamped with a monotone ``seq``, so
    the reader recovers the final state (max seq per shard) and merges
    the global top-k from n_shards * k candidates — the canonical
    scalable streaming-top-k topology (per-shard maintenance + tiny
    final merge). Because priorities are engine-portable md5 arithmetic,
    the drained result must EQUAL the batch weighted_sample — the same
    DuckDB oracle checks both."""
    from multi_report_etl_pipeline_spark.operators import sampling  # noqa: PLC0415

    w = F.col("weight").cast("double")
    scored = (
        docs.filter((w > 0.0) & ~F.isnan(w))
        .withColumn("priority", sampling.es_priority("doc_id", "weight"))
        .withColumn("shard", F.col("doc_id") % n_shards)
        .select("shard", "doc_id", "lang", "source", "weight", "priority")
    )
    return scored.groupBy("shard").applyInPandasWithState(
        _make_weighted_topk_updater(k),
        outputStructType=WEIGHTED_TOPK_OUTPUT,
        stateStructType=WEIGHTED_TOPK_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_available_now(
    sdf: DataFrame,
    table_name: str,
    output_mode: str,
    shuffle_partitions: int | None = None,
) -> None:
    """Drain the stream into an in-memory table with availableNow (one
    incremental pass over all existing input, then stop).

    ``shuffle_partitions`` bounds the stateful shuffle for queries whose
    complete-mode state is small by construction (the sketch drains:
    <= 4096 rows of HLL registers / CMS cells / histogram bins). The
    session default (200 here, often thousands on a real cluster) would
    burn a near-empty task per partition per micro-batch; the state
    store partition count is locked in at the query's FIRST batch, so
    the bound must be chosen from the state's size, not the data's. The
    conf is set for query planning and restored after the drain
    (drains in this module run sequentially on the session)."""
    spark = sdf.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


TRANSITIONS_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("next_type", StringType()),
    ]
)

TRANSITIONS_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _update_transitions(key, pdf_iter, state):
    """Per-user last-event state: each arriving micro-batch is sorted by
    (ts, event_id), chained onto the remembered last event, and every
    consecutive pair is emitted as a transition fact. State is O(1) per
    user — one (ts, event_id, type) triple — and the in-batch sort is
    bounded by the user's rows in that batch (the funnel bound).

    Pairing is exact when each user's arrivals respect event-time order
    ACROSS batches (true for the single-file availableNow drain and for
    log-structured landing zones); fully out-of-order streams would
    buffer rows until the watermark passes before pairing — the
    documented production extension, same state bound plus the
    watermark's buffer."""
    import pandas as pd  # noqa: PLC0415

    pdfs = [p for p in pdf_iter if len(p)]
    if not pdfs:
        yield pd.DataFrame({"event_type": [], "next_type": []})
        return
    pdf = pd.concat(pdfs, ignore_index=True).sort_values(["ts", "event_id"])
    types = pdf["event_type"].tolist()
    if state.exists:
        _, _, last_type = state.get
        types = [last_type] + types
    last = pdf.iloc[-1]
    state.update(
        (int(last["ts"].value // 1000), int(last["event_id"]), str(last["event_type"]))
    )
    yield pd.DataFrame(
        {"event_type": types[:-1], "next_type": types[1:]}
    )


def transitions_stream(events: DataFrame) -> DataFrame:
    """Markov-transition facts as an arbitrary-stateful streaming op:
    the streaming twin of events_transition_matrix's LEAD window."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITIONS_OUTPUT,
            stateStructType=TRANSITIONS_STATE,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


ORDERS_QUALITY_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
    ]
)


def read_orders_quality_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders stream projected to the quality-rule columns (the scan
    never reads the rest — file-source column pruning via the declared
    schema)."""
    return (
        spark.readStream.schema(ORDERS_QUALITY_SCHEMA)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )


SCD2_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),
    ]
)

SCD2_STATE = StructType(
    [
        StructField("open_from_us", LongType()),
        StructField("open_event_id", LongType()),
        StructField("open_type", StringType()),
    ]
)


def _scd2_chain(key, pdf_iter, state):
    """Shared SCD2 state transition: sort this user's micro-batch rows
    by (ts, event_id), chain them onto the open interval carried in
    ``state``, update the state to the new open interval, and return
    ``(user_id, changes)`` where ``changes`` is the ordered list of
    (valid_from_us, event_id, type) segment starts seen this batch —
    the last element is the (still open) current segment. Returns
    ``None`` when the batch carried no rows for this key.

    Cross-batch ordering contract as ``_update_transitions`` (event-time
    order per user across batches; the availableNow drain and
    log-structured landing zones satisfy it, fully out-of-order streams
    would add a watermark buffer)."""
    import pandas as pd  # noqa: PLC0415

    pdfs = [p for p in pdf_iter if len(p)]
    if not pdfs:
        return None
    (user_id,) = key
    pdf = pd.concat(pdfs, ignore_index=True).sort_values(["ts", "event_id"])
    ts_us = [int(v) // 1000 for v in pdf["ts"].astype("int64").tolist()]
    eids = [int(v) for v in pdf["event_id"].tolist()]
    types = pdf["event_type"].tolist()
    if state.exists:
        open_from, open_eid, open_type = state.get
        changes = [(int(open_from), int(open_eid), str(open_type))]
    else:
        changes = []
    for t, e, ty in zip(ts_us, eids, types):
        if not changes or ty != changes[-1][2]:
            changes.append((t, e, ty))
    state.update(changes[-1])
    return user_id, changes


def _update_scd2(key, pdf_iter, state):
    """Streaming SCD type-2 change capture: per-user state is the OPEN
    validity interval — (valid_from, tiebreak event_id, type) of the
    segment the user is currently in. Each micro-batch chains its rows
    onto the open interval and emits every interval that CLOSED (a row
    whose type differs from its predecessor's closes the predecessor's
    interval at its ts). The open interval is never emitted — it is
    exactly the state, and append-mode correctness demands emitting only
    immutable facts. State is O(1) per user; in-batch work is one sort
    of that user's batch rows."""
    import pandas as pd  # noqa: PLC0415

    res = _scd2_chain(key, pdf_iter, state)
    if res is None:
        yield pd.DataFrame(
            {"user_id": [], "event_type": [], "valid_from_us": [], "valid_to_us": []}
        )
        return
    user_id, changes = res
    closed = changes[:-1]
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "event_type": [c[2] for c in closed],
            "valid_from_us": [c[0] for c in closed],
            "valid_to_us": [n[0] for n in changes[1:]],
        }
    )


def _update_scd2_current(key, pdf_iter, state):
    """The dual of ``_update_scd2``: emit the OPEN interval — the
    user's CURRENT dimension row — once per batch the user had activity
    in, update-mode style. The newest emission per user supersedes the
    older ones; downstream (an update-capable sink: compacted topic,
    MERGE target, or the max_by fold the registered query applies after
    an availableNow drain) keeps only the latest. valid_from only moves
    forward, so "latest" is recoverable deterministically as the max
    (valid_from_us, event_id) per user — no reliance on sink order."""
    import pandas as pd  # noqa: PLC0415

    res = _scd2_chain(key, pdf_iter, state)
    if res is None:
        yield pd.DataFrame(
            {
                "user_id": [],
                "event_type": [],
                "valid_from_us": [],
                "from_event_id": [],
            }
        )
        return
    user_id, changes = res
    cur = changes[-1]
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [cur[2]],
            "valid_from_us": [cur[0]],
            "from_event_id": [cur[1]],
        }
    )


def scd2_stream(events: DataFrame) -> DataFrame:
    """SCD type-2 history build as an arbitrary-stateful streaming op:
    the streaming twin of events.user_scd2_history's LAG/LEAD windows,
    emitting closed validity intervals as they materialize."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_scd2,
            outputStructType=SCD2_OUTPUT,
            stateStructType=SCD2_STATE,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


SCD2_CURRENT_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from_us", LongType()),
        # two segments of one user CAN share valid_from_us (same-ts
        # events, different event_id, split across a batch boundary) —
        # the change row's event_id makes "latest emission" a total
        # order for the sink-side fold
        StructField("from_event_id", LongType()),
    ]
)


def scd2_current_stream(events: DataFrame) -> DataFrame:
    """The live dimension-table view of the SCD2 build: per user, the
    OPEN validity interval (type + valid_from of the segment the user is
    currently in), re-emitted update-mode whenever it changes. Shares
    the chain/state logic (and the state schema, so a checkpoint serves
    either view) with ``scd2_stream``; the two differ only in which side
    of the closed/open divide they emit. State is O(users); per-batch
    output is O(active users)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_scd2_current,
            outputStructType=SCD2_CURRENT_OUTPUT,
            stateStructType=SCD2_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
