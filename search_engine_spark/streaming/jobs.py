"""Structured Streaming entry points.

1. ``ingest_stream`` — the streaming face of incremental index
   maintenance (SURVEY.md §2.9 St1/St2): ``readStream`` over a pages
   directory -> ``foreachBatch(apply_incremental_batch)``. The reference
   runs this as a FastAPI BackgroundTask per document
   (/root/reference/backend/app.py:1179-1186,1227-1233); here each
   micro-batch is one transactional delta append, and compaction is a
   separate amortized job (incremental.compact).

2. ``windowed_event_counts`` — event-time tumbling-window aggregation
   with a watermark for late data (the engine's streaming analytic
   operator; its batch twin is operators/relational.q_event_hour_window,
   checked against the DuckDB oracle — window.start == date_trunc hour).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.operators import index_build as ib
from search_engine_spark.sources.pages import PAGES_SCHEMA
from search_engine_spark.streaming.incremental import apply_incremental_batch


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    paths: ib.IndexPaths,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream new page files from ``input_dir`` into the delta log.

    available_now=True drains everything currently in the directory and
    stops — the testable micro-batch mode; in production the same query
    runs continuously with a processingTime trigger."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(input_dir)
    )

    import hashlib
    import os

    # key by a hash of the ABSOLUTE checkpoint path: basenames collide
    # across streams (two ".../ckpt" dirs would overwrite each other's
    # batch delta dirs)
    stream_key = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # (stream checkpoint, batch_id) keys the idempotent per-batch
        # delta dirs: a replayed micro-batch overwrites its own artifacts
        # (exactly-once effect on top of foreachBatch's at-least-once
        # delivery), and batch ids from DIFFERENT streams cannot collide
        apply_incremental_batch(
            spark, batch_df, paths, f"{stream_key}-{batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 2-hour watermark: counts
    + value sums per (window, event_type). Late rows beyond the watermark
    are dropped; state for closed windows is evicted (bounded memory at
    unbounded stream length)."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _drain_to_parquet(df: DataFrame, output_dir: str, checkpoint_dir: str):
    """append-mode parquet sink drained with availableNow."""
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


SESSION_GAP_S = 1800
_GAP_US = SESSION_GAP_S * 1_000_000

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, duration_s long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def _sessionize_fn(key, pdfs, state):
    """applyInPandasWithState kernel: per-user gap sessionization.

    State = the one OPEN session (start_us, last_us, n). Within a batch,
    any >gap silence closes a session immediately; the final open session
    stays in state with an event-time timeout at last + gap, so it is
    emitted once the watermark passes (late events inside the watermark
    still extend it). This is the streaming twin of
    relational.q_sessionize — same gap rule, same floor-second duration."""
    import pandas as pd

    def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.to_datetime(start_us, unit="us")],
                "n_events": [n],
                # floor-of-seconds diff == batch unix_timestamp semantics
                "duration_s": [last_us // 1_000_000 - start_us // 1_000_000],
            }
        )

    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            yield emit(start, last, n)
            state.remove()
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = (
        rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    )
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    for t in ts_us.tolist():
        if start is None:
            start, last, n = t, t, 1
        elif t > last + _GAP_US:
            yield emit(start, last, n)
            start, last, n = t, t, 1
        elif t < start - _GAP_US:
            # cross-batch late arrival BEFORE the open session's window:
            # emit it as its own already-closed session. (A true merge
            # with previously-EMITTED sessions would need retraction —
            # documented approximation; in-order streams never hit this.)
            yield emit(t, t, 1)
        else:
            # extend the open session in either direction (late events
            # inside the watermark may precede the current start)
            start = min(start, t)
            last = max(last, t)
            n += 1
    state.update((int(start), int(last), int(n)))
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_S * 1000)


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = EVENTS_SCHEMA,
):
    """Streaming gap-sessionization: custom stateful operator via
    applyInPandasWithState (event-time timeout + watermark), append-mode
    parquet sink, drained with availableNow. Completed sessions emit as
    soon as a within-batch gap closes them or the watermark passes the
    open session's gap window; state is one tuple per live user —
    bounded memory at unbounded stream length."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(schema).parquet(input_dir)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return _drain_to_parquet(sessions, output_dir, checkpoint_dir)


def run_windowed_events(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = EVENTS_SCHEMA,
):
    """File-source -> windowed agg -> parquet sink (append mode on
    watermark-closed windows), drained with availableNow."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return _drain_to_parquet(
        windowed_event_counts(stream), output_dir, checkpoint_dir
    )


def percolate(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    spark: SparkSession,
    phrases: list[tuple[int, str]] | None = None,
) -> DataFrame:
    """Reverse search (percolation): match incoming documents against
    STANDING queries — the saved-search/alerting read pattern over a
    crawl stream (Elasticsearch-percolator shape; the reference has no
    standing queries, but its AND-mode search semantics — posting-list
    intersection, app.py:594-617 — define what "query matches doc"
    means here). -> (doc_id, query_id), one row per firing query.

    Inverted-query plan: never docs × queries. The standing queries are
    normalized with the SAME pipeline as documents, exploded into a
    (query_id, term) table and BROADCAST (standing-query sets are small
    by construction); each doc's DISTINCT tokens probe it map-side, and
    a query fires when all its distinct terms matched (count == arity —
    AND semantics). Stateless, so the identical transform serves batch
    frames and readStream micro-batches (run_percolate); at 100 TB of
    stream the only aggregation keys on (doc_id, query_id) with map-side
    partials and the document text never shuffles.

    ``phrases`` (round 5, VERDICT r4 #9): standing EXACT-PHRASE queries
    with search_phrase's adjacency semantics — tokenized by the same
    ordered-duplicates-preserved rule (query.py:970) over the same
    post-normalization token positions the positional index stores
    (index_build.build_forward's ``pos``), so an alert fires for doc d
    iff search_phrase over an index that ingested d (via the positional
    delta path) would match d (tested index-vs-alert in
    tests/test_streaming.py). Plan: positional tokens probe a broadcast
    (query_id, term, off) table; base = pos − off groups candidate
    anchors and a phrase fires when all m distinct offsets matched at
    one anchor — map-side partials on (doc_id, query_id, base), text
    never shuffles, same scale shape as the term path.

    docs: (doc_id, norm) — the normalize_pages output. Queries that
    normalize to zero tokens never fire."""
    from search_engine_spark.functions.text import normalize_text

    empty = spark.createDataFrame([], "doc_id long, query_id long")
    qterms, qsizes = [], []
    for qid, text in queries:
        toks = sorted({t for t in normalize_text(text).split(" ") if t})
        if not toks:
            continue
        qsizes.append((qid, len(toks)))
        qterms.extend((qid, t) for t in toks)
    term_hits = None
    if qterms:
        qt = spark.createDataFrame(qterms, "query_id long, term string")
        qs = spark.createDataFrame(qsizes, "query_id long, n_terms int")
        toks = docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.col("norm"), " "))).alias(
                "term"
            ),
        )
        hits = (
            toks.join(F.broadcast(qt), "term")
            .groupBy("doc_id", "query_id")
            .agg(F.count("*").alias("m"))
        )
        term_hits = (
            hits.join(F.broadcast(qs), "query_id")
            .filter(F.col("m") == F.col("n_terms"))
            .select("doc_id", "query_id")
        )
    pterms, psizes = [], []
    for qid, text in phrases or []:
        # ordered binding, duplicates preserved — the EXACT tokenization
        # search_phrase applies to its phrase argument
        toks = [t for t in normalize_text(text).split(" ") if t]
        if not toks:
            continue
        psizes.append((qid, len(toks)))
        pterms.extend((qid, t, i) for i, t in enumerate(toks))
    phrase_hits = None
    if pterms:
        pqt = spark.createDataFrame(
            pterms, "query_id long, term string, off int"
        )
        pqs = spark.createDataFrame(psizes, "query_id long, n_terms int")
        ptoks = docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("norm"), " ")).alias("pos", "term"),
        )
        anchors = (
            ptoks.join(F.broadcast(pqt), "term")
            .select(
                "doc_id",
                "query_id",
                (F.col("pos") - F.col("off")).alias("base"),
                "off",
            )
            .groupBy("doc_id", "query_id", "base")
            # count DISTINCT offsets: a repeated phrase term matching one
            # doc position contributes several (pos, off) rows to
            # DIFFERENT bases, never duplicate offs within one base
            .agg(F.count_distinct("off").alias("m"))
        )
        phrase_hits = (
            anchors.join(F.broadcast(pqs), "query_id")
            .filter(F.col("m") == F.col("n_terms"))
            .select("doc_id", "query_id")
            .distinct()
        )
    outs = [h for h in (term_hits, phrase_hits) if h is not None]
    if not outs:
        return empty
    return outs[0] if len(outs) == 1 else outs[0].unionByName(outs[1])


def run_percolate(
    spark: SparkSession,
    input_dir: str,
    queries: list[tuple[int, str]],
    output_dir: str,
    checkpoint_dir: str,
    phrases: list[tuple[int, str]] | None = None,
):
    """Pages file-source -> normalize -> percolate -> parquet alert sink,
    drained with availableNow. percolate()'s (doc, query) count is an
    aggregation, but a PER-DOCUMENT one: a doc's tokens arrive in one
    micro-batch, so applying the batch transform inside foreachBatch is
    exact (no cross-batch state, no watermark needed) and stream output
    == batch output on the same pages (tested).

    Idempotent per batch: foreachBatch is at-least-once, so each batch
    writes its OWN batch=<id> directory with mode=overwrite (the same
    replay discipline as ingest_stream) — a replayed micro-batch rewrites
    its directory instead of double-appending alerts."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        percolate(
            ib.normalize_pages(batch_df), queries, spark, phrases=phrases
        ).write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
