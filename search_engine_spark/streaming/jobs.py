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

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_incremental_batch(spark, batch_df, paths)

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


def run_windowed_events(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
):
    """File-source -> windowed agg -> parquet sink (append mode on
    watermark-closed windows), drained with availableNow."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
