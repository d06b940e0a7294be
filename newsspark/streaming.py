"""Structured Streaming ingest: incremental extraction over a growing pages
table.

The reference is a synchronous request/response service (no streams —
SURVEY.md §2 I), and the north rule specifies a batch Iceberg-to-Iceberg job;
this module is the additive streaming front-end for the same engine: new
page files appearing under a directory are picked up incrementally and run
through the identical ``run_extract`` plan via ``foreachBatch``, so batch and
streaming outputs are byte-identical per url by construction.  Checkpointing
is Spark's own (stream progress) — the per-partition lineage tables of the
batch job remain the resume story for backfills.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from .pipeline import run_extract

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "archetype string"
)


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_partitions: Optional[int] = None,
    available_now: bool = True,
):
    """Start (and by default drain) an incremental extraction stream.

    Returns the StreamingQuery.  With ``available_now=True`` the query
    processes everything currently in ``pages_dir`` and stops — the
    batch-equivalent semantics used in tests; with False it keeps running.
    """
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(pages_dir)
    )

    def process(batch_df, epoch_id: int) -> None:
        articles = run_extract(
            batch_df.sparkSession, batch_df, num_partitions=num_partitions
        )
        articles.write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
    else:
        query = writer.trigger(processingTime="5 seconds").start()
    return query


EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_event_counts(
    spark: SparkSession,
    events_dir: str,
    query_name: str = "event_counts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
):
    """Watermarked tumbling-window aggregation over an event stream — the
    standard late-data-tolerant streaming shape (windows emit once the
    watermark passes; late events inside the watermark still count)."""
    from pyspark.sql import functions as F

    events = spark.readStream.schema(EVENTS_DDL).parquet(events_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
