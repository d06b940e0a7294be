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
        # epoch-keyed overwrite, not append: foreachBatch is at-least-once
        # and a crash between parquet commit and checkpoint offset write
        # replays the epoch — ONE implementation of that contract
        epoch_idempotent_writer(out_dir)(articles, epoch_id)

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


DEDUP_OUT_DDL = "url string, warc_ts timestamp, first_seen boolean, n_dropped long"


def stream_dedup_urls(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Cross-micro-batch URL dedup: emit each url the FIRST time it is seen
    and drop every later re-crawl — the custom stateful operator a continuous
    crawl-ingest needs (re-fetches of the same url arrive hours apart, far
    beyond any watermark, so a windowed dedup cannot express this).

    Built on ``applyInPandasWithState``: state is keyed by url (hash-
    partitioned by Spark's state store, so state scales horizontally with
    executors) and stores ``(emitted, n_dropped)``.  Update-mode semantics:
    a group emits a row whenever it changes — ``first_seen=true`` with the
    kept row's warc_ts the first time, ``first_seen=false`` with the running
    duplicate count when later re-crawls are suppressed — so downstream
    consumers filter ``first_seen`` for the deduped feed and the duplicate
    volume stays observable.  In production the grouping key would be the
    canonical url (`url_canonicalize`); state-store size is one small tuple
    per distinct url, the standard RocksDB-state-backend shape.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    pages = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def dedup(key, pdfs, state):
        import pandas as pd

        emitted, n_dropped = state.get if state.exists else (0, 0)
        was_emitted = emitted
        first = None
        n_rows = 0
        # the group arrives as an ITERATOR of Arrow-bounded chunks — the
        # earliest warc_ts may be in any chunk, so take the min across all
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_rows += len(pdf)
            if emitted == 0:
                cand = pdf.sort_values("warc_ts", kind="mergesort").iloc[:1]
                if first is None or (
                    cand["warc_ts"].iloc[0] < first["warc_ts"].iloc[0]
                ):
                    first = cand
        if emitted == 0 and first is not None:
            emitted = 1
            n_dropped += n_rows - 1
        else:
            n_dropped += n_rows
        state.update((emitted, n_dropped))
        if first is not None:
            yield pd.DataFrame(
                {
                    "url": first["url"].values,
                    "warc_ts": first["warc_ts"].values,
                    "first_seen": [True],
                    "n_dropped": [n_dropped],
                }
            )
        elif was_emitted and n_rows:
            yield pd.DataFrame(
                {
                    "url": [key[0]],
                    "warc_ts": [pd.NaT],
                    "first_seen": [False],
                    "n_dropped": [n_dropped],
                }
            )
        else:
            yield pd.DataFrame(
                columns=["url", "warc_ts", "first_seen", "n_dropped"]
            )

    deduped = pages.groupBy("url").applyInPandasWithState(
        dedup,
        outputStructType=DEDUP_OUT_DDL,
        stateStructType="emitted long, n_dropped long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # foreachBatch -> epoch-keyed parquet: update-mode rows land as a
    # change feed, the query RECOVERS from its checkpoint (restarts resume
    # the url state instead of re-emitting), and an epoch REPLAY after a
    # crash overwrites its own partition instead of duplicating the feed
    # (epoch_idempotent_writer).
    return (
        deduped.writeStream.outputMode("update")
        .foreachBatch(epoch_idempotent_writer(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


HOURLY_OUT_DDL = (
    "window_start timestamp, window_end timestamp, event_type string, "
    "n_events long, total_value double"
)


def stream_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "72 hours",
    window: str = "1 hour",
    max_files_per_trigger: int = 1,
):
    """Watermarked hourly aggregation in APPEND mode with a durable sink —
    the production windowed-rollup shape (stream_event_counts is the
    memory-sink demo; this one is checkpoint-recoverable and oracle-checked).

    Append mode emits each window EXACTLY ONCE, when the watermark (max
    event time seen minus ``watermark``) passes the window end; late events
    arriving within the watermark still land in their original window.  The
    driver entry feeds base + late waves plus a far-future sentinel event
    whose only job is to push the final watermark past every real window —
    so the converged parquet output equals the batch GROUP BY regardless of
    micro-batch boundaries (the batching-invariance that makes the DuckDB
    oracle exact).  The sentinel's own window stays above the watermark and
    never emits.

    total_value sums through DECIMAL(18,2) so float summation order can
    never flip a cent (the contract_sql money rule).  State per key is one
    window aggregate; at scale the state store shards by (window, event_type)
    hash — the standard RocksDB-backend rollup.
    """
    from pyspark.sql import functions as F

    events = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

    return (
        agg.writeStream.outputMode("append")
        .foreachBatch(epoch_idempotent_writer(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def epoch_idempotent_writer(out_dir: str):
    """foreachBatch sink that survives epoch REPLAY: each micro-batch
    overwrites its own ``epoch=<id>`` partition directory instead of
    blind-appending to ``out_dir``.  foreachBatch is at-least-once — a
    driver crash between the parquet commit and the checkpoint offset
    write replays the epoch on restart, and an append sink would then
    duplicate every window row of that batch (silently doubling counts).
    Overwriting the epoch-keyed directory makes the replay a no-op, which
    is what upgrades the pipeline's at-least-once delivery to the
    exactly-once OUTPUT the oracle and tests assert.  Readers just scan
    ``out_dir`` (the epoch partition column is additive)."""

    def write_batch(batch_df, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )

    return write_batch


def stamp_wave_order(events_dir: str, wave_index: int, stamped: set) -> None:
    """Pin file-source ingestion order for multi-wave test/driver feeds.
    FileStreamSource orders new files by MODIFICATION TIME; separate append
    jobs can land within one mtime granule (coarse network/container
    filesystems), letting a later wave (e.g. the far-future watermark
    sentinel) be batched before an earlier late-data wave — which would
    drop the late events and break the convergence oracle.  Explicitly
    stamping each wave's files with a strictly increasing mtime makes the
    intended order a guarantee instead of a race.  Call after each wave's
    write with the same ``stamped`` set.

    Stamps are CURRENT time + wave_index — a fixed past epoch would trip
    FileStreamSource's maxFileAge (default 7d): files much older than the
    newest seen are silently ignored, which on a restarted checkpoint
    (whose newest timestamp is real wall clock) drops the new waves
    entirely."""
    import os
    import time

    t = int(time.time()) + wave_index
    for root, _, files in os.walk(events_dir):
        for f in files:
            p = os.path.join(root, f)
            if p not in stamped:
                os.utime(p, (t, t))
                stamped.add(p)
