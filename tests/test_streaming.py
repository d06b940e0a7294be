"""Streaming ingest == batch output, and restarts don't reprocess."""
from newsspark.pages import pages_pdf
from newsspark.pipeline import run_extract
from newsspark.streaming import stream_extract


def _write_pages(spark, docs, path, offset=0):
    pdf = pages_pdf([d + offset for d, _ in docs], [t for _, t in docs])
    spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang", "archetype"]]
    ).write.mode("append").parquet(path)


def test_stream_matches_batch_and_is_incremental(spark, tiny_docs, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "articles")
    ckpt = str(tmp_path / "ckpt")
    first = tiny_docs[:60]

    _write_pages(spark, first, pages_dir)
    q = stream_extract(spark, pages_dir, out_dir, ckpt, num_partitions=4)
    q.awaitTermination(120)

    got = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    batch_pages = spark.read.parquet(pages_dir)
    want = {
        r["url"]: r
        for r in run_extract(spark, batch_pages, num_partitions=4).collect()
    }
    assert set(got) == set(want)
    for url in want:
        for f in ("title", "text", "date", "method", "error"):
            assert got[url][f] == want[url][f], (url, f)

    # new files arrive; a restarted stream processes ONLY them
    _write_pages(spark, tiny_docs[60:90], pages_dir, offset=100000)
    q2 = stream_extract(spark, pages_dir, out_dir, ckpt, num_partitions=4)
    q2.awaitTermination(120)
    after = spark.read.parquet(out_dir)
    assert after.count() == 90  # no duplicates from reprocessing
    assert after.select("url").distinct().count() == 90


def test_stateful_url_dedup_across_batches(spark, tiny_docs, tmp_path):
    """applyInPandasWithState: re-crawled urls are dropped across
    micro-batches AND across stream restarts (state persists in the
    checkpoint)."""
    from newsspark.streaming import stream_dedup_urls

    pages_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt_dedup")
    docs = tiny_docs[:20]

    # wave 1: docs 0-19; wave 2: docs 10-29 (10 re-crawls + 10 new).
    # separate parquet files + maxFilesPerTrigger=1 => multiple micro-batches.
    _write_pages(spark, docs, pages_dir)
    _write_pages(spark, tiny_docs[10:30], pages_dir)

    out1 = str(tmp_path / "dd_out1")
    q = stream_dedup_urls(spark, pages_dir, out1, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out1).collect()
    firsts = [r for r in rows if r["first_seen"]]
    assert len(firsts) == 30  # urls 0-29, each emitted exactly once
    assert len({r["url"] for r in firsts}) == 30
    assert all(r["warc_ts"] is not None for r in firsts)
    # running duplicate count: max n_dropped per url sums to the 10 re-crawls
    per_url = {}
    for r in rows:
        per_url[r["url"]] = max(per_url.get(r["url"], 0), r["n_dropped"])
    assert sum(per_url.values()) == 10

    # restart with a THIRD wave: all 30 urls again. State persisted in the
    # checkpoint => NO first_seen rows, and n_dropped continues counting up
    # from the pre-restart state.
    _write_pages(spark, tiny_docs[:30], pages_dir)
    out2 = str(tmp_path / "dd_out2")
    q2 = stream_dedup_urls(spark, pages_dir, out2, ckpt)
    q2.awaitTermination(120)
    rows2 = spark.read.parquet(out2).collect()
    assert rows2 and all(not r["first_seen"] for r in rows2)
    per_url2 = {}
    for r in rows2:
        per_url2[r["url"]] = max(per_url2.get(r["url"], 0), r["n_dropped"])
    # urls 10-19 carried n_dropped=1 across the restart -> now 2; rest 1
    assert sum(per_url2.values()) == 40


def test_windowed_watermark_aggregation(spark, tmp_path):
    import pyspark.sql.functions as F

    from newsspark.streaming import stream_event_counts

    events_dir = str(tmp_path / "events")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.parquet(events_dir)

    q = stream_event_counts(spark, events_dir, query_name="ec_test")
    q.awaitTermination(120)
    got = spark.sql("select * from ec_test")

    # every emitted (closed) window must match the batch aggregation exactly
    batch = (
        src.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            F.col("n_events"),
        )
    )
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    rows = got.collect()
    assert rows, "watermark should close most historical windows"
    for r in rows:
        assert b[(r["window_start"], r["event_type"])] == r["n_events"]
    # append mode withholds the windows still inside the watermark:
    # the stream must emit strictly fewer groups than the full batch agg
    assert len(rows) < len(b)


def test_stream_hourly_counts_converges_to_batch(spark, tmp_path):
    """Watermark + append convergence: base wave, then LATE re-deliveries of
    earlier hours (inside the watermark -> merged into their original
    windows), then a far-future sentinel that closes every real window.
    The converged sink must equal the batch GROUP BY over the non-sentinel
    events, with each window emitted exactly once."""
    from pyspark.sql import functions as F

    from newsspark.streaming import stream_hourly_counts

    ddl = ("event_id long, ts string, user_id long, event_type string, "
           "value double, props string")

    def mk(rows):
        return spark.createDataFrame(rows, ddl).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    base = mk([
        (1, "2024-03-01 00:10:00", 1, "click", 1.5, "{}"),
        (2, "2024-03-01 00:40:00", 2, "click", 2.0, "{}"),
        (3, "2024-03-01 01:05:00", 1, "view", 3.25, "{}"),
        (4, "2024-03-01 02:59:00", 3, "click", 0.75, "{}"),
    ])
    late = mk([  # hour-00 and hour-01 events arriving after hour-02 was seen
        (5, "2024-03-01 00:20:00", 4, "click", 10.0, "{}"),
        (6, "2024-03-01 01:30:00", 5, "view", 4.5, "{}"),
    ])
    sentinel = mk([(-1, "2024-03-20 00:00:00", 0, "sentinel", 0.0, "{}")])

    from newsspark.streaming import stamp_wave_order

    ev_dir = str(tmp_path / "events")
    stamped = set()
    for k, wave in enumerate((base, late, sentinel)):
        wave.repartition(1).write.mode("append").parquet(ev_dir)
        stamp_wave_order(ev_dir, k, stamped)
    q = stream_hourly_counts(
        spark, ev_dir, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(300), "stream did not drain"

    out = spark.read.parquet(str(tmp_path / "out"))
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"],
                                                    r["total_value"])
        for r in out.collect()
    }
    assert len(got) == out.count(), "a window emitted more than once"
    expected = {
        ("2024-03-01 00:00:00", "click"): (3, 13.5),  # late event 5 merged
        ("2024-03-01 01:00:00", "view"): (2, 7.75),   # late event 6 merged
        ("2024-03-01 02:00:00", "click"): (1, 0.75),
    }
    assert got == expected  # sentinel window absent: never closed


def test_stream_hourly_counts_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-restart recovery for the windowed agg: a first query drains
    the base wave and stops; a NEW query on the SAME checkpoint ingests the
    late wave + sentinel.  Window state must survive the restart — late
    events merge into windows opened before the kill, each window still
    emits exactly once, and the converged sink equals the batch GROUP BY."""
    from pyspark.sql import functions as F

    from newsspark.streaming import stream_hourly_counts

    ddl = ("event_id long, ts string, user_id long, event_type string, "
           "value double, props string")

    def mk(rows):
        return spark.createDataFrame(rows, ddl).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    ev_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("ev", "out", "ck"))
    base = mk([
        (1, "2024-03-01 00:10:00", 1, "click", 1.0, "{}"),
        (2, "2024-03-01 01:20:00", 2, "view", 2.0, "{}"),
    ])
    base.repartition(1).write.mode("append").parquet(ev_dir)
    q1 = stream_hourly_counts(spark, ev_dir, out_dir, ckpt)
    assert q1.awaitTermination(300)
    # nothing can have emitted yet: watermark trails max event time by 72h
    try:
        n_emitted = spark.read.parquet(out_dir).count()
    except Exception:  # no readable epoch partitions at all
        n_emitted = 0
    assert n_emitted == 0

    from newsspark.streaming import stamp_wave_order

    stamped = set()
    stamp_wave_order(ev_dir, 0, stamped)  # base wave already present
    late = mk([(3, "2024-03-01 00:40:00", 3, "click", 4.0, "{}")])
    sentinel = mk([(-1, "2024-03-20 00:00:00", 0, "sentinel", 0.0, "{}")])
    late.repartition(1).write.mode("append").parquet(ev_dir)
    stamp_wave_order(ev_dir, 1, stamped)
    sentinel.repartition(1).write.mode("append").parquet(ev_dir)
    stamp_wave_order(ev_dir, 2, stamped)
    q2 = stream_hourly_counts(spark, ev_dir, out_dir, ckpt)  # RESTART
    assert q2.awaitTermination(300)

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"],
                                                    r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        ("2024-03-01 00:00:00", "click"): (2, 5.0),  # late merged post-restart
        ("2024-03-01 01:00:00", "view"): (1, 2.0),
    }


def test_epoch_idempotent_writer_survives_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the parquet commit
    and the checkpoint offset write replays the epoch.  The epoch-keyed
    overwrite sink must make the replay a no-op instead of doubling rows."""
    from newsspark.streaming import epoch_idempotent_writer

    out = str(tmp_path / "out")
    write = epoch_idempotent_writer(out)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write(df, 7)
    write(df, 7)          # simulated replay of the same epoch
    write(df.where("k = 1"), 8)
    got = spark.read.parquet(out)
    assert got.count() == 3  # 2 from epoch 7 (once), 1 from epoch 8
    assert got.where("epoch = 7").count() == 2
