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
