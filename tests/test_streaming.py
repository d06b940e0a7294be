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
