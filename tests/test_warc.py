"""WARC source/sink: byte-exact round trip, distributed scan grain, and
extraction parity with the direct pages path."""
from datetime import datetime

import pytest

from newsspark.pages import pages_pdf
from newsspark.warc import read_warc, read_warc_file, write_warc


@pytest.fixture()
def corpus(tiny_docs):
    pdf = pages_pdf(
        [d for d, _ in tiny_docs[:60]], [t for _, t in tiny_docs[:60]]
    )
    return pdf


def test_warc_roundtrip_byte_exact(tmp_path, corpus):
    path = str(tmp_path / "a.warc")
    n = write_warc(
        path, zip(corpus["url"], corpus["warc_ts"], corpus["html"])
    )
    rows = read_warc_file(path)
    assert n == len(rows) == len(corpus)
    by_url = {r["url"]: r for r in rows}
    for _, rec in corpus.iterrows():
        got = by_url[rec["url"]]
        assert bytes(got["html"]) == bytes(rec["html"] or b"")  # byte-exact
        assert got["warc_ts"] == rec["warc_ts"].to_pydatetime().replace(
            tzinfo=None
        )


def test_warc_empty_html_record(tmp_path):
    path = str(tmp_path / "e.warc")
    write_warc(path, [("https://x.com/a", datetime(2026, 1, 1), b"")])
    rows = read_warc_file(path)
    assert rows[0]["html"] == b"" and rows[0]["url"] == "https://x.com/a"


def test_warc_distributed_read_one_task_per_file(spark, tmp_path, corpus):
    expected_sizes = []
    paths = []
    for i in range(4):
        part = corpus.iloc[i::4]
        p = str(tmp_path / f"part-{i}.warc")
        write_warc(p, zip(part["url"], part["warc_ts"], part["html"]))
        paths.append(p)
        expected_sizes.append(len(part))
    df = read_warc(spark, paths)
    assert df.rdd.getNumPartitions() == 4  # the CC per-file grain
    # the r1-review bug: hash repartition collided files into shared tasks
    # while other tasks sat empty — assert EXACTLY one file per partition
    sizes = sorted(len(p) for p in df.rdd.glom().collect())
    assert sizes == sorted(expected_sizes), sizes
    assert df.count() == len(corpus)


def test_warc_gzip_roundtrip(tmp_path, corpus):
    path = str(tmp_path / "a.warc.gz")
    part = corpus.iloc[:20]
    n = write_warc(path, zip(part["url"], part["warc_ts"], part["html"]))
    rows = read_warc_file(path)  # magic-byte sniffed, not extension
    assert n == len(rows) == 20
    assert {r["url"] for r in rows} == set(part["url"])


def test_warc_truncated_file_fails_loudly(tmp_path, corpus):
    path = str(tmp_path / "t.warc")
    part = corpus.iloc[:10]
    write_warc(path, zip(part["url"], part["warc_ts"], part["html"]))
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) - len(data) // 3])
    with pytest.raises(ValueError, match="truncated WARC record"):
        read_warc_file(path)


def test_warc_extraction_matches_direct_pages(spark, tmp_path, corpus):
    from newsspark.pipeline import run_extract

    paths = []
    for i in range(3):
        part = corpus.iloc[i::3]
        p = str(tmp_path / f"w-{i}.warc")
        write_warc(p, zip(part["url"], part["warc_ts"], part["html"]))
        paths.append(p)
    via_warc = {
        r["url"]: r
        for r in run_extract(spark, read_warc(spark, paths),
                             num_partitions=4).collect()
    }
    direct_pages = spark.createDataFrame(
        corpus[["url", "html"]], "url string, html binary"
    )
    direct = {
        r["url"]: r
        for r in run_extract(spark, direct_pages, num_partitions=4).collect()
    }
    assert set(via_warc) == set(direct)
    for url in direct:
        for f in ("title", "text", "date", "method", "error"):
            assert via_warc[url][f] == direct[url][f], (url, f)
        assert list(via_warc[url]["images"] or []) == list(
            direct[url]["images"] or []
        )


def test_warc_fat_file_streams_in_bounded_chunks(tmp_path, tiny_docs):
    """CC files vary ~10x in record count; the per-file scan must stream —
    every yielded pandas chunk is bounded by chunk_records no matter how fat
    the file (VERDICT r2 #5)."""
    from newsspark.warc import _scan_chunks

    docs = (tiny_docs * 20)[:1000]  # one fat 1000-record file
    pdf = pages_pdf(list(range(1000)), [t for _, t in docs])
    path = str(tmp_path / "fat.warc.gz")
    n = write_warc(path, zip(pdf["url"], pdf["warc_ts"], pdf["html"]))
    assert n == 1000
    chunks = list(_scan_chunks([path], chunk_records=64))
    assert max(len(c) for c in chunks) <= 64
    assert sum(len(c) for c in chunks) == 1000
    assert len(chunks) >= 1000 // 64


def test_warc_corrupt_file_fails_alone_with_path(spark, tmp_path, corpus):
    """One corrupt file must fail only its own task, and the failure must
    name the file — the other files' records are all readable without it."""
    good = []
    for i in range(3):
        part = corpus.iloc[i::3]
        p = str(tmp_path / f"ok-{i}.warc")
        write_warc(p, zip(part["url"], part["warc_ts"], part["html"]))
        good.append(p)
    bad = str(tmp_path / "corrupt.warc")
    data = open(good[0], "rb").read()
    open(bad, "wb").write(data[: len(data) - len(data) // 3])
    with pytest.raises(Exception, match="corrupt.warc"):
        read_warc(spark, good + [bad]).count()
    assert read_warc(spark, good).count() == len(corpus)


def test_warc_rejects_fractional_timestamps(tmp_path):
    """WARC-Date is second-precision here; silently truncating microseconds
    would break the byte-exact round-trip contract (ADVICE r2)."""
    with pytest.raises(ValueError, match="second-precision"):
        write_warc(
            str(tmp_path / "f.warc"),
            [("https://x.com/a", datetime(2026, 1, 1, 0, 0, 0, 123), b"")],
        )


def test_warc_gzip_close_releases_fd(tmp_path, corpus):
    """The gzip path must not leak the underlying fd (GzipFile.close() does
    not close a caller-supplied fileobj — ADVICE r2: reopen by path)."""
    import os

    path = str(tmp_path / "fd.warc.gz")
    part = corpus.iloc[:5]
    write_warc(path, zip(part["url"], part["warc_ts"], part["html"]))
    fd_dir = "/proc/self/fd"
    def open_fds():
        return {f for f in os.listdir(fd_dir)
                if os.path.realpath(os.path.join(fd_dir, f)) == os.path.realpath(path)}
    assert not open_fds()
    for _ in range(5):
        rows = read_warc_file(path)
        assert len(rows) == 5
    assert not open_fds()


def test_warc_quarantine_mode_keeps_going(spark, tmp_path, corpus):
    """read_warc_quarantine: a corrupt file yields its already-scanned
    records plus ONE (src_path, error) quarantine row; every other file's
    records are unaffected — the 70k-file-crawl keep-going mode."""
    from newsspark.warc import read_warc_quarantine

    good = []
    for i in range(3):
        part = corpus.iloc[i::3]
        p = str(tmp_path / f"ok-{i}.warc")
        write_warc(p, zip(part["url"], part["warc_ts"], part["html"]))
        good.append(p)
    bad = str(tmp_path / "corrupt.warc")
    data = open(good[0], "rb").read()
    open(bad, "wb").write(data[: len(data) - len(data) // 3])
    df = read_warc_quarantine(spark, good + [bad]).cache()
    try:
        errs = df.where("error is not null").collect()
        assert len(errs) == 1
        assert errs[0]["src_path"] == bad and "truncated" in errs[0]["error"]
        ok = df.where("error is null")
        assert ok.count() >= len(corpus)  # all good files + bad's prefix
        good_urls = {r["url"] for r in ok.collect()}
        assert set(corpus["url"]) <= good_urls
        # the clean slice feeds run_extract unchanged
        from newsspark.pipeline import run_extract

        out = run_extract(
            spark, ok.select("url", "warc_ts", "html"), num_partitions=4
        )
        assert out.count() == ok.count()
    finally:
        df.unpersist()
