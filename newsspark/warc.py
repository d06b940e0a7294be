"""Minimal WARC 1.0 source/sink — Common Crawl's native archive format.

The reference consumes live HTTP responses (extractor.py:32-44); the batch
analog of "a crawl" is a directory of WARC files, so this module provides:

- ``write_warc(path, records)``: serialize (url, warc_ts, html) triples as
  WARC *response* records with correct Content-Length framing and an
  embedded HTTP/1.1 response head (the Common Crawl layout).  Used by tests
  and fixture generation; deterministic (record ids derive from the url,
  no RNG/clock).
- ``read_warc(spark, paths)``: distributed reader — ONE TASK PER FILE, the
  canonical Common-Crawl processing grain (WARC members are gzip-framed or
  length-framed and not block-splittable, so CC pipelines parallelize
  across the ~1 GB files, not within them).  Each task runs the pure-stdlib
  record scanner below and emits the pages schema ``(url, warc_ts,
  html binary)`` ready for ``pipeline.run_extract``.

Scale notes: the file listing is a tiny driver-side array (CC publishes
~70k warc paths per crawl); payload bytes stay in one Arrow column end to
end; a corrupt record raises within its file's task and fails ONLY that
file — pair with run_with_checkpoint-style lineage for resume.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone
from typing import Iterable, Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"

WARC_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"


def _warc_date(ts: datetime) -> str:
    if ts.microsecond:
        # WARC-Date here is second-precision (WARC 1.0's uuri grammar); a
        # silent truncate would break the documented byte-exact round trip,
        # so fractional timestamps are an explicit caller error (ADVICE r2)
        raise ValueError(
            f"warc_ts must be second-precision, got microsecond={ts.microsecond}"
        )
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def write_warc(path: str, records: Iterable[Tuple[str, datetime, bytes]]) -> int:
    """Write records as WARC/1.0 response members; returns the count.
    Record ids are md5(url)-derived urns — deterministic by design.
    A ``.gz`` suffix writes gzip-compressed output (the CC layout)."""
    n = 0
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        for url, ts, html in records:
            html = html if html is not None else b""
            http_head = (
                b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html" + _CRLF
                + f"Content-Length: {len(html)}".encode() + _CRLF + _CRLF
            )
            block = http_head + html
            rid = hashlib.md5(url.encode("utf-8")).hexdigest()
            head = (
                b"WARC/1.0" + _CRLF
                + b"WARC-Type: response" + _CRLF
                + f"WARC-Record-ID: <urn:md5:{rid}>".encode() + _CRLF
                + f"WARC-Date: {_warc_date(ts)}".encode() + _CRLF
                + f"WARC-Target-URI: {url}".encode() + _CRLF
                + b"Content-Type: application/http; msgtype=response" + _CRLF
                + f"Content-Length: {len(block)}".encode() + _CRLF + _CRLF
            )
            f.write(head + block + _CRLF + _CRLF)
            n += 1
    return n


def _parse_warc_stream(f: io.BufferedReader) -> Iterator[dict]:
    """Sequential record scanner: header block -> Content-Length payload ->
    record separator.  Skips non-response records (warcinfo, request, ...)."""
    while True:
        line = f.readline()
        if not line:
            return
        if line.strip() == b"":  # inter-record padding
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers = {}
        while True:
            h = f.readline()
            if h in (_CRLF, b"\n", b""):
                break
            name, _, value = h.partition(b":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers.get(b"content-length", b"0"))
        block = f.read(length)
        if len(block) != length:
            raise ValueError(
                f"truncated WARC record: expected {length} payload bytes, "
                f"got {len(block)}"
            )
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8")
        date = headers.get(b"warc-date", b"").decode("ascii")
        # strip the embedded HTTP response head
        sep = block.find(_CRLF + _CRLF)
        html = block[sep + 4:] if sep >= 0 else block
        yield {
            "url": url,
            "warc_ts": datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ"),
            "html": html,
        }


def _open_warc(path: str):
    """Open plain or gzip-member WARC (real Common Crawl files are
    *.warc.gz) — sniffed by magic bytes, not the filename.  The gzip path
    reopens by path: GzipFile.close() does not close a caller-supplied
    fileobj, which would leak the underlying fd in long-lived executor
    tasks scanning many files (ADVICE r2)."""
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def iter_warc_file(path: str) -> Iterator[dict]:
    with _open_warc(path) as f:
        yield from _parse_warc_stream(f)


def read_warc_file(path: str) -> List[dict]:
    return list(iter_warc_file(path))


def _scan_chunks(
    paths: Iterable[str], chunk_records: int, quarantine: bool = False
) -> Iterator[pd.DataFrame]:
    """Per-file streaming scan: yields pandas chunks of AT MOST
    ``chunk_records`` rows, so worker memory is bounded by chunk size no
    matter how fat one file is (CC files vary ~10x in record count — the
    skew unit is the file, and this is the per-task bound).

    ``quarantine=False`` (strict): a parse error is re-raised with the
    offending PATH, so a corrupt file is identifiable from its task
    failure.  ``quarantine=True`` (keep-going): the records scanned before
    the failure are emitted, plus one ``(src_path, error)`` row with null
    url/html, and the scan moves on to the next file; rows gain
    ``src_path``/``error`` columns (null error = clean record)."""
    cols = (
        ["url", "warc_ts", "html", "src_path", "error"]
        if quarantine
        else ["url", "warc_ts", "html"]
    )
    for p in paths:
        buf: List[dict] = []
        try:
            for rec in iter_warc_file(p):
                if quarantine:
                    rec["src_path"] = p
                    rec["error"] = None
                buf.append(rec)
                if len(buf) >= chunk_records:
                    yield pd.DataFrame(buf, columns=cols)
                    buf = []
        except Exception as exc:
            if not quarantine:
                raise ValueError(f"WARC scan failed in {p}: {exc}") from exc
            buf.append(
                {
                    "url": None,
                    "warc_ts": None,
                    "html": None,
                    "src_path": p,
                    "error": f"{type(exc).__name__}: {exc}",
                }
            )
        if buf:
            yield pd.DataFrame(buf, columns=cols)


def read_warc(
    spark: SparkSession, paths: List[str], chunk_records: int = 256
) -> DataFrame:
    """Distributed WARC scan: EXACTLY one file per task (the path list is
    parallelized with one slice per path — a hash repartition would collide
    files into shared tasks), parsed executor-side via mapInPandas.  Records
    stream out in ``chunk_records`` batches so a ~1 GB file never
    materializes in worker memory at once; the driver only ever holds the
    path list.  A corrupt file fails only its own task, with the path in
    the error; for the keep-going production mode see
    :func:`read_warc_quarantine`."""
    paths = list(paths)
    rdd = spark.sparkContext.parallelize(
        [(p,) for p in paths], numSlices=max(len(paths), 1)
    )
    files = spark.createDataFrame(rdd, "path string")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield from _scan_chunks(b["path"], chunk_records)

    return files.mapInPandas(scan, schema=WARC_PAGES_SCHEMA)


WARC_PAGES_Q_SCHEMA = (
    "url string, warc_ts timestamp, html binary, src_path string, "
    "error string"
)


def read_warc_quarantine(
    spark: SparkSession, paths: List[str], chunk_records: int = 256
) -> DataFrame:
    """Error-isolating WARC scan for real crawls (~70k files/crawl, some
    always corrupt): same one-file-per-task grain and bounded streaming as
    :func:`read_warc`, but a file that fails mid-parse emits the records
    already scanned PLUS one quarantine row ``(src_path, error)`` with null
    url/html, instead of failing the job.  Filter ``error IS NULL`` (and
    drop src_path) to feed ``pipeline.run_extract``; the error rows are the
    file-level quarantine table, the same pattern as the extraction job's
    per-row error column."""
    paths = list(paths)
    rdd = spark.sparkContext.parallelize(
        [(p,) for p in paths], numSlices=max(len(paths), 1)
    )
    files = spark.createDataFrame(rdd, "path string")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield from _scan_chunks(b["path"], chunk_records, quarantine=True)

    return files.mapInPandas(scan, schema=WARC_PAGES_Q_SCHEMA)
