"""PDF layout parse: writer/parser round trips, content-stream text-operator
semantics (escapes, hex strings, TJ joins, Td line moves), totality on
corrupt bytes, and the Spark mapInPandas surface against the DuckDB-replayed
expectation."""
import zlib

import pytest
from pyspark.sql import functions as F

from newsspark.pdfops import (
    PAGE_CHARS,
    _content_text,
    extract_pdf_table,
    parse_pdf,
    synth_pdf,
    synth_pdf_table,
)

SF = "/root/testdata/sf0.001"


# --- pure-Python layer -------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5])
def test_round_trip_all_encodings(doc_id):
    """Tj (doc%3==0), TJ array (==1), hex-first TJ (==2), compressed and
    uncompressed streams: extraction returns the body byte-identically with
    pages rejoined by newline."""
    body = ("alpha beta (gamma) d\\e " * 20) + f" (doc {doc_id})"
    r = parse_pdf(synth_pdf(doc_id, f"doc-{doc_id}", body))
    pages = [body[i: i + PAGE_CHARS] for i in range(0, len(body), PAGE_CHARS)]
    assert r["error"] is None
    assert r["title"] == f"doc-{doc_id}"
    assert r["n_pages"] == len(pages)
    assert r["text"] == "\n".join(pages)


def test_pagination_boundaries():
    for n in (PAGE_CHARS - 1, PAGE_CHARS, PAGE_CHARS + 1, 3 * PAGE_CHARS):
        body = "x" * n
        r = parse_pdf(synth_pdf(0, "t", body))
        assert r["n_pages"] == -(-n // PAGE_CHARS)
        assert r["text"].replace("\n", "") == body


def test_content_text_operator_semantics():
    """Hand-written content stream: Td starts a new line, ' shows on a new
    line, TJ joins its strings directly, escapes and octal decode."""
    stream = (
        b"BT /F1 12 Tf 72 720 Td (line one \\(quoted\\)) Tj "
        b"0 -14 Td [(tee) -250 (jay)] TJ "
        b"(apostrophe line) ' "
        b"0 -14 Td (oct\\101l and \\\\slash) Tj ET"
    )
    assert _content_text(stream) == (
        "line one (quoted)\nteejay\napostrophe line\noctAl and \\slash"
    )


def test_content_text_hex_and_whitespace():
    # hex strings decode bytewise; embedded whitespace inside <…> is ignored
    stream = b"BT <48 65 6c 6c 6f> Tj ( world) Tj ET"
    assert _content_text(stream) == "Hello world"


def test_parse_total_on_garbage():
    assert parse_pdf(b"")["error"].startswith("not-a-pdf")
    assert parse_pdf(b"\x00\x01\x02")["error"].startswith("not-a-pdf")
    r = parse_pdf(b"%PDF-1.4\nnothing else")
    assert r["error"] is None and r["n_pages"] == 0 and r["text"] == ""


def test_parse_total_on_corrupt_flate():
    pdf = bytearray(synth_pdf(0, "t", "hello world " * 40))
    # smash the middle of the first compressed stream body
    at = pdf.find(b"stream\n") + 10
    pdf[at: at + 8] = b"\x00" * 8
    r = parse_pdf(bytes(pdf))
    # totality is the contract: either an error row or degraded text,
    # never a raise
    assert isinstance(r, dict) and set(r) == {"title", "text", "n_pages",
                                              "error"}


def test_info_title_with_escapes():
    r = parse_pdf(synth_pdf(7, "a (b) \\ c", "body text here"))
    assert r["title"] == "a (b) \\ c"


# --- Spark surface -----------------------------------------------------------


def test_spark_round_trip_matches_expectation(spark):
    """synth_pdf_table -> extract_pdf_table over real documents rows equals
    the pure-string expectation (the DuckDB oracle's formula)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    out = (
        extract_pdf_table(synth_pdf_table(docs, num_partitions=4))
        .orderBy("doc_id")
        .toPandas()
    )
    exp = {
        int(r["doc_id"]): f"{r['text']} (doc {int(r['doc_id'])})"
        for r in docs.select("doc_id", "text").collect()
    }
    assert len(out) == len(exp)
    assert out["error"].isna().all()
    for _, row in out.iterrows():
        body = exp[int(row["doc_id"])]
        pages = [body[i: i + PAGE_CHARS]
                 for i in range(0, len(body), PAGE_CHARS)]
        assert row["title"] == f"doc-{int(row['doc_id'])}"
        assert row["text"] == "\n".join(pages)
        assert int(row["n_pages"]) == len(pages)


def test_spark_corrupt_payload_isolated(spark):
    """One corrupt payload yields one error row; the good rows still
    extract — per-row totality through the Arrow batch path."""
    good = synth_pdf(1, "doc-1", "fine text " * 30)
    rows = [(1, bytearray(good)), (2, bytearray(b"not a pdf at all")),
            (3, None)]
    pdfs = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {int(r["doc_id"]): r
           for r in extract_pdf_table(pdfs).collect()}
    assert out[1]["error"] is None and out[1]["n_pages"] >= 1
    assert out[2]["error"] is not None
    assert out[3]["error"] is not None


def test_plan_is_shuffle_free_after_spread(spark):
    """The parse stage itself adds no exchange beyond the explicit spread
    repartition — pure map over Arrow batches."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        extract_pdf_table(synth_pdf_table(docs, num_partitions=4))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # the single doc-hash spread
    assert plan.count("MapInPandas") == 2  # synth + parse, fused map stages


# --- property layer ----------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_latin1_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF,
                           exclude_characters="\x7f"),
    max_size=600,
)


@settings(max_examples=60, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=10**9), body=_latin1_line,
       title=_latin1_line)
def test_round_trip_property(doc_id, body, title):
    """Any printable-latin-1 body/title (incl. parens, backslashes, octal-
    looking digits) survives write->parse byte-identically with correct
    pagination — the writer's escaping and the parser's unescaping are
    exact inverses."""
    r = parse_pdf(synth_pdf(doc_id, title, body))
    pages = [body[i: i + PAGE_CHARS] for i in range(0, len(body), PAGE_CHARS)]
    assert r["error"] is None
    assert r["title"] == title
    assert r["text"] == "\n".join(pages) if pages else r["text"] == ""
    assert r["n_pages"] == max(1, len(pages))


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=400))
def test_parse_total_property(data):
    """parse_pdf never raises on arbitrary byte soup."""
    r = parse_pdf(data)
    assert set(r) == {"title", "text", "n_pages", "error"}


@pytest.mark.parametrize("evil", [
    "text with endobj inside",
    "stream\nendstream here",
    "x endobj yx 5 0 obj z" * 30,
    "a endstream b" * 40,
])
@pytest.mark.parametrize("doc_id", [2, 5])  # %3==2 -> uncompressed streams
def test_structural_keywords_in_body(doc_id, evil):
    """PDF structural keywords appearing INSIDE an uncompressed text stream
    must not truncate the object scan — the scanner skips stream payloads
    by /Length (regression: multi-page uncompressed bodies containing
    'endobj' silently extracted as empty)."""
    r = parse_pdf(synth_pdf(doc_id, "tt", evil))
    pages = [evil[i: i + PAGE_CHARS] for i in range(0, len(evil), PAGE_CHARS)]
    assert r["error"] is None
    assert r["text"] == "\n".join(pages)


@pytest.mark.parametrize("title", [
    "x endobj y", "a 5 0 obj b", "stream", "(nested) endobj",
])
def test_structural_keywords_in_title(title):
    """Keywords inside the Info /Title literal must not terminate the
    object scan — dict-level searches skip string literals."""
    r = parse_pdf(synth_pdf(0, title, "body words"))
    assert r["title"] == title and r["text"] == "body words"


@pytest.mark.parametrize("objnum", ["8", "12", "123"])
def test_indirect_length_reference_not_misread_multidigit(objnum):
    """Backtracking regression: with '/Length 123 0 R' the old lookahead
    backtracked to group '12' and read a fake 12-byte literal length —
    multi-digit indirect object numbers must also fall to the endstream
    scan."""
    body = b"BT 72 720 Td (multi digit indirect ok) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + objnum.encode() + b" 0 R >>\nstream\n"
        + body + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    r = parse_pdf(pdf)
    assert r["error"] is None
    assert r["text"] == "multi digit indirect ok"


def test_indirect_length_reference_not_misread():
    """'/Length 8 0 R' (the common indirect form) must NOT be read as a
    literal 8-byte length — that truncated the stream payload silently.
    Without a resolvable literal the parser falls back to the endstream
    scan and still extracts the text."""
    body = b"BT 72 720 Td (indirect length works) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 8 0 R >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"8 0 obj\n" + str(len(body)).encode() + b"\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    r = parse_pdf(pdf)
    assert r["error"] is None
    assert r["text"] == "indirect length works"
    assert r["n_pages"] == 1


def test_corpus_stays_latin1_for_pdf_oracle():
    """synth_pdf encodes text as latin-1/'replace' while the DuckDB
    pdf_extract oracle replays the ORIGINAL string — parity holds only
    while documents.text is pure latin-1 (ADVICE r3).  Assert it per sf
    dir so a corpus regeneration with real CJK text fails HERE with a
    clear message, not as an opaque oracle hash mismatch."""
    import glob

    import pyarrow.parquet as pq_mod

    checked = 0
    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        pq = f"{sf_dir}/documents.parquet"
        texts = pq_mod.read_table(pq, columns=["text"])["text"].to_pylist()
        bad = [t for t in texts if t is not None
               and any(ord(ch) > 255 for ch in t)]
        assert not bad, (
            f"{pq}: {len(bad)} documents.text rows contain codepoints > "
            "U+00FF; pdfops.synth_pdf would '?'-replace them and the "
            "pdf_extract DuckDB oracle (which replays the original string) "
            "would hash-mismatch.  Either keep the corpus latin-1 or "
            "extend synth_pdf + the oracle together (see the pdfops.py "
            "module docstring)."
        )
        checked += len(texts)
    assert checked > 0
