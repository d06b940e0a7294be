"""PDF layout parse — the north-rule's third extraction surface (after HTML
boilerplate strip and DOM heuristics): a from-scratch, stdlib-only PDF text
extractor plus a deterministic synthesizer, run as ``mapInPandas`` over a
binary payload column.

No PDF library exists in the sandbox (and the reference pipeline is
HTML-only), so — exactly like the HTML engines (engines.py) — the format
layer is rebuilt from the spec on the stdlib: ``zlib`` is the real
FlateDecode, object/xref/page-tree parsing is real, and the content-stream
tokenizer handles the actual text operators (Tj, TJ arrays, ``'``/``"``
line-shows, Td/TD/T* line moves, literal-string escapes ``\\( \\) \\\\ \\n
\\r \\t \\ooo`` and nested parens, hex strings).  What is NOT here: fonts,
CMaps/ToUnicode, rotation, or rendering — text is assumed PDFDocEncoding
(latin-1 superset), the synthetic-corpus contract, documented like the
multimodal pixel boundary (multimodal.py).

Scale shape (100 TB): one ``mapInPandas`` pass over the payload column —
pure map, no shuffle; partitions spread by doc hash before the CPU-heavy
parse (the tiny-parquet one-partition trap, CLAUDE.md).  Every parse is
TOTAL: corrupt bytes produce an ``error`` row, never an executor death.

Driver contract: ``pdf_extract`` synthesizes a PDF per ``documents`` row
(pagination at PAGE_CHARS chars, title in the Info dict, Tj vs TJ vs
hex-string encodings rotated by doc_id) and extracts it back; because the
synthesis is a pure function of (doc_id, text), DuckDB replays the round
trip as string arithmetic — an exact oracle over any corpus.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAGE_CHARS = 200  # synth pagination: chars per page (chars==bytes, ASCII)

PDF_OUT_DDL = (
    "doc_id long, title string, text string, n_pages long, error string"
)

# ---------------------------------------------------------------------------
# writer (deterministic synthesizer)
# ---------------------------------------------------------------------------


def _esc_literal(s: str) -> bytes:
    """PDF literal-string escaping: backslash, then both parens."""
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1", "replace")


def _show_ops(chunk: str, mode: int) -> bytes:
    """One page's text-showing operators in one of three spec encodings:
    mode 0 — single literal ``(…) Tj``;
    mode 1 — ``TJ`` array of three slices with kerning numbers (extractors
    join TJ strings directly);
    mode 2 — ``TJ`` whose first slice is a hex string ``<…>``."""
    if mode == 0:
        return b"(" + _esc_literal(chunk) + b") Tj\n"
    third = max(1, len(chunk) // 3)
    a, b, c = chunk[:third], chunk[third : 2 * third], chunk[2 * third :]
    if mode == 2:
        first = b"<" + a.encode("latin-1", "replace").hex().encode() + b">"
    else:
        first = b"(" + _esc_literal(a) + b")"
    return (
        b"[" + first + b" -250 (" + _esc_literal(b) + b") -250 ("
        + _esc_literal(c) + b")] TJ\n"
    )


def synth_pdf(doc_id: int, title: str, body: str) -> bytes:
    """Deterministic minimal-but-valid PDF: catalog → page tree → one page
    per PAGE_CHARS chunk of ``body``, each with its own content stream
    (Flate-compressed unless doc_id % 3 == 2, so both filter paths flow
    through the oracle), plus an Info dict carrying ``title``.  Pure
    function of its arguments — no clocks, no randomness."""
    pages = [body[i : i + PAGE_CHARS] for i in range(0, len(body), PAGE_CHARS)]
    if not pages:
        pages = [""]
    mode = doc_id % 3  # rotate Tj / TJ / hex-TJ encodings across the corpus
    compress = doc_id % 3 != 2

    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    # 1 catalog, 2 pages-tree, 3 font, 4 info; pages at 5..4+n; streams after
    kids = b" ".join(b"%d 0 R" % (5 + i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    objs[4] = b"<< /Title (" + _esc_literal(title) + b") >>"
    for i, chunk in enumerate(pages):
        content = (
            b"BT\n/F1 12 Tf\n72 720 Td\n" + _show_ops(chunk, mode) + b"ET\n"
        )
        stream_obj = 5 + n_pages + i
        objs[5 + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % stream_obj
        )
        data = zlib.compress(content, 6) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        objs[stream_obj] = (
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(data)
            + data
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info 4 0 R >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (n_obj, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# reader (from-scratch extractor)
# ---------------------------------------------------------------------------

_OBJ_START_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
# precompiled hot patterns (r6: the per-call re.match/re.search module
# helpers were ~30% of parse_pdf's profile via cache lookups + slicing)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d|\s+\d+\s+R)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,8}")  # {1,8} == the old 8-byte slice cap
_WS_RE = re.compile(rb"\s")
_NUM_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_TITLE_OPEN_RE = re.compile(rb"/Title\s*\(")
_NAME_RE_CACHE: dict = {}


def _name_res(name: str):
    got = _NAME_RE_CACHE.get(name)
    if got is None:
        got = (
            re.compile(rb"/" + name.encode() + rb"\s+(\d+)\s+\d+\s+R"),
            re.compile(rb"/" + name.encode() + rb"\s*\[(.*?)\]", re.S),
        )
        _NAME_RE_CACHE[name] = got
    return got


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _find_outside_literals(
    data: bytes, token: bytes, start: int, stop: int | None = None
) -> int:
    """Index of ``token`` in ``data[start:stop]``, skipping ``(…)`` string
    literals (a /Title like ``(x endobj y)`` must not terminate the object
    scan).  Hex strings cannot contain the keywords ('n','o','j' are not
    hex digits), so only literals need skipping."""
    i = start
    n = len(data) if stop is None else min(stop, len(data))
    first = token[0]
    while i < n:
        c = data[i]
        if c == 0x28:  # ( — skip the whole literal, escapes included
            _, i = _parse_literal(data, i)
        elif c == first and data.startswith(token, i) and i + len(token) <= n:
            return i
        else:
            i += 1
    return -1


def _objects(data: bytes) -> dict[int, bytes]:
    """Sequential object scan that SKIPS stream payloads by their /Length
    before looking for ``endobj`` — a payload (uncompressed text, or 1/77
    of compressed bytes) may legitimately contain the literal ``endobj``,
    and a non-greedy regex truncates the object there (silent text loss,
    caught by an adversarial test).  Dict-level searches are string-literal
    aware for the same reason (titles).  Falls back to the nearest
    ``endstream`` when /Length is absent."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if not m:
            return objs
        num, body_start = int(m.group(1)), m.end()
        sm = _STREAM_RE.search(data, body_start)
        # bound the dict-level walk at the stream keyword so payload bytes
        # are never scanned per-byte; -1 here means "no endobj before the
        # stream", i.e. the stream belongs to THIS object
        end = _find_outside_literals(
            data, b"endobj", body_start,
            stop=sm.start() if sm is not None else None,
        )
        if sm is not None and (end < 0 or sm.start() < end):
            # (?!\d|...R) rejects the INDIRECT form "/Length 8 0 R" (the
            # leading \d alternative stops backtracking from shortening a
            # multi-digit object number like "123 0 R" to a fake literal) —
            # matching its "8" as a literal length silently truncated real
            # PDFs; without a resolvable literal we fall to endstream scan
            lm = _LENGTH_RE.search(data, body_start, sm.start())
            if lm:
                skip_to = sm.end() + int(lm.group(1))
            else:
                es = data.find(b"endstream", sm.end())
                skip_to = es if es >= 0 else sm.end()
            end = _find_outside_literals(data, b"endobj", skip_to)
        if end < 0:
            objs[num] = data[body_start:]
            return objs
        objs[num] = data[body_start:end]
        pos = end + len(b"endobj")


def _ref(body: bytes, name: str) -> int | None:
    m = _name_res(name)[0].search(body)
    return int(m.group(1)) if m else None


def _refs(body: bytes, name: str) -> list[int]:
    m = _name_res(name)[1].search(body)
    if not m:
        one = _ref(body, name)
        return [one] if one is not None else []
    return [int(g) for g in _NUM_REF_RE.findall(m.group(1))]


def _stream_bytes(obj_body: bytes) -> bytes | None:
    """Raw stream payload of an object, FlateDecoded when declared.  The
    /Length entry bounds the payload exactly — compressed data may END in
    EOL bytes, so stripping trailing whitespace would corrupt it (a real
    1-in-256-docs failure before /Length was honored)."""
    m = _STREAM_RE.search(obj_body)
    if not m:
        return None
    start = m.end()
    length_m = _LENGTH_RE.search(obj_body, 0, m.start())
    if length_m:
        raw = obj_body[start : start + int(length_m.group(1))]
    else:
        end = obj_body.rfind(b"endstream")
        if end < 0:
            raise ValueError("unterminated stream")
        # spec: exactly one EOL between payload and `endstream`
        raw = obj_body[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    if b"/FlateDecode" in obj_body[: m.start()]:
        raw = zlib.decompress(raw)
    return raw


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(…)`` literal starting at ``i`` (the open paren); returns
    (unescaped bytes, index after the close paren).  Handles nested parens
    and the spec's escape set including 1-3 digit octal."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = chr(e)
                for _ in range(2):
                    if i + 1 < n and 0x30 <= data[i + 1] <= 0x37:
                        i += 1
                        oct_digits += chr(data[i])
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                out += _ESCAPES.get(e, bytes((e,)))
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _content_text(stream: bytes) -> str:
    """Walk a content stream's text operators and linearize the shown text:
    Tj/TJ append to the current line; ``'`` and ``\"`` start a new line then
    show; Td/TD/T* start a new line once text exists on the current one.
    Strings decode as latin-1 (PDFDocEncoding ASCII range)."""
    lines: list[str] = []
    cur: list[str] = []
    pend: list[bytes] = []  # string operands awaiting their operator
    i, n = 0, len(stream)

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        c = stream[i]
        if c == 0x28:  # literal string
            s, i = _parse_literal(stream, i)
            pend.append(s)
        elif c == 0x3C and i + 1 < n and stream[i + 1] != 0x3C:  # hex <…>
            j = stream.find(b">", i)
            if j < 0:
                break
            hx = _WS_RE.sub(b"", stream[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pend.append(bytes.fromhex(hx.decode("ascii", "ignore")))
            i = j + 1
        elif c == 0x5B or c == 0x5D:  # [ ] — TJ array delimiters
            i += 1
        else:
            m = _OP_RE.match(stream, i)
            if m:
                op = m.group(0)
                if op in (b"Tj", b"TJ"):
                    cur.extend(s.decode("latin-1") for s in pend)
                elif op in (b"'", b'"'):
                    newline()
                    cur.extend(s.decode("latin-1") for s in pend)
                elif op in (b"Td", b"TD", b"T*"):
                    newline()
                elif op == b"ET":
                    newline()
                pend.clear()
                i += len(op)
            else:
                i += 1
    newline()
    return "\n".join(lines)


def parse_pdf(data: bytes) -> dict:
    """TOTAL extractor: ``{title, text, n_pages, error}``.  Walks trailer →
    catalog → page tree → per-page content streams in /Kids order (the
    layout parse), falling back to document object order when the tree is
    absent.  Any structural failure lands in ``error``; never raises."""
    try:
        if not data or not data.startswith(b"%PDF"):
            return {"title": "", "text": "", "n_pages": 0,
                    "error": "not-a-pdf: missing %PDF header"}
        objs = _objects(data)
        title = ""
        info_m = _INFO_RE.search(data)
        if info_m and int(info_m.group(1)) in objs:
            t = _TITLE_OPEN_RE.search(objs[int(info_m.group(1))])
            if t:
                raw, _ = _parse_literal(objs[int(info_m.group(1))],
                                        t.end() - 1)
                title = raw.decode("latin-1")
        root_m = _ROOT_RE.search(data)
        page_objs: list[int] = []
        if root_m and int(root_m.group(1)) in objs:
            pages_ref = _ref(objs[int(root_m.group(1))], "Pages")
            if pages_ref is not None and pages_ref in objs:
                page_objs = [
                    k for k in _refs(objs[pages_ref], "Kids") if k in objs
                ]
        if not page_objs:  # degraded file: any object that owns a stream
            page_objs = [
                num for num in sorted(objs)
                if b"/Type /Page" in objs[num] or b"stream" in objs[num]
            ]
        texts: list[str] = []
        n_pages = 0
        for pnum in page_objs:
            body = objs[pnum]
            stream = _stream_bytes(body)
            if stream is None:
                for cref in _refs(body, "Contents"):
                    if cref in objs:
                        stream = _stream_bytes(objs[cref])
                        break
            if stream is None:
                continue
            n_pages += 1
            texts.append(_content_text(stream))
        return {"title": title, "text": "\n".join(texts),
                "n_pages": n_pages, "error": None}
    except Exception as exc:  # total: corrupt bytes -> error row
        return {"title": "", "text": "", "n_pages": 0,
                "error": f"{type(exc).__name__}: {exc}"}


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _spread(df: DataFrame, num_partitions: int | None) -> DataFrame:
    if num_partitions:
        return df.repartition(num_partitions, F.xxhash64("doc_id"))
    return df


def synth_pdf_table(
    docs: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """``documents``-shaped input → (doc_id, payload binary): one synthetic
    PDF per row, title ``doc-<id>``, body ``<text> (doc <id>)`` — the paren
    suffix forces the escape path through every row.  Pure map."""

    def gen(batches):
        for pdf in batches:
            payloads = [
                synth_pdf(int(d), f"doc-{int(d)}", f"{t} (doc {int(d)})")
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "payload": payloads}
            )

    return _spread(docs.select("doc_id", "text"), num_partitions).mapInPandas(
        gen, schema="doc_id long, payload binary"
    )


def extract_pdf_table(
    pdfs: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """(doc_id, payload) → (doc_id, title, text, n_pages, error): the PDF
    layout parse as a shuffle-free Arrow-batched map stage."""

    def run(batches):
        for pdf in batches:
            recs = [parse_pdf(bytes(p) if p is not None else b"")
                    for p in pdf["payload"]]
            out = pd.DataFrame(recs)
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64").values)
            out["n_pages"] = out["n_pages"].astype("int64")
            yield out

    return _spread(pdfs, num_partitions).mapInPandas(run, schema=PDF_OUT_DDL)
