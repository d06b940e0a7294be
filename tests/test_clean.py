"""H1 boilerplate strip (extractor.py:521-534) + A2 decode cascade."""
from newsspark.engines import clean_text, decode_html, sniff_charset


def test_all_five_markers_dropped():
    text = "\n".join(
        [
            "keep one",
            "무단 전재 금지 line",
            "재배포 금지 notice",
            "ⓒ 2026 Example",
            "Copyright Example Corp",
            "▶ related stories",
            "keep two",
        ]
    )
    assert clean_text(text) == "keep one\nkeep two"


def test_lines_stripped_and_blanks_dropped():
    assert clean_text("  a  \n\n\n   \n  b ") == "a\nb"


def test_blank_run_collapse_and_idempotence():
    s = clean_text("a\n\n\n\nb")
    assert s == "a\nb"  # blank lines dropped before the collapse even applies
    assert clean_text(s) == s  # idempotent


def test_marker_inside_line_kills_whole_line():
    assert clean_text("good text ⓒ mid-line") == ""


# --- A2 decode cascade (extractor.py:32-44) ---


def test_decode_utf8_fast_path():
    assert decode_html("already str") == "already str"
    assert decode_html("한글".encode("utf-8")) == "한글"
    assert decode_html(None) == ""


def test_decode_declared_charset():
    raw = '<meta charset="euc-kr"><p>한국어</p>'.encode("cp949")
    assert "한국어" in decode_html(raw)


def test_decode_http_equiv_content_type():
    raw = (
        '<meta http-equiv="Content-Type" content="text/html; charset=euc-kr">'
        "<p>본문</p>"
    ).encode("cp949")
    assert "본문" in decode_html(raw)


def test_decode_bad_declaration_falls_to_replace():
    raw = '<meta charset="x-bogus"><p>한국어</p>'.encode("cp949")
    out = decode_html(raw)
    assert "�" in out  # replacement chars, never a raise


def test_sniff_charset():
    assert sniff_charset(b'<meta charset="EUC-KR">') == "euc-kr"
    assert sniff_charset(b'<?xml version="1.0" encoding="utf-16"?>') == "utf-16"
    assert sniff_charset(b"<p>nothing</p>") == ""
