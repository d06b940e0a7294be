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
    # too little hangul (3 pairs < detector minimum of 4) for statistical
    # recovery -> the utf-8/replace last resort
    raw = '<meta charset="x-bogus"><p>한국어</p>'.encode("cp949")
    out = decode_html(raw)
    assert "�" in out  # replacement chars, never a raise


def test_decode_undeclared_euckr_statistically_detected():
    # A2 statistical-detection step (reference apparent_encoding/chardet,
    # extractor.py:38-40): NO charset declaration anywhere
    body = "기사 본문 문단입니다. 서울에서 열린 행사에서 시민들의 관심이 이어졌습니다."
    raw = f"<html><body><p>{body}</p></body></html>".encode("cp949")
    out = decode_html(raw)
    assert body in out
    assert "�" not in out


def test_detect_charset_statistical():
    from newsspark.engines import detect_charset_statistical as det

    ko = "기사 본문 문단입니다. 서울에서 열린 행사."
    assert det(ko.encode("cp949")) == "cp949"
    assert det(b"\xff\xfeh\x00i\x00") == "utf-16-le"        # BOM
    assert det(b"\xfe\xff\x00h\x00i") == "utf-16-be"        # BOM
    long_ascii = "hello world, this is a longer page body " * 3
    assert det(long_ascii.encode("utf-16-le")) == "utf-16-le"  # NUL stripe
    assert det(long_ascii.encode("utf-16-be")) == "utf-16-be"
    # latin-1 accents are invalid cp949 pairs -> stays undetected
    assert det(("café résumé à côté, naïve déjà vu " * 4).encode("latin-1")) == ""
    assert det(b"") == ""
    assert det(b"plain ascii only") == ""
    # detected-but-undecodable never raises: invalid stripe after valid pairs
    raw = ko.encode("cp949") + b"\xff " * 40
    assert det(raw) == ""  # stripe outvotes the pairs
    assert "�" in decode_html(raw)


def test_sniff_charset():
    assert sniff_charset(b'<meta charset="EUC-KR">') == "euc-kr"
    assert sniff_charset(b'<?xml version="1.0" encoding="utf-16"?>') == "utf-16"
    assert sniff_charset(b"<p>nothing</p>") == ""
