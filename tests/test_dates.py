"""G1 date coalesce chain + F3 URL regex (extractor.py:161-203)."""
from newsspark.engines import extract_date
from newsspark.htmlite import parse_html

URL = "https://site.com/a/1"


def test_metadata_date_wins():
    t = parse_html('<meta property="article:published_time" content="2026-01-01">')
    assert extract_date(t, URL, meta_date="engine-says") == "engine-says"


def test_meta_tag_order_is_pinned():
    t = parse_html(
        '<meta name="pubdate" content="from-pubdate">'
        '<meta property="article:published_time" content="from-apt">'
    )
    assert extract_date(t, URL) == "from-apt"  # property=article:published_time first
    t2 = parse_html(
        '<meta property="datePublished" content="from-dp">'
        '<meta name="publishdate" content="from-pd">'
    )
    assert extract_date(t2, URL) == "from-pd"  # publishdate before datePublished


def test_meta_content_passes_through_verbatim():
    t = parse_html('<meta name="pubdate" content="Jan 3rd, maybe?">')
    assert extract_date(t, URL) == "Jan 3rd, maybe?"


def test_time_tag_and_fallthrough_quirk():
    t = parse_html('<time datetime="2026-02-02T10:00:00">x</time>')
    assert extract_date(t, URL) == "2026-02-02T10:00:00"
    # <time> without datetime does NOT return "" — it falls through to the
    # URL pattern (reference quirk, extractor.py:183-187)
    t2 = parse_html("<time>yesterday</time>")
    assert extract_date(t2, "https://s.com/2026/01/02/a") == "2026-01-02"


def test_naver_span_only_for_naver_urls():
    html = '<span class="media_end_head_info_datestamp_time" data-date-time="2026-03-03 10:00:00"></span>'
    t = parse_html(html)
    assert extract_date(t, "https://n.news.naver.com/x") == "2026-03-03 10:00:00"
    assert extract_date(t, "https://other.com/x") == ""


def test_url_pattern_unvalidated():
    t = parse_html("<p></p>")
    assert extract_date(t, "https://s.com/2026/13/40/a") == "2026-13-40"  # no range check
    assert extract_date(t, "https://s.com/a/20260102") == "2026-01-02"  # compact form
    assert extract_date(t, "https://s.com/2026-01-02/a") == "2026-01-02"
    assert extract_date(t, "https://s.com/plain") == ""
