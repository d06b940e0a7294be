"""E1/E2/E3 image pipeline semantics (SURVEY.md §2 E-group, extractor.py:47-158)."""
from newsspark.engines import (
    IMG_EXCLUDE_PATTERNS,
    extract_images_priority,
    filter_images,
)
from newsspark.htmlite import parse_html


def test_filter_all_18_exclude_patterns():
    assert len(IMG_EXCLUDE_PATTERNS) == 20  # reference list, extractor.py:51-55
    for p in IMG_EXCLUDE_PATTERNS:
        assert filter_images([f"https://x.com/a{p}b_1000x1000.jpg"]) == []


def test_filter_suffixes_original_case_only():
    assert filter_images(["https://x.com/a.svg", "https://x.com/a.gif"]) == []
    # suffix check is case-sensitive on the raw url (extractor.py:61)
    assert filter_images(["https://x.com/A.SVG"]) == ["https://x.com/A.SVG"]


def test_filter_keywords_lowercased():
    for k in ("kakao", "FACEBOOK", "Twitter", "share", "sns", "ic-"):
        assert filter_images([f"https://x.com/{k}/pic_900x900.jpg"]) == []


def test_filter_size_gates():
    assert filter_images(["https://x.com/p_299x500.jpg"]) == []  # w<300
    assert filter_images(["https://x.com/p_500x299.jpg"]) == []  # h<300
    assert filter_images(["https://x.com/p_2000x399.jpg"]) == []  # ratio>5
    assert filter_images(["https://x.com/p_1500x300.jpg"]) == ["https://x.com/p_1500x300.jpg"]  # =5 ok
    assert filter_images(["https://x.com/p_ir_640x120.jpg"]) == []  # _ir_ prefix
    assert filter_images(["https://x.com/p_300x300.jpg"]) == ["https://x.com/p_300x300.jpg"]
    # no size token -> kept
    assert filter_images(["https://x.com/photo.jpeg"]) == ["https://x.com/photo.jpeg"]


def test_priority_order_og_twitter_body_generic():
    html = """
    <meta property="og:image" content="https://c.dn/og_800x600.jpg">
    <meta name="twitter:image" content="https://c.dn/tw_800x600.jpg">
    <article><img src="https://c.dn/body_800x600.jpg"></article>
    <img src="https://c.dn/gen_800x600.jpg">
    """
    got = extract_images_priority(parse_html(html), "https://site.com/a")
    assert got == [
        "https://c.dn/og_800x600.jpg",
        "https://c.dn/tw_800x600.jpg",
        "https://c.dn/body_800x600.jpg",
        "https://c.dn/gen_800x600.jpg",
    ]


def test_generic_scan_skipped_when_five_collected():
    body = "".join(f'<img src="https://c.dn/b{i}_800x600.jpg">' for i in range(5))
    html = f"<article>{body}</article><img src='https://c.dn/gen_800x600.jpg'>"
    got = extract_images_priority(parse_html(html), "https://s.com/")
    assert "https://c.dn/gen_800x600.jpg" not in got
    assert len(got) == 5


def test_generic_scan_caps_30_and_10():
    # 40 generic images; scan limit 30, collection stops at 10 (extractor.py:142-152)
    html = "".join(f'<img src="https://c.dn/g{i}_800x600.jpg">' for i in range(40))
    got = extract_images_priority(parse_html(html), "https://s.com/")
    assert got == [f"https://c.dn/g{i}_800x600.jpg" for i in range(10)]


def test_relative_urljoin_and_http_prefix_gate():
    html = (
        '<meta property="og:image" content="/img/rel_800x600.jpg">'
        '<article><img src="pic_800x600.jpg"></article>'
    )
    got = extract_images_priority(parse_html(html), "https://site.com/news/story.html")
    assert got == [
        "https://site.com/img/rel_800x600.jpg",
        "https://site.com/news/pic_800x600.jpg",
    ]


def test_data_src_fallback_when_src_empty():
    html = '<article><img src="" data-src="https://c.dn/lazy_800x600.jpg"></article>'
    got = extract_images_priority(parse_html(html), "https://s.com/")
    assert got == ["https://c.dn/lazy_800x600.jpg"]


def test_dedupe_keeps_first_occurrence():
    html = (
        '<meta property="og:image" content="https://c.dn/same_800x600.jpg">'
        '<article><img src="https://c.dn/same_800x600.jpg">'
        '<img src="https://c.dn/other_800x600.jpg"></article>'
    )
    got = extract_images_priority(parse_html(html), "https://s.com/")
    assert got == ["https://c.dn/same_800x600.jpg", "https://c.dn/other_800x600.jpg"]


def test_twitter_novelty_checked_on_raw_value():
    # twitter:image equal to og:image is skipped (extractor.py:111)
    html = (
        '<meta property="og:image" content="https://c.dn/x_800x600.jpg">'
        '<meta name="twitter:image" content="https://c.dn/x_800x600.jpg">'
    )
    got = extract_images_priority(parse_html(html), "https://s.com/")
    assert got == ["https://c.dn/x_800x600.jpg"]
