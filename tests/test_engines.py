"""Cascade gates (B1-B6), merges (C1-C4), and per-archetype engine behavior
(SURVEY.md §2; reference extractor.py:206-306)."""
import pytest

from newsspark.engines import (
    FAIL_MSG,
    engine_density,
    engine_newspaper,
    engine_readability,
    extract_article,
)
from newsspark.htmlite import parse_html
from newsspark.pages import archetype_for, build_page

LONG_P = (
    "<p>A perfectly reasonable sentence with many words, commas, and enough "
    "length to score well in the density pass of extraction.</p>"
)


def _page(arch_name, start=0):
    """First page index whose archetype is arch_name (deterministic)."""
    for i in range(start, start + 4000):
        if archetype_for(i) == arch_name:
            return build_page(i, "alpha beta gamma delta epsilon zeta eta theta " * 12)
    raise AssertionError(f"no index for {arch_name}")


def test_b1_early_exit_stage1():
    page = _page("rich_og")
    rec = extract_article(page["url"], page["html"])
    assert rec["method"] == "trafilatura"
    assert rec["error"] is None
    assert rec["title"] and rec["text"] and rec["images"]


def test_c1_fill_if_empty_title_from_stage2():
    page = _page("sparse_title_elsewhere")
    rec = extract_article(page["url"], page["html"])
    assert rec["method"] == "trafilatura, newspaper3k"
    assert rec["title"]  # filled by stage 2 from <title> (longest piece)
    assert " - The Observer" not in rec["title"]


def test_c2_image_accumulation_and_e3_prepend():
    page = _page("multi_engine_merge")
    rec = extract_article(page["url"], page["html"])
    assert rec["method"] == "trafilatura, newspaper3k"
    # stage 1 found zero images (the only img is E2-filtered '/thumb');
    # stage 2's top_image bypasses the filter via the E3 prepend
    assert len(rec["images"]) == 1 and "/thumb/" in rec["images"][0]
    assert rec["date"].startswith("20") and "T" in rec["date"]  # isoformat


def test_stage3_site_rules_naver():
    page = _page("naver_like")
    rec = extract_article(page["url"], page["html"])
    assert "readability" in rec["method"]
    assert rec["error"] is None
    assert "무단 전재" not in rec["text"]  # H1 applied on stage-3 path
    assert "ⓒ" not in rec["text"]
    assert rec["title"]  # from h2.media_end_head_headline


def test_stage3_readability_recovers_js_shell():
    page = _page("js_shell")
    rec = extract_article(page["url"], page["html"])
    assert rec["method"].endswith("readability")
    assert len(rec["text"]) >= 100
    assert "Trending now" not in rec["text"]  # sidebar not part of best node


def test_h1_asymmetry_stage1_keeps_boilerplate():
    # boilerplate markers inside <p> body: stage-1 text is NOT cleaned
    html = (
        "<html><body><article>"
        + LONG_P * 3
        + "<p>All rights reserved ⓒ Example Corp and its affiliates worldwide.</p>"
        + "</article></body></html>"
    ).encode()
    rec = extract_article("https://s.com/a", html)
    assert rec["method"] == "trafilatura" or rec["method"].startswith("trafilatura")
    assert "ⓒ" in rec["text"]  # asymmetry preserved (extractor.py:503)


def test_b4_gate_and_fail_message():
    rec = extract_article("https://s.com/a", b"<p>too short.</p>")
    assert rec["error"] == FAIL_MSG
    assert rec["text"] == ""
    rec2 = extract_article("https://s.com/a", b"")
    assert rec2["error"] == FAIL_MSG
    assert rec2["method"] == "none"


def test_b6_none_html():
    rec = extract_article("https://s.com/a", None)
    assert rec["method"] == "none" and rec["error"] == FAIL_MSG


def test_c3_final_dedupe_and_cap_five():
    imgs = "".join(f'<img src="https://c.dn/p{i}_800x600.jpg">' for i in range(8))
    html = (
        '<meta property="og:title" content="T">'
        f"<html><body><article>{LONG_P * 3}{imgs}</article></body></html>"
    ).encode()
    rec = extract_article("https://s.com/a", html)
    assert len(rec["images"]) == 5
    assert rec["images"] == [f"https://c.dn/p{i}_800x600.jpg" for i in range(5)]


def test_c4_method_none_when_nothing_ran():
    rec = extract_article("https://s.com/a", b"   ")
    assert rec["method"] == "none"


def test_engine1_returns_none_below_min_chars():
    t = parse_html("<article><p>short but a p tag present here ok.</p></article>")
    assert engine_density(t, "https://s.com/") is None


def test_engine2_always_returns_dict():
    t = parse_html("<div>no paragraphs at all</div>")
    d = engine_newspaper(t, "https://s.com/")
    assert d["text"] == "" and isinstance(d["images"], list)


def test_engine2_title_separator_longest_piece():
    t = parse_html("<title>Short | A Considerably Longer Headline Piece</title>")
    d = engine_newspaper(t, "https://s.com/")
    assert d["title"] == "A Considerably Longer Headline Piece"


def test_engine3_title_from_title_tag_in_readability_branch():
    html = "<title>Doc Title</title><div class='content'>" + (
        "Plain div text, with commas, long enough to be scored as content by "
        "the readability pass of the engine, repeated. " * 3
    ) + "</div>"
    d = engine_readability(parse_html(html), "https://s.com/")
    assert d["title"] == "Doc Title"
    assert len(d["text"]) >= 100


def test_unicode_and_weird_inputs_total():
    for html in (b"\xff\xfe\x00\x9c", b"<<<>" * 5000, "plain str input", b"\x00" * 64):
        rec = extract_article("https://s.com/x", html)
        assert isinstance(rec["method"], str)
        assert rec["error"] is None or isinstance(rec["error"], str)


@pytest.mark.parametrize("arch", [
    "rich_og", "no_meta_time_tag", "naver_like", "url_date_only",
    "sparse_title_elsewhere", "js_shell", "boilerplate_heavy", "image_zoo",
    "multi_engine_merge",
])
def test_archetypes_extract_without_error(arch):
    page = _page(arch)
    rec = extract_article(page["url"], page["html"])
    assert rec["error"] is None, (arch, rec)
    assert len(rec["images"]) <= 5
