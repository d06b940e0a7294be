"""Unit tests for the stdlib DOM layer (SURVEY.md §7 step 1)."""
from newsspark.htmlite import parse_html


def test_basic_tree_and_find():
    t = parse_html('<html><body><p id="a">hi</p><p class="x y">yo</p></body></html>')
    assert t.find("p").id == "a"
    assert [p.get_text() for p in t.find_all("p")] == ["hi", "yo"]


def test_find_with_attrs_and_presence():
    t = parse_html(
        '<meta property="og:image" content="u1">'
        '<img src="a.jpg"><img data-src="b.jpg">'
    )
    assert t.find("meta", {"property": "og:image"}).get("content") == "u1"
    assert len(t.find_all("img", {"src": True})) == 1


def test_find_all_limit():
    t = parse_html("".join(f'<img src="{i}.jpg">' for i in range(40)))
    assert len(t.find_all("img", {"src": True}, limit=30)) == 30


def test_select_id_class_tag_chains():
    t = parse_html(
        '<div id="article"><img src="in.jpg"></div>'
        '<div class="article-body"><span><img src="deep.jpg"></span></div>'
        '<img src="out.jpg">'
    )
    assert [n.get("src") for n in t.select("#article img[src]")] == ["in.jpg"]
    assert [n.get("src") for n in t.select(".article-body img[src]")] == ["deep.jpg"]


def test_select_comma_alternatives_document_order():
    t = parse_html("<h1>one</h1><h2 class='media_end_head_headline'>two</h2>")
    # first match in document order across alternatives
    assert t.select_one("h2.media_end_head_headline, h1").get_text() == "one"
    t2 = parse_html("<h2 class='media_end_head_headline'>two</h2><h1>one</h1>")
    assert t2.select_one("h2.media_end_head_headline, h1").get_text() == "two"


def test_select_attr_required():
    t = parse_html('<article><img data-src="l.jpg"><img src="s.jpg"></article>')
    assert [n.get("src") for n in t.select("article img[src]")] == ["s.jpg"]


def test_get_text_separator_and_skip():
    t = parse_html(
        "<div id='d'><script>var x=1;</script><p>a</p><p>b</p><style>.c{}</style></div>"
    )
    d = t.select_one("#d")
    got = d.get_text("\n", skip=frozenset({"script", "style", "noscript"}))
    assert "var x" not in got and ".c{}" not in got
    assert "a" in got and "b" in got


def test_void_and_unclosed_tags_total():
    t = parse_html("<div><br><img src=x.jpg><p>open forever")
    assert t.find("p").get_text() == "open forever"
    # malformed soup never raises
    parse_html("<<<><<div")
    parse_html("")
    parse_html(None)


def test_implicit_p_close():
    t = parse_html("<div><p>one<p>two</div>")
    assert [p.get_text() for p in t.find_all("p")] == ["one", "two"]


def test_attr_first_occurrence_wins_and_valueless():
    t = parse_html('<img src="a" src="b" async>')
    img = t.find("img")
    assert img.get("src") == "a"
    assert img.get("async") == ""


def test_entity_decoding():
    t = parse_html("<p>a &amp; b &#8594; c</p>")
    assert t.find("p").get_text() == "a & b → c"
