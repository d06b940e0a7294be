"""Differential fuzz for the r6 single-shot fast parser: _TreeBuilder's
goahead must be TREE-IDENTICAL to the unmodified stdlib html.parser driving
the same handlers, on markup soup of every shape (the fast paths are strict
subsets of the stdlib token grammar; everything else delegates)."""

import random

from html.parser import HTMLParser

from newsspark.htmlite import Node, VOID_TAGS, _P_CLOSERS, parse_html


class _RefBuilder(HTMLParser):
    """The pre-r6 builder: stock incremental goahead, identical handlers."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def _append_node(self, tag, attrs, self_closing):
        d = {}
        for name, value in attrs:
            name = name.lower()
            if name not in d:
                d[name] = value if value is not None else ""
        node = Node(tag, d)
        parent = self.stack[-1]
        node.parent = parent
        parent.children.append(node)
        if not self_closing and tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_starttag(self, tag, attrs):
        if tag in _P_CLOSERS and self.stack[-1].tag == tag:
            self.stack.pop()
        self._append_node(tag, attrs, False)

    def handle_startendtag(self, tag, attrs):
        self._append_node(tag, attrs, True)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if not data:
            return
        ch = self.stack[-1].children
        if ch and isinstance(ch[-1], str):
            ch[-1] += data
        else:
            ch.append(data)


def _ref_parse(html):
    b = _RefBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


def _ser(node):
    if isinstance(node, str):
        return ("T", node)
    return (
        "N",
        node.tag,
        tuple(sorted(node.attrs.items())),
        tuple(_ser(c) for c in node.children),
    )


def _check(html):
    assert _ser(parse_html(html)) == _ser(_ref_parse(html)), repr(html)


ADVERSARIAL = [
    "<p>a<p>b</p>", '<div class="x" id=y>t</div>', "<a href='single'>x</a>",
    "<a href=unquoted>x</a>", '<a href="a&amp;b">x</a>', '<a href="">e</a>',
    "<input disabled>", "<br/>", "<br />", "<br/ >", '<img src="x"/>',
    '<script>var a = "<p>not a tag</p>";</script><p>after</p>',
    "<script>unterminated", "<style>p{color:red}</style>done",
    "<!-- comment <p>x</p> --><p>y</p>", "<!doctype html><html><body>t",
    "<?php echo ?><p>z</p>", "<![CDATA[raw]]><p>w</p>",
    "text &amp; more &lt;tag&gt; &#65; &unknown; &incomplete",
    "< notatag", "ends with <", "ends with <a", 'ends with <a href="x',
    "</>", "</ p>", '</p extra="x">', '<a b="x"c="y">t</a>',
    '<a b="x" 5c="y">t</a>', "<a href=>t</a>", '<A HREF="X">t</A>',
    '<a\nhref="x"\t>t</a>', '<a href="x>y">t</a>', '<a href="x" href="y">t</a>',
    "<td>a<td>b", "<li>a<li>b</li>", "<SCRIPT>x</SCRIPT>y",
    "<script>a</scrip></script>b", "<script>a</SCRIPT >b",
    "<script >x</script>c", '<p data-x="1" data-y>t',
    '<svg><circle r="1"/></svg>', '<a b="x" / c="y">t</a>',
    "<div/>inside?</div>", "<p/>q", '<foo-bar a="1">x</foo-bar>',
    "<a b=c=d>x", '<a "b"="c">x', "&#x41;&#65;&#xzz;", "<!bogus>t",
    "<!--unterminated", '<a href="x"/ >t', "", None,
    "<p>&nbsp;&NotAnEntity;x</p>",
    "<script><!-- </script> --></script>rest",
    "<title>a &amp; b</title>", "<textarea><p>x</p></textarea>",
]


def test_fast_parser_adversarial_cases():
    for case in ADVERSARIAL:
        _check(case)


def test_fast_parser_matches_stdlib_on_corpus_pages():
    import duckdb

    from newsspark.linkops import synth_link_page
    from newsspark.pages import pages_pdf

    docs = duckdb.sql(
        "select doc_id, text from "
        "'/root/testdata/sf0.001/documents.parquet' order by doc_id"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs], replicas=2)
    for h in pdf["html"]:
        _check(
            h.decode("utf-8", "replace")
            if isinstance(h, (bytes, bytearray))
            else h
        )
    for d, t in docs[:200]:
        _check(synth_link_page(d, str(t)[:40]))


def test_fast_parser_random_soup_fuzz():
    rng = random.Random(20260821)
    alpha = "<>/=\"'& abcdefgpPA&#;!-\n\tscriptstyle"
    for _ in range(2500):
        _check(
            "".join(
                rng.choice(alpha) for _ in range(rng.randrange(0, 120))
            )
        )
    tags = ["p", "div", "a", "span", "script", "style", "br", "img", "li",
            "td", "P", "DIV"]
    for _ in range(1500):
        parts = []
        for _ in range(rng.randrange(1, 25)):
            t = rng.choice(tags)
            kind = rng.randrange(6)
            if kind == 0:
                parts.append(f"<{t}>")
            elif kind == 1:
                parts.append(f"</{t}>")
            elif kind == 2:
                cls = rng.choice(["a", "b c", ""])
                parts.append(f'<{t} class="{cls}" id={rng.choice(["x", "y"])}>')
            elif kind == 3:
                href = rng.choice(["u&amp;v", "plain", "x>y", ""])
                parts.append(f'<{t} href="{href}"/>')
            elif kind == 4:
                parts.append(
                    rng.choice(["text", "a & b", "&lt;x&gt;", "<!--c-->",
                                "&#65;"])
                )
            else:
                parts.append(f'<{t} a="1" b>')
        _check("".join(parts))
