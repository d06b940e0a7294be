"""Deterministic Common-Crawl-style ``pages`` table generator.

Synthesizes the input table of BASELINE.json's ``input_hint`` shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
from the driver's ``documents.parquet`` (doc_id, text, ...), one page per
(doc_id, replica) pair.  Fully deterministic: archetype choice, hosts, dates
and image zoos are pure functions of the page index — no wall clock, no
global RNG (Python string hashing is per-process-seeded and never used).

Archetype mix per FIXTURES.md §3; each archetype exercises specific rows of
SURVEY.md §2 (cited inline).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Dict, Iterator, List

import pandas as pd

# bump when the corpus spec moves (archetype mix / page templates) so cached
# bench corpora regenerate; goldens re-freeze alongside
CORPUS_VERSION = 2

HOSTS = (
    "news.example-daily.com",
    "www.metro-herald.net",
    "chronicle.example.org",
    "www.city-tribune.co.kr",
    "daily-post.example.io",
    "the-observer.example.com",
    "press.example.net",
    "gazette.example.org",
)
NAVER_HOST = "n.news.naver.com"

# (name, cumulative weight out of 100) — FIXTURES.md §3 shares
_ARCHETYPES = (
    ("rich_og", 30),
    ("no_meta_time_tag", 40),
    ("naver_like", 42),
    ("url_date_only", 52),
    ("sparse_title_elsewhere", 62),
    ("js_shell", 70),
    ("boilerplate_heavy", 78),
    ("image_zoo", 88),
    ("broken", 95),
    ("multi_engine_merge", 100),
)

_KO_SNIPPET = (
    "기사 본문 문단입니다. 서울에서 열린 행사에서 관계자들은 다양한 의견을 "
    "나누었으며 시민들의 관심이 이어졌습니다."
)

_EPOCH = datetime(2026, 1, 1)


def archetype_for(i: int) -> str:
    slot = (i * 2654435761) % 100  # Knuth multiplicative mix — deterministic
    for name, cum in _ARCHETYPES:
        if slot < cum:
            return name
    return "rich_og"


def _words_for(i: int, doc_text: str, n: int) -> List[str]:
    words = doc_text.split()
    if not words:
        words = ["lorem", "ipsum", "dolor", "sit", "amet"]
    start = i % max(1, len(words))
    out = []
    k = start
    while len(out) < n:
        out.append(words[k % len(words)])
        k += 7  # coprime stride: varies wording between pages of one doc
    return out


def _sentences(i: int, doc_text: str, n_paras: int, words_per: int = 22) -> List[str]:
    paras = []
    for p in range(n_paras):
        ws = _words_for(i + p * 131, doc_text, words_per)
        # Commas feed the readability scorer's comma counting.
        mid = len(ws) // 2
        sent = " ".join(ws[:mid]) + ", " + " ".join(ws[mid:])
        paras.append(sent[0].upper() + sent[1:] + ".")
    return paras


def _host(i: int) -> str:
    return HOSTS[(i // 3) % len(HOSTS)]


def _date_parts(i: int):
    year = 2020 + (i % 7)
    month = 1 + (i % 12)
    day = 1 + (i % 28)
    return year, month, day


def _url_for(i: int, arch: str) -> str:
    host = NAVER_HOST if arch == "naver_like" else _host(i)
    if arch == "url_date_only":
        # ~half invalid month/day values — F3 is intentionally unvalidated
        if i % 2 == 0:
            y, m, d = _date_parts(i)
            return f"https://{host}/{y}/{m:02d}/{d:02d}/article-{i:06d}"
        return f"https://{host}/2026/{13 + i % 80:02d}/{40 + i % 55:02d}/article-{i:06d}"
    if i % 2 == 0 and arch not in ("multi_engine_merge",):
        y, m, d = _date_parts(i)
        return f"https://{host}/{y}/{m:02d}/{d:02d}/article-{i:06d}"
    return f"https://{host}/a/{i}"


def _meta_date(i: int) -> str:
    y, m, d = _date_parts(i)
    return f"{y:04d}-{m:02d}-{d:02d}T{(i % 24):02d}:{(i % 60):02d}:00+09:00"


def _title_words(i: int, doc_text: str) -> str:
    return " ".join(w.capitalize() for w in _words_for(i * 17 + 1, doc_text, 6))


_BOILER_FOOTER = (
    '<footer class="site-footer"><p>Contact us editor@example.com and follow our '
    "newsletter for daily updates from the newsroom team worldwide.</p></footer>"
)


def _page_html(i: int, arch: str, doc_text: str, url: str) -> bytes:
    title = _title_words(i, doc_text)
    paras = _sentences(i, doc_text, 8)
    body_ps = "\n".join(f"<p>{p}</p>" for p in paras)
    host = NAVER_HOST if arch == "naver_like" else _host(i)
    img_base = f"https://img.{host}"

    if arch == "rich_og":
        # D1 happy path; E1 priorities 1-3; G1 meta order; B1 early exit.
        html = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{title} | Example Daily</title>
<meta property="og:title" content="{title}">
<meta property="og:image" content="{img_base}/main_{i}_800x600.jpg">
<meta name="twitter:image" content="{img_base}/tw_{i}_1200x630.jpg">
<meta property="article:published_time" content="{_meta_date(i)}">
</head><body>
<header><h1>{title}</h1></header>
<article>
{body_ps}
<img src="/photo/inline_{i}_1024x768.jpg">
<img src="{img_base}/logo_small.png">
</article>
{_BOILER_FOOTER}
</body></html>"""
    elif arch == "no_meta_time_tag":
        # G1 step 3 (<time datetime>); E1 priority 3 (article imgs only).
        y, m, d = _date_parts(i)
        html = f"""<html><head><title>{title}</title>
<meta property="og:title" content="{title}"></head><body>
<article>
<time datetime="{y:04d}-{m:02d}-{d:02d}T08:30:00">{y}.{m:02d}.{d:02d}</time>
{body_ps}
<img src="{img_base}/body_{i}_900x700.jpg">
</article></body></html>"""
    elif arch == "naver_like":
        # Site-rule path (extractor.py:472-482): #dic_area body, headline h2,
        # datestamp span; no <p> tags so stages 1-2 find no body; H1 cleaning.
        divs = "\n".join(f"<div>{p}</div>" for p in paras)
        y, m, d = _date_parts(i)
        html = f"""<html><head><meta charset="utf-8"></head><body>
<h2 class="media_end_head_headline">{title}</h2>
<span class="media_end_head_info_datestamp_time" data-date-time="{y:04d}-{m:02d}-{d:02d} {(i % 24):02d}:30:00"></span>
<div id="dic_area">
{divs}
<div>{_KO_SNIPPET}</div>
<div>ⓒ 연합뉴스. 무단 전재 및 재배포 금지</div>
</div>
<div class="news_view"><img src="/img/naver_{i}_700x500.jpg"></div>
</body></html>"""
    elif arch == "url_date_only":
        # Date only in URL path — F3 regex, including invalid month/day.
        html = f"""<html><head><meta property="og:title" content="{title}">
<meta property="og:image" content="{img_base}/lead_{i}_640x480.jpg"></head><body>
<article>{body_ps}</article></body></html>"""
    elif arch == "sparse_title_elsewhere":
        # Stage-1 finds body but no title (no og:title, no h1); <title> only.
        # C1 fill-if-empty; method = "trafilatura, newspaper3k".
        html = f"""<html><head><title>{title} - The Observer</title>
<meta property="og:image" content="{img_base}/lead_{i}_800x534.jpg">
<meta property="article:published_time" content="{_meta_date(i)}"></head><body>
<div class="entry">{body_ps}</div></body></html>"""
    elif arch == "js_shell":
        # Content only in nested leaf divs — stages 1-2 blank, stage-3
        # readability scorer recovers it (B2+B3 triggers, D3, B5).
        nested = "\n".join(f"<div>{p}</div>" for p in paras[:6])
        html = f"""<html><head><title>{title}</title></head><body>
<div id="app"><div class="shell"><div class="content-root">
<div class="article-text">
{nested}
</div></div></div></div>
<div class="sidebar"><div>Trending now: subscribe to our channel for more.</div></div>
</body></html>"""
    elif arch == "boilerplate_heavy":
        # Stage-3 path + H1 markers and blank-line runs.
        lines = []
        for k, p in enumerate(paras[:6]):
            lines.append(f"<div>{p}</div>")
            if k % 2 == 0:
                lines.append("<div>  </div><div></div>")
        lines.append("<div>무단 전재 및 재배포 금지</div>")
        lines.append("<div>ⓒ Example News Corp.</div>")
        lines.append("<div>Copyright 2026 Example. All rights reserved.</div>")
        lines.append("<div>▶ 관련기사 보기</div>")
        body = "\n".join(lines)
        html = f"""<html><head><title>{title}</title></head><body>
<div class="wrapper"><div class="story-area">
{body}
</div></div></body></html>"""
    elif arch == "image_zoo":
        # Every E2 branch + E1 caps + F1 urljoin + C3 dedupe/[:5].
        zoo = [
            f"{img_base}/icon/menu.svg",
            f"{img_base}/anim_{i}.gif",
            f"{img_base}/logo_top.png",
            f"{img_base}/btn_/go.png",
            f"{img_base}/banner/top_970x90.jpg",
            f"{img_base}/ads/spot.png",
            f"{img_base}/thumb/t_{i}.jpg",
            f"{img_base}/profile/p.jpg",
            f"{img_base}/kakao_share.png",
            f"{img_base}/ic-close.png",
            f"{img_base}/banner_ir/x_ir_640x120.jpg",
            f"{img_base}/small_200x200.jpg",
            f"{img_base}/wide_6000x1000.jpg",
            f"/photo/real_{i}_1100x733.jpg",      # relative -> urljoin (F1)
            f"{img_base}/real_{i}_1100x733b.jpg",
        ]
        zoo_imgs = "\n".join(f'<img src="{u}">' for u in zoo)
        dup = f'<img src="/photo/real_{i}_1100x733.jpg">'
        data_src = f'<img src="" data-src="{img_base}/lazy_{i}_980x653.jpg">'
        extra = "\n".join(
            f'<img src="{img_base}/extra_{i}_{k}_400x400.jpg">' for k in range(12)
        )
        html = f"""<html><head><title>{title}</title>
<meta property="og:title" content="{title}">
<meta property="og:image" content="{img_base}/og_{i}_1200x800.jpg">
<meta name="twitter:image" content="{img_base}/og_{i}_1200x800.jpg">
</head><body>
<article>
{body_ps}
{zoo_imgs}
{dup}
{data_src}
</article>
{extra}
</body></html>"""
    elif arch == "multi_engine_merge":
        # Stage 1: text but zero surviving images and no date (the only img is
        # E2-filtered '/thumb'); stage 2 adds top_image (bypasses E2 via E3
        # prepend, extractor.py:374-375) + date via meta name=date.
        html = f"""<html><head><title>{title} | Gazette</title>
<meta property="og:title" content="{title}">
<meta name="date" content="{_meta_date(i)}"></head><body>
<article>
{body_ps}
<img src="{img_base}/thumb/preview_{i}.jpg">
</article></body></html>"""
    else:  # broken
        variant = i % 6
        if variant == 0:
            return b""  # B6 empty html
        if variant == 1:
            html = f"<html><head><title>{title}</ti"  # truncated
        elif variant == 2:
            html = f"<html><body><p>Too short {i}.</p></body></html>"
        elif variant == 3:
            # EUC-KR bytes with matching decl — A2 declared-charset path
            html = (
                '<html><head><meta charset="euc-kr"><title>한국어 제목</title>'
                "</head><body><article>"
                + "".join(f"<p>{_KO_SNIPPET} 문단 {k}</p>" for k in range(6))
                + "</article></body></html>"
            )
            return html.encode("cp949")
        elif variant == 4:
            # UNDECLARED cp949 bytes (no charset anywhere): the statistical
            # detector (A2's apparent_encoding role) must recover the Korean
            # text — before round 2 this decoded to replacement chars
            html = (
                "<html><head><title>한국어 제목</title>"
                "</head><body><article>"
                + "".join(f"<p>{_KO_SNIPPET} 문단 {k}</p>" for k in range(6))
                + "</article></body></html>"
            )
            return html.encode("cp949")
        else:
            # bogus decl + byte soup no detector can claim (0xFF lead before
            # ASCII is an invalid cp949 pair) — forces the utf-8/replace
            # last resort (A2 step 4)
            html = (
                '<html><head><meta charset="x-bogus-charset"></head><body>'
                f"<article><p>{_KO_SNIPPET}</p></article></body></html>"
            )
            return html.encode("cp949") + b"\xff " * 40  # invalid-pair stripe
    return html.encode("utf-8")


_LANGS = ("ko", "ko", "ko", "ko", "ko", "ko", "ko", "en", "es", "zh", "de")


_HUGE_PAD = ("<!-- " + "x" * 94 + " -->").encode()  # 100-byte comment block


def build_page(i: int, doc_text: str, huge_every: int = 0) -> Dict:
    arch = archetype_for(i)
    url = _url_for(i, arch)
    html = _page_html(i, arch, doc_text, url)
    if huge_every and i % huge_every == 7 and html:
        # FIXTURES.md `huge` archetype (bench only): pad a valid page to
        # 2-8 MB with comment blocks — content/extraction unchanged, size
        # lane takes the routing hit
        pad_blocks = (2 + i % 7) * 10_000  # 2..8 MB
        html = html.replace(b"</body>", _HUGE_PAD * pad_blocks + b"</body>", 1)
        arch = arch + "+huge"
    ts = _EPOCH + timedelta(days=i % 365, seconds=i % 86400)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": doc_text,
        "lang": _LANGS[i % len(_LANGS)],
        "archetype": arch,
    }


def pages_pdf(doc_ids, doc_texts, replicas: int = 1, huge_every: int = 0) -> pd.DataFrame:
    """Build a pandas pages frame from document id/text sequences."""
    rows = []
    for doc_id, text in zip(doc_ids, doc_texts):
        for r in range(replicas):
            i = int(doc_id) * replicas + r
            rows.append(build_page(i, text, huge_every=huge_every))
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "archetype"]
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "archetype string"
)


def pages_df(spark, sf_dir: str, replicas: int = 1, limit: int | None = None,
             huge_every: int = 0):
    """Distributed pages synthesis: documents.parquet -> pages DataFrame via
    mapInPandas (generation itself runs on executors, scales with input)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if limit is not None:
        docs = docs.where(f"doc_id < {int(limit)}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pages_pdf(pdf["doc_id"], pdf["text"], replicas=replicas,
                                huge_every=huge_every)

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)
