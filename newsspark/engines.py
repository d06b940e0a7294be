"""Pure-Python extraction engines + the 3-stage fallback cascade.

From-scratch reimplementation of the per-document semantics of
``jonghhhh/news_article_extractor`` (reference at /root/reference, read-only).
The reference delegates the heavy lifting to trafilatura / newspaper3k /
readability-lxml + Playwright; none of those are available here, so each stage
is rebuilt on the stdlib with a *differently-biased* scorer, and the resulting
behavior is frozen as this engine's golden spec (see tests/fixtures/golden).

Everything in this module is import-Spark-free and total (never raises for any
(url, html) input) so that:
  * the Spark pandas-UDF wraps these functions unchanged (newsspark/pipeline.py),
  * the single-process oracle in tests/test_oracle.py reuses the same code,
  * goldens freeze the byte-identical per-url contract.

Reference citations use extractor.py line numbers throughout.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Dict, List, Optional
from urllib.parse import urljoin

from .htmlite import Node, parse_html

# ---------------------------------------------------------------------------
# A2 — encoding cascade (extractor.py:32-44)
#
# Reference: utf-8 -> requests' apparent_encoding (chardet) -> utf-8/replace.
# chardet is unavailable; the detection step is reimplemented as declared-
# charset sniffing (<meta charset>, <meta http-equiv content-type>, XML decl)
# over the first 4 KiB — deterministic, frozen by fixtures.
# ---------------------------------------------------------------------------

_CHARSET_RES = (
    re.compile(rb'<meta[^>]+charset\s*=\s*["\']?([\w.:-]+)', re.I),
    re.compile(rb'encoding\s*=\s*["\']([\w.:-]+)["\']', re.I),
)


def sniff_charset(raw: bytes) -> str:
    head = raw[:4096]
    for rx in _CHARSET_RES:
        m = rx.search(head)
        if m:
            try:
                return m.group(1).decode("ascii").strip().lower()
            except Exception:
                continue
    return ""


def detect_charset_statistical(raw: bytes) -> str:
    """Deterministic stdlib stand-in for the reference's chardet-backed
    ``apparent_encoding`` step (extractor.py:38-40): byte-pattern scoring of
    the first 8 KiB for the encodings a Korean-news corpus actually hits —
    UTF-16 (BOM or NUL-stripe) and EUC-KR/CP949 (valid two-byte pair scan
    with a hangul-syllable majority).  Returns '' when nothing is confident;
    never raises."""
    head = raw[:8192]
    if head.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if head.startswith(b"\xfe\xff"):
        return "utf-16-be"
    if len(head) >= 32:
        half = len(head) // 2
        even_nul = head[::2].count(0)
        odd_nul = head[1::2].count(0)
        if odd_nul > half * 0.7 and even_nul < half * 0.05:
            return "utf-16-le"
        if even_nul > half * 0.7 and odd_nul < half * 0.05:
            return "utf-16-be"
    # CP949 pair scan: every high byte must open a valid (lead, trail) pair,
    # and most pairs must land in the EUC-KR hangul-syllable block — plain
    # latin-1/cp1252 text fails the trail check and stays undetected.
    i, n = 0, len(head)
    pairs = hangul = bad = 0
    while i < n:
        b = head[i]
        if b < 0x80:
            i += 1
            continue
        if i + 1 >= n:
            bad += 1
            break
        t = head[i + 1]
        lead_ok = 0x81 <= b <= 0xFE
        trail_ok = (
            0x41 <= t <= 0x5A or 0x61 <= t <= 0x7A or 0x81 <= t <= 0xFE
        )
        if lead_ok and trail_ok:
            pairs += 1
            if 0xB0 <= b <= 0xC8 and 0xA1 <= t <= 0xFE:
                hangul += 1
            i += 2
        else:
            bad += 1
            i += 1
    if pairs >= 4 and hangul * 2 >= pairs and bad * 10 <= pairs:
        return "cp949"
    return ""


def decode_html(raw) -> str:
    """bytes -> str via the 4-step cascade (extractor.py:34-44): utf-8 ->
    declared charset -> statistical detection -> utf-8/replace. Total."""
    if raw is None:
        return ""
    if isinstance(raw, str):
        return raw
    if isinstance(raw, bytearray) or isinstance(raw, memoryview):
        raw = bytes(raw)
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    declared = sniff_charset(raw)
    if declared and declared not in ("utf-8", "utf8"):
        try:
            return raw.decode(declared)
        except Exception:
            pass
    detected = detect_charset_statistical(raw)
    if detected:
        try:
            return raw.decode(detected)
        except Exception:
            pass
    return raw.decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# E2 — image filter (extractor.py:47-90), byte-exact semantics
# ---------------------------------------------------------------------------

IMG_EXCLUDE_PATTERNS = (
    "/logo", "_logo", "logo_", "/icon", "/btn_", "/banner/", "/ad_", "/ads/",
    "/thumb", "/profile", "/avatar", "/emoji", "/symbol", "office_logo",
    "default", "placeholder", "no_image", "noimage", "mannerbot",
    "people_default",
)
IMG_EXCLUDE_KEYWORDS = ("kakao", "facebook", "twitter", "share", "sns", "ic-")
_SIZE_RE = re.compile(r"(_ir_)?(\d+)x(\d+)")


def filter_images(images: List[str]) -> List[str]:
    """Drop logos/banners/icons/small/banner-ratio images (extractor.py:47-90).

    Order of checks pinned to the reference: suffix (original case), exclude
    patterns (lowercased), keywords (lowercased), size regex (original case,
    w<300 or h<300, aspect > 5)."""
    kept: List[str] = []
    for img_url in images:
        low = img_url.lower()
        if img_url.endswith((".svg", ".gif")):  # extractor.py:61
            continue
        if any(p in low for p in IMG_EXCLUDE_PATTERNS):  # extractor.py:65
            continue
        if any(k in low for k in IMG_EXCLUDE_KEYWORDS):  # extractor.py:69
            continue
        m = _SIZE_RE.search(img_url)  # extractor.py:74
        if m:
            width, height = int(m.group(2)), int(m.group(3))
            if width < 300 or height < 300:  # extractor.py:79
                continue
            if max(width, height) / min(width, height) > 5:  # extractor.py:84
                continue
        kept.append(img_url)
    return kept


# ---------------------------------------------------------------------------
# E1 — priority image extraction (extractor.py:93-158)
# ---------------------------------------------------------------------------

_BODY_IMG_SELECTORS = (
    "article img[src]",
    ".article-body img[src]",
    ".article_body img[src]",
    "#article img[src]",
    "#articleBody img[src]",
    ".news_view img[src]",      # naver
    ".view_content img[src]",   # daum
    ".article_view img[src]",
)


def _absolutize(src: str, url: str) -> str:
    # 'http' prefix gate exactly as extractor.py:102 (https also matches)
    return src if src.startswith("http") else urljoin(url, src)


def _body_selector_imgs(tree):
    """Per-selector <img> hit lists for _BODY_IMG_SELECTORS, in selector
    order — output-identical to ``[tree.select(s) for s in selectors]``
    (each selector is ``<container> img[src]``), but computed with ONE
    ancestor walk per image instead of eight chain walks: at every
    ancestor all eight container simples are tested at once and the
    matches collected as a bitmask.  Selector semantics are exactly
    _matches_chain's (any ancestor below the document root)."""
    if not isinstance(tree, Doc):  # bare-Node callers keep the generic path
        return [tree.select(s) for s in _BODY_IMG_SELECTORS]
    imgs = [im for im in tree.by_tag.get("img", ()) if "src" in im.attrs]
    if not imgs:
        return ()
    n_sel = len(_BODY_IMG_CONTAINERS)
    all_mask = (1 << n_sel) - 1
    tag_bits, id_bits, class_bits = _BODY_IMG_CONTAINER_BITS
    per_sel: list = [[] for _ in range(n_sel)]
    for img in imgs:
        mask = 0
        anc = img.parent
        while anc is not None and mask != all_mask:
            tag = anc.tag
            if tag != "[document]":
                mask |= tag_bits.get(tag, 0)
                attrs = anc.attrs
                if attrs:
                    mask |= id_bits.get(attrs.get("id", ""), 0)
                    cls = attrs.get("class")
                    if cls:
                        hit = class_bits.get(cls, 0)
                        if hit:  # whole attr == one clean token
                            mask |= hit
                        else:  # multi-token / any-whitespace: full split
                            for tok in cls.split():
                                mask |= class_bits.get(tok, 0)
            anc = anc.parent
        if mask:
            for k in range(n_sel):
                if (mask >> k) & 1:
                    per_sel[k].append(img)
    return per_sel


def extract_images_priority(tree: Node, url: str) -> List[str]:
    """og:image -> twitter:image -> body-selector imgs -> generic fallback,
    then ordered dedupe + filter (extractor.py:93-158)."""
    images: List[str] = []

    og = tree.find("meta", {"property": "og:image"})  # extractor.py:99
    if og is not None and og.get("content"):
        images.append(_absolutize(og.get("content"), url))

    tw = tree.find("meta", {"name": "twitter:image"})  # extractor.py:108
    if tw is not None and tw.get("content"):
        raw = tw.get("content")
        if raw not in images:  # novelty tested on the RAW value (extractor.py:111)
            images.append(_absolutize(raw, url))

    for imgs in _body_selector_imgs(tree):  # extractor.py:129
        for img in imgs:
            src = img.get("src") or img.get("data-src")
            if src:
                img_url = _absolutize(src, url)
                if img_url not in images:
                    images.append(img_url)

    if len(images) < 5:  # generic fallback, scan<=30, stop at 10 (extractor.py:141-152)
        for img in tree.find_all("img", {"src": True}, limit=30):
            src = img.get("src") or img.get("data-src")
            if src:
                img_url = _absolutize(src, url)
                if img_url not in images:
                    images.append(img_url)
                    if len(images) >= 10:
                        break

    deduped = list(dict.fromkeys(images))  # extractor.py:155 (order-stable)
    return filter_images(deduped)


# ---------------------------------------------------------------------------
# G1 — date coalesce chain (extractor.py:161-203)
# ---------------------------------------------------------------------------

_DATE_META_TAGS = (
    ("property", "article:published_time"),
    ("name", "article:published_time"),
    ("property", "og:article:published_time"),
    ("name", "pubdate"),
    ("name", "publishdate"),
    ("property", "datePublished"),
)
_URL_DATE_RE = re.compile(r"/(\d{4})[-/]?(\d{2})[-/]?(\d{2})")


def extract_date(tree: Node, url: str, meta_date: str = "") -> str:
    """Ordered coalesce: engine metadata -> meta tags -> <time> -> naver span
    -> URL pattern -> "" (extractor.py:161-203). Order is part of the
    byte-identical contract."""
    if meta_date:  # extractor.py:164
        return meta_date

    for attr, value in _DATE_META_TAGS:  # extractor.py:168-180
        elem = tree.find("meta", {attr: value})
        if elem is not None and elem.get("content"):
            return elem.get("content")

    time_elem = tree.find("time")  # extractor.py:183-187
    if time_elem is not None:
        dt_attr = time_elem.get("datetime")
        if dt_attr:
            return dt_attr
        # falls through when <time> has no datetime (reference quirk)

    if "naver.com" in url:  # extractor.py:190-195
        naver = tree.select_one("span.media_end_head_info_datestamp_time")
        if naver is not None:
            date_text = naver.get("data-date-time", "")
            if date_text:
                return date_text

    m = _URL_DATE_RE.search(url)  # extractor.py:197-201 (no range validation!)
    if m:
        year, month, day = m.groups()
        return f"{year}-{month}-{day}"

    return ""


# ---------------------------------------------------------------------------
# H1 — boilerplate line strip (extractor.py:521-534)
# ---------------------------------------------------------------------------

BOILERPLATE_MARKERS = ("무단 전재", "재배포 금지", "ⓒ", "Copyright", "▶")
_BLANK_RUN_RE = re.compile(r"\n{3,}")


def clean_text(text: str) -> str:
    """Strip boilerplate lines, collapse blank runs (extractor.py:521-534).
    Applied on the stage-3 path ONLY (extractor.py:503) — preserved asymmetry."""
    lines = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if any(marker in line for marker in BOILERPLATE_MARKERS):
            continue
        lines.append(line)
    cleaned = "\n".join(lines)
    cleaned = _BLANK_RUN_RE.sub("\n\n", cleaned)
    return cleaned.strip()


# ---------------------------------------------------------------------------
# Doc — one-walk index + per-document caches (SURVEY.md §4.1 fusion: parse
# once, walk once, share pure sub-results across engines).  Output-identical
# to direct tree queries (goldens enforce it); exists purely because every
# find/select used to DFS the whole tree and E1/G1 are pure in (tree, url)
# but were recomputed per engine.
# ---------------------------------------------------------------------------

from .htmlite import (  # noqa: E402
    _matches_chain,
    _matches_find,
    _matches_simple,
    _parse_selector,
)

# container halves of _BODY_IMG_SELECTORS (every selector is
# "<container> img[src]"), pre-parsed once for _body_selector_imgs
_BODY_IMG_CONTAINERS = tuple(
    _parse_selector(s)[0][0] for s in _BODY_IMG_SELECTORS
)


def _container_bit_tables(containers):
    """Compile single-feature container simples (a bare tag, one class, or
    one #id — all of _BODY_IMG_SELECTORS' containers) into three
    feature -> bitmask dicts so one ancestor visit resolves all selectors
    with dict lookups.  Asserts the single-feature shape so a future
    selector edit cannot silently change matching semantics."""
    tag_bits: dict = {}
    id_bits: dict = {}
    class_bits: dict = {}
    for k, (tag, node_id, classes, attrs) in enumerate(containers):
        bit = 1 << k
        assert not attrs, "container selectors must be tag/.class/#id only"
        n_features = (tag is not None) + (node_id is not None) + len(classes)
        assert n_features == 1, "container selectors must be single-feature"
        if tag is not None:
            tag_bits[tag] = tag_bits.get(tag, 0) | bit
        elif node_id is not None:
            id_bits[node_id] = id_bits.get(node_id, 0) | bit
        else:
            class_bits[classes[0]] = class_bits.get(classes[0], 0) | bit
    return tag_bits, id_bits, class_bits


_BODY_IMG_CONTAINER_BITS = _container_bit_tables(_BODY_IMG_CONTAINERS)


class Doc:
    __slots__ = (
        "tree", "url", "elements", "by_tag", "pos",
        "_images_priority", "_date", "_ptext", "_plink",
    )

    def __init__(self, tree: Node, url: str = ""):
        self.tree = tree
        self.url = url
        # inline pre-order DFS (same order as tree.iter_elements(), without
        # the per-node generator/list-comprehension overhead)
        elements: list = []
        by_tag: dict = {}
        pos: dict = {}
        stack = [c for c in reversed(tree.children) if isinstance(c, Node)]
        i = 0
        while stack:
            el = stack.pop()
            elements.append(el)
            bucket = by_tag.get(el.tag)
            if bucket is None:
                by_tag[el.tag] = [el]
            else:
                bucket.append(el)
            pos[id(el)] = i
            i += 1
            children = el.children
            if children:
                stack.extend(
                    c for c in reversed(children) if isinstance(c, Node)
                )
        self.elements = elements
        self.by_tag = by_tag
        self.pos = pos
        self._images_priority = None
        self._date = None
        self._ptext: dict = {}
        self._plink: dict = {}

    # --- Node-compatible query API (document-rooted, bucket-accelerated) ---
    def iter_elements(self):
        return iter(self.elements)

    def find(self, tag=None, attrs=None):
        bucket = self.by_tag.get(tag, ()) if tag else self.elements
        for node in bucket:
            if _matches_find(node, tag, attrs):
                return node
        return None

    def find_all(self, tag=None, attrs=None, limit=None):
        bucket = self.by_tag.get(tag, ()) if tag else self.elements
        out = []
        for node in bucket:
            if _matches_find(node, tag, attrs):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def select(self, selector, limit=None):
        alts = _parse_selector(selector)
        # candidate pool: union of target-tag buckets when every alternative
        # names a tag, else all elements; merged back to document order
        pools = []
        for chain in alts:
            tag = chain[-1][0]
            if tag is None:
                pools = None
                break
            pools.append(self.by_tag.get(tag, ()))
        if pools is None:
            candidates = self.elements
        elif len(pools) == 1:
            candidates = pools[0]
        else:
            seen = set()
            merged = []
            for p in pools:
                for node in p:
                    if id(node) not in seen:
                        seen.add(id(node))
                        merged.append(node)
            merged.sort(key=lambda n: self.pos[id(n)])
            candidates = merged
        out = []
        if len(alts) == 1:
            # the engine vocabulary is almost all single-alternative
            # selectors; skip the per-node any()-generator allocation
            chain = alts[0]
            for node in candidates:
                if _matches_chain(node, chain):
                    out.append(node)
                    if limit is not None and len(out) >= limit:
                        break
            return out
        for node in candidates:
            if any(_matches_chain(node, chain) for chain in alts):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def select_one(self, selector):
        found = self.select(selector, limit=1)
        return found[0] if found else None

    # --- cached pure per-document computations ---
    def images_priority(self) -> List[str]:
        if self._images_priority is None:
            self._images_priority = extract_images_priority(self, self.url)
        return list(self._images_priority)  # copy: callers mutate (E3 prepend)

    def date_chain(self) -> str:
        if self._date is None:
            self._date = extract_date(self, self.url)
        return self._date

    def p_text(self, p: Node) -> str:
        key = id(p)
        got = self._ptext.get(key)
        if got is None:
            got = _norm_space(p.get_text(" "))
            self._ptext[key] = got
        return got

    def p_link(self, p: Node) -> float:
        key = id(p)
        got = self._plink.get(key)
        if got is None:
            got = _link_ratio(p)
            self._plink[key] = got
        return got


def _as_doc(tree, url: str) -> "Doc":
    return tree if isinstance(tree, Doc) else Doc(tree, url)


# ---------------------------------------------------------------------------
# Shared scoring helpers
# ---------------------------------------------------------------------------

# Subtrees no engine treats as content (tables dropped per the reference's
# trafilatura flags include_tables=False / include_comments=False,
# extractor.py:323-324).
SKIP_TAGS = frozenset(
    "script style noscript table nav aside footer header form iframe svg".split()
)
_BOILER_RE = re.compile(
    r"comment|footer|footing|sidebar|sns|share|related|social|navbar|menu"
    r"|banner|advert|masthead|promo|breadcrumb|copyright",
    re.I,
)


def _norm_space(text: str) -> str:
    # single-space-normalize + strip; str.split splits on exactly the same
    # Unicode whitespace class as re \s matches (verified over the whole
    # BMP), at roughly a third of the regex-sub cost
    return " ".join(text.split())


def _is_excluded(node: Node) -> bool:
    if node.tag in SKIP_TAGS:
        return True
    attrs = node.attrs
    if not attrs:  # hot path: most elements carry no class/id at all
        return False
    blob = attrs.get("class", "") + " " + attrs.get("id", "")
    return bool(blob.strip()) and bool(_BOILER_RE.search(blob))


def _under_exclusion(node: Node, stop: Optional[Node] = None) -> bool:
    """True if node or any ancestor strictly below ``stop`` is excluded."""
    cur: Optional[Node] = node
    while cur is not None and cur is not stop:
        if _is_excluded(cur):
            return True
        cur = cur.parent
    return False


def _link_ratio(node: Node) -> float:
    # Fused single walk over the subtree; identical arithmetic to
    #   total  = len(node.get_text(""))
    #   linked = sum(len(a.get_text("")) for a in node.find_all("a"))
    # including the original's nested-<a> multiplicity (text under k
    # stacked anchors counted k times in ``linked``).
    total = 0
    linked = 0
    stack = [(node, 0)]
    while stack:
        cur, a_depth = stack.pop()
        for c in cur.children:
            if isinstance(c, str):
                ln = len(c)
                total += ln
                if a_depth:
                    linked += ln * a_depth
            else:
                stack.append((c, a_depth + 1 if c.tag == "a" else a_depth))
    if total == 0:
        return 0.0
    return linked / total


def _word_count(text: str) -> int:
    return len(text.split())


# ---------------------------------------------------------------------------
# D1 — stage 1: trafilatura-style main-content density scorer
# (reference call site extractor.py:309-354; algorithm rebuilt from scratch
#  in the style of Barbaresi, ACL 2021: candidate containers scored by
#  paragraph text mass x link-density penalty, boilerplate subtrees dropped)
# ---------------------------------------------------------------------------

_CANDIDATE_TAGS = frozenset("article main section div body".split())
MIN_ENGINE1_CHARS = 200  # analog of trafilatura's min_extracted_size gate


def engine_density(tree, url: str) -> Optional[Dict]:
    """Stage-1 engine. Returns None when no adequate body is found — the
    analog of trafilatura.extract() returning None (extractor.py:331-332),
    which makes the cascade skip the stage-1 method tag."""
    doc = _as_doc(tree, url)
    # Single pass: attribute each <p> to every candidate ancestor reachable
    # without crossing an excluded node (identical semantics to walking each
    # candidate's subtree, measured ~15% faster end-to-end).  Attribution
    # order = doc order of the <p>s, preserving paragraph order per candidate.
    cand_ps: dict = {}   # id(candidate) -> (candidate, [p...])
    cand_order: list = []
    # memoize per-node exclusion: the same ancestors are re-walked once per
    # <p>, and _is_excluded's regex scan was ~4% of the whole cascade
    excl: dict = {}
    for p in doc.by_tag.get("p", ()):
        excluded_below = _is_excluded(p)
        anc = p.parent
        while anc is not None:
            if (not excluded_below) and anc.tag in _CANDIDATE_TAGS:
                key = id(anc)
                if key not in cand_ps:
                    cand_ps[key] = (anc, [])
                    cand_order.append(key)
                cand_ps[key][1].append(p)
            akey = id(anc)
            e = excl.get(akey)
            if e is None:
                e = excl[akey] = _is_excluded(anc)
            if e:
                excluded_below = True
            anc = anc.parent

    best: Optional[Node] = None
    best_ps: list = []
    best_score = 0.0
    # doc order over candidates (ties keep the first in doc order)
    for key in sorted(cand_ps, key=lambda k: doc.pos[id(cand_ps[k][0])]):
        cand, ps = cand_ps[key]
        if _under_exclusion(cand):
            continue
        score = 0.0
        for p in ps:
            text = doc.p_text(p)
            if len(text) < 25:
                continue
            ratio = doc.p_link(p)
            if ratio > 0.66:
                continue
            score += len(text) * (1.0 - ratio)
        if score > best_score:  # strict >: ties keep the first in doc order
            best, best_ps, best_score = cand, ps, score

    if best is None:
        return None
    paras = []
    for p in best_ps:
        text = doc.p_text(p)
        if text and doc.p_link(p) <= 0.66:
            paras.append(text)
    body = "\n".join(paras)
    if len(body) < MIN_ENGINE1_CHARS:
        return None

    # Title bias: og:title -> first <h1> (NOT <title>; that is stage 2's bias,
    # preserving the C1 fill-if-empty merge the reference relies on).
    title = ""
    og_title = doc.find("meta", {"property": "og:title"})
    if og_title is not None and og_title.get("content"):
        title = og_title.get("content").strip()
    else:
        h1 = doc.find("h1")
        if h1 is not None:
            title = _norm_space(h1.get_text(" "))

    images = doc.images_priority()
    # E3 top-image prepend (extractor.py:341-343): trafilatura's data['image']
    # is the og:image; prepend if novel.
    og_img = doc.find("meta", {"property": "og:image"})
    if og_img is not None and og_img.get("content"):
        top = _absolutize(og_img.get("content"), url)
        if top not in images:
            images.insert(0, top)

    date = doc.date_chain()  # extractor.py:346 fallback chain
    return {
        "url": url,
        "title": title,
        "text": body,
        "date": date,
        "images": images[:5],  # extractor.py:353
    }


# ---------------------------------------------------------------------------
# D2 — stage 2: newspaper3k-style selectors + p-cluster scorer
# (reference call site extractor.py:357-390; rebuilt: title = og:title ->
#  <title> split on separators -> first <h1>; body = best contiguous <p>
#  cluster by word count; date = published_time meta parsed to isoformat)
# ---------------------------------------------------------------------------

_TITLE_SEPARATORS = (" | ", " - ", " :: ", " – ", " — ")
_CLUSTER_MIN_WORDS = 25
_P_MIN_WORDS = 3


def _title_newspaper(tree) -> str:
    og_title = tree.find("meta", {"property": "og:title"})
    if og_title is not None and og_title.get("content"):
        return og_title.get("content").strip()
    title_el = tree.find("title")
    if title_el is not None:
        raw = _norm_space(title_el.get_text(" "))
        if raw:
            for sep in _TITLE_SEPARATORS:
                if sep in raw:
                    pieces = [p.strip() for p in raw.split(sep)]
                    return max(pieces, key=len)  # longest piece, first on ties
            return raw
    h1 = tree.find("h1")
    if h1 is not None:
        return _norm_space(h1.get_text(" "))
    return ""


def _best_p_cluster(doc):
    """Group <p> elements by parent; score = sum of word counts of paragraphs
    with >= 5 words. Returns (parent, [paragraph Nodes]) or (None, [])."""
    clusters: dict = {}
    order: List[int] = []
    p_nodes = doc.by_tag.get("p", ()) if isinstance(doc, Doc) else (
        n for n in doc.iter_elements() if n.tag == "p")
    for p in p_nodes:
        if p.tag != "p" or _under_exclusion(p):
            continue
        key = id(p.parent)
        if key not in clusters:
            clusters[key] = (p.parent, [])
            order.append(key)
        clusters[key][1].append(p)
    best_key, best_score = None, 0
    for key in order:
        _, ps = clusters[key]
        score = sum(
            _word_count(_norm_space(p.get_text(" ")))
            for p in ps
            if _word_count(_norm_space(p.get_text(" "))) >= 5
        )
        if score > best_score:
            best_key, best_score = key, score
    if best_key is None or best_score < _CLUSTER_MIN_WORDS:
        return None, []
    return clusters[best_key]


def _parse_iso_date(raw: str) -> str:
    """Emulate newspaper's publish_date.isoformat() (extractor.py:378):
    normalize a parseable timestamp to datetime.isoformat(); else ''."""
    value = raw.strip()
    if not value:
        return ""
    candidate = value.replace("Z", "+00:00")
    for parser in (datetime.fromisoformat,):
        try:
            return parser(candidate).isoformat()
        except ValueError:
            pass
    m = re.match(r"(\d{4})[./-](\d{1,2})[./-](\d{1,2})", value)
    if m:
        try:
            return datetime(int(m.group(1)), int(m.group(2)), int(m.group(3))).isoformat()
        except ValueError:
            return ""
    return ""


def engine_newspaper(tree, url: str) -> Dict:
    """Stage-2 engine. Always returns a dict — newspaper's Article.parse()
    never 'fails soft', so the reference appends the stage-2 method tag
    whenever stage 2 runs without raising (extractor.py:261-271)."""
    doc = _as_doc(tree, url)
    title = _title_newspaper(doc)

    parent, ps = _best_p_cluster(doc)
    if parent is not None:
        paras = []
        for p in ps:
            text = _norm_space(p.get_text(" "))
            if _word_count(text) >= _P_MIN_WORDS:
                paras.append(text)
        body = "\n\n".join(paras)  # newspaper joins with blank lines
    else:
        body = ""

    # date: published-time metas parsed to isoformat, else the shared chain
    date = ""
    for attr, value in (
        ("property", "article:published_time"),
        ("name", "article:published_time"),
        ("name", "date"),
    ):
        elem = doc.find("meta", {attr: value})
        if elem is not None and elem.get("content"):
            date = _parse_iso_date(elem.get("content"))
            if date:
                break
    if not date:
        date = doc.date_chain()  # extractor.py:381-382

    images = doc.images_priority()
    top = _top_image_newspaper(doc, parent, url)
    if top and top not in images:  # E3 prepend (extractor.py:374-375)
        images.insert(0, top)

    return {
        "url": url,
        "title": title,
        "text": body,
        "date": date,
        "images": images[:5],  # extractor.py:389
    }


def _top_image_newspaper(tree, cluster_parent: Optional[Node], url: str) -> str:
    og = tree.find("meta", {"property": "og:image"})
    if og is not None and og.get("content"):
        return _absolutize(og.get("content"), url)
    tw = tree.find("meta", {"name": "twitter:image"})
    if tw is not None and tw.get("content"):
        return _absolutize(tw.get("content"), url)
    scope = cluster_parent if cluster_parent is not None else tree
    img = scope.find("img", {"src": True})
    if img is not None and img.get("src"):
        return _absolutize(img.get("src"), url)
    return ""


# ---------------------------------------------------------------------------
# D3 — stage 3: site rules + readability-style DOM scorer
# (reference call site extractor.py:393-518; Playwright render dropped —
#  batch engine operates on stored html, SURVEY.md §2 A3. Scoring rebuilt in
#  the style of Mozilla readability: per-block comma/length scores propagated
#  to parent/grandparent with class/id regex boosts.)
# ---------------------------------------------------------------------------

DEFAULT_SITE_RULES = (
    # (host substring, body selector, title selector) — extractor.py:472-474
    ("naver.com", "#dic_area", "h2.media_end_head_headline, h1"),
)

_POSITIVE_RE = re.compile(
    r"article|body|content|entry|main|page|post|text|story", re.I
)
_NEGATIVE_RE = re.compile(
    r"combx|comment|contact|foot|masthead|media|meta|outbrain|promo|related"
    r"|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget|banner|ad-",
    re.I,
)
_SCORE_TAGS = frozenset("p pre td blockquote div".split())
_TEXT_SKIP = frozenset(("script", "style", "noscript"))


def _base_score(node: Node) -> float:
    score = 0.0
    if node.tag == "div":
        score += 5
    elif node.tag in ("pre", "td", "blockquote", "article", "main", "section"):
        score += 3
    elif node.tag in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
        score -= 3
    elif node.tag in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
        score -= 5
    blob = node.attrs.get("class", "") + " " + node.attrs.get("id", "")
    if _NEGATIVE_RE.search(blob):
        score -= 25
    elif _POSITIVE_RE.search(blob):
        score += 25
    return score


def _has_block_children(node: Node) -> bool:
    return any(
        isinstance(c, Node) and c.tag in ("div", "p", "table", "ul", "ol", "section", "article")
        for c in node.children
    )


def readability_top_node(tree) -> Optional[Node]:
    scores: dict = {}
    order: dict = {}

    def ensure(node: Node) -> int:
        key = id(node)
        if key not in scores:
            scores[key] = (_base_score(node), node)
            order[key] = len(order)
        return key

    for node in tree.iter_elements():
        if node.tag not in _SCORE_TAGS:
            continue
        if node.tag == "div" and _has_block_children(node):
            continue  # leaf-ish divs only
        if _under_exclusion(node):
            continue
        inner = _norm_space(node.get_text(" "))
        if len(inner) < 25:
            continue
        content_score = 1.0 + inner.count(",") + inner.count("，")
        content_score += min(len(inner) // 100, 3)
        # the block itself is a candidate too (robustness: content attached
        # directly under the document root must still be extractable)
        skey = ensure(node)
        scores[skey] = (scores[skey][0] + content_score, node)
        parent = node.parent
        if parent is not None and parent.tag != "[document]":
            key = ensure(parent)
            scores[key] = (scores[key][0] + content_score, parent)
            grand = parent.parent
            if grand is not None and grand.tag != "[document]":
                gkey = ensure(grand)
                scores[gkey] = (scores[gkey][0] + content_score / 2.0, grand)

    best_node, best_final = None, 0.0
    for key, (score, node) in sorted(scores.items(), key=lambda kv: order[kv[0]]):
        final = score * (1.0 - _link_ratio(node))
        if final > best_final:
            best_node, best_final = node, final
    return best_node


def engine_readability(tree, url: str, site_rules=DEFAULT_SITE_RULES) -> Dict:
    """Stage-3 engine (reference stage 3 minus the browser render, A3 ⊘).
    Site-rule path first (extractor.py:472-482), readability fallback when the
    rule text is <100 chars (extractor.py:484-494), then images/date/clean."""
    doc = _as_doc(tree, url)
    text = ""
    title = ""
    for host_sub, body_sel, title_sel in site_rules or ():
        if host_sub in url:
            article_elem = doc.select_one(body_sel)
            title_elem = doc.select_one(title_sel)
            if article_elem is not None:
                text = article_elem.get_text("\n", skip=_TEXT_SKIP).strip()
            if title_elem is not None:
                title = title_elem.get_text().strip()
            break

    if not text or len(text) < 100:  # extractor.py:485
        best = readability_top_node(doc)
        if best is not None:
            text = best.get_text("\n", skip=_TEXT_SKIP).strip()
        title_el = doc.find("title")  # doc.title() analog (extractor.py:494)
        title = _norm_space(title_el.get_text(" ")) if title_el is not None else title

    images = doc.images_priority()  # extractor.py:497
    date = doc.date_chain()  # extractor.py:500
    text = clean_text(text)  # extractor.py:503 — stage-3-only cleaning

    return {
        "url": url,
        "title": title,
        "text": text,
        "date": date,
        "images": images[:5],  # extractor.py:510
    }


# ---------------------------------------------------------------------------
# The cascade (extractor.py:206-306) — B1-B6 gates, C1-C4 merges
# ---------------------------------------------------------------------------

FAIL_MSG = "모든 추출 방법 실패: 본문을 찾을 수 없습니다"  # extractor.py:304
# NOTE: the reference's download-failure message (extractor.py:316, "페이지
# 다운로드 실패") is NOT part of this contract: fetch is out of scope
# (SURVEY.md A1 ⊘), and the empty-html path deliberately ends in FAIL_MSG —
# matching the reference's swallowed-exception outcome where an empty body
# falls through every engine to the same all-methods-failed error.

STAGE1_TAG = "trafilatura"
STAGE2_TAG = "newspaper3k"
STAGE3_TAG = "readability"  # reference tag is "playwright"; the batch engine
# has no browser so stage 3 is the readability scorer over stored html — an
# intentional, documented divergence (SURVEY.md §2 A3/D3).

_FIELDS = ("title", "text", "date", "images", "method", "error")


def _finalize(result: Dict) -> Dict:
    result["method"] = ", ".join(result["method"]) if result["method"] else "none"
    result["images"] = list(dict.fromkeys(result["images"]))[:5]  # extractor.py:300
    return result


def extract_article(url: str, html, site_rules=DEFAULT_SITE_RULES) -> Dict:
    """Full 3-stage cascade for one document. Total: never raises; failures
    land in the ``error`` field (the batch-engine analog of HTTP 500,
    main.py:647)."""
    result: Dict = {
        "url": url or "",
        "title": "",
        "text": "",
        "date": "",
        "images": [],
        "method": [],
        "error": None,
    }
    try:
        text_html = decode_html(html)
        if not text_html or not text_html.strip():  # B6 (extractor.py:315-316)
            result = _finalize(result)
            result["error"] = FAIL_MSG
            return result

        tree = Doc(parse_html(text_html), url)

        # --- stage 1 (extractor.py:237-256) ---
        try:
            data = engine_density(tree, url)
        except Exception:
            data = None
        if data:
            if data.get("title"):
                result["title"] = data["title"]
            if data.get("text"):
                result["text"] = data["text"]
            if data.get("date"):
                result["date"] = data["date"]
            if data.get("images"):
                result["images"].extend(data["images"])
            result["method"].append(STAGE1_TAG)
            if result["title"] and result["text"] and len(result["images"]) >= 1:
                return _finalize(result)  # early exit skips the B4 gate
                # (reference quirk, extractor.py:251-254)

        # --- stage 2 (extractor.py:259-279), fill-if-empty merge C1 ---
        if not result["title"] or not result["text"] or not result["images"]:
            try:
                data = engine_newspaper(tree, url)
            except Exception:
                data = None
            if data:
                if not result["title"] and data.get("title"):
                    result["title"] = data["title"]
                if not result["text"] and data.get("text"):
                    result["text"] = data["text"]
                if not result["date"] and data.get("date"):
                    result["date"] = data["date"]
                if data.get("images"):
                    result["images"].extend(data["images"])  # C2 accumulation
                result["method"].append(STAGE2_TAG)
                if result["title"] and result["text"] and len(result["images"]) >= 1:
                    return _finalize(result)  # extractor.py:274-277

        # --- stage 3 (extractor.py:282-296) ---
        if not result["text"]:
            try:
                data = engine_readability(tree, url, site_rules)
            except Exception:
                data = None
            if data:
                if not result["title"] and data.get("title"):
                    result["title"] = data["title"]
                if not result["text"] and data.get("text"):
                    result["text"] = data["text"]
                if not result["date"] and data.get("date"):
                    result["date"] = data["date"]
                if data.get("images"):
                    result["images"].extend(data["images"])
                result["method"].append(STAGE3_TAG)

        result = _finalize(result)
        if not result["text"] or len(result["text"]) < 100:  # B4 (extractor.py:303)
            result["error"] = FAIL_MSG
        return result
    except Exception as exc:  # belt & braces: stay total
        result["method"] = (
            ", ".join(result["method"])
            if isinstance(result["method"], list)
            else result["method"]
        ) or "none"
        if not isinstance(result["images"], list):
            result["images"] = []
        result["error"] = f"internal: {type(exc).__name__}: {exc}"
        return result
