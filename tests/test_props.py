"""Property-based invariants over random HTML-ish documents (SURVEY.md §5.2
layer 4). hypothesis generates adversarial soup; the cascade must stay total
and respect its structural contracts."""
import string

from hypothesis import given, settings, strategies as st

from newsspark.engines import clean_text, decode_html, extract_article

LEGAL_METHODS = {
    "none",
    "trafilatura",
    "newspaper3k",
    "readability",
    "trafilatura, newspaper3k",
    "trafilatura, readability",
    "newspaper3k, readability",
    "trafilatura, newspaper3k, readability",
}

tag_soup = st.text(
    alphabet=string.ascii_letters + string.digits + "<>/=\"' \n\t.#&;-한글ⓒ▶",
    max_size=4000,
)
raw_bytes = st.binary(max_size=2000)


@settings(max_examples=120, deadline=None)
@given(tag_soup)
def test_cascade_total_and_invariants(html):
    rec = extract_article("https://ex.com/2026/01/02/a", html.encode("utf-8"))
    assert rec["method"] in LEGAL_METHODS
    assert len(rec["images"]) <= 5
    assert len(set(rec["images"])) == len(rec["images"])  # deduped
    if rec["text"] == "":
        assert rec["error"] is not None  # empty text => failure recorded
    if rec["error"] is None:
        assert len(rec["text"]) >= 100 or (
            rec["title"] and rec["text"] and rec["images"]
        )  # B4, modulo the early-exit quirk


@settings(max_examples=120, deadline=None)
@given(raw_bytes)
def test_decode_total(raw):
    out = decode_html(raw)
    assert isinstance(out, str)
    rec = extract_article("https://ex.com/a", raw)  # end-to-end total too
    assert isinstance(rec["method"], str)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2000))
def test_clean_text_idempotent(text):
    once = clean_text(text)
    assert clean_text(once) == once
