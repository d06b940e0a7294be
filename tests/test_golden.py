"""Golden end-to-end: Spark pipeline output must match the frozen fixtures
byte-for-byte per url (SURVEY.md §5.2 layer 2 — the sandbox rendering of
'matches the reference extractor's fixtures byte-identically per url')."""
import pandas as pd

from newsspark.pages import pages_pdf
from newsspark.pipeline import run_extract

FIELDS = ("title", "text", "date", "method", "error")


def _spark_articles(spark, tiny_docs, **kw):
    pdf = pages_pdf([d for d, _ in tiny_docs], [t for _, t in tiny_docs])
    pages = spark.createDataFrame(
        pdf[["url", "html"]],
        schema="url string, html binary",
    )
    return {r["url"]: r for r in run_extract(spark, pages, **kw).collect()}


def test_spark_matches_goldens_byte_identical(spark, tiny_docs, goldens):
    got = _spark_articles(spark, tiny_docs, num_partitions=8)
    assert set(got) == set(goldens)
    for url, g in goldens.items():
        row = got[url]
        for f in FIELDS:
            assert row[f] == g[f], (url, f, g["archetype"])
        assert list(row["images"]) == g["images"], (url, g["archetype"])


def test_goldens_cover_every_cascade_path(goldens):
    methods = {g["method"] for g in goldens.values()}
    assert "trafilatura" in methods                      # stage-1 early exit
    assert "trafilatura, newspaper3k" in methods         # C1 merge path
    assert "newspaper3k, readability" in methods         # stage-3 path
    assert "none" in methods                             # total failure
    archetypes = {g["archetype"] for g in goldens.values()}
    assert len(archetypes) >= 9
    errors = [g for g in goldens.values() if g["error"] is not None]
    assert errors, "corpus must include failure rows"
