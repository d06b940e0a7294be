"""Distribution-invariance oracle: Spark output equals the single-process
pure-Python cascade for every url, at multiple partition counts — proves
partitioning/Arrow batching/size lanes never change a byte (SURVEY.md §5.2
layer 3)."""
import pytest

from newsspark.engines import extract_article
from newsspark.pages import pages_pdf
from newsspark.pipeline import run_extract

FIELDS = ("title", "text", "date", "method", "error")


@pytest.mark.parametrize("n_partitions", [1, 7, 32])
def test_spark_equals_pure_python_oracle(spark, tiny_docs, n_partitions):
    pdf = pages_pdf([d for d, _ in tiny_docs], [t for _, t in tiny_docs])
    oracle = {
        row["url"]: extract_article(row["url"], row["html"])
        for _, row in pdf.iterrows()
    }
    pages = spark.createDataFrame(
        pdf[["url", "html"]], schema="url string, html binary"
    )
    got = {
        r["url"]: r
        for r in run_extract(spark, pages, num_partitions=n_partitions).collect()
    }
    assert set(got) == set(oracle)
    for url, want in oracle.items():
        row = got[url]
        for f in FIELDS:
            assert row[f] == want[f], (url, f)
        assert list(row["images"]) == want["images"], url
