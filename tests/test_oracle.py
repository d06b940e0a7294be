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


def test_dedup_substring_spans_semantics(spark):
    """ExactSubstr (Lee et al. 2022) at 8-gram granularity: a 10-token
    passage shared by two docs yields one merged span covering its three
    overlapping 8-gram windows in each doc; a unique doc yields none;
    the span end is exclusive (start + run + 8)."""
    import duckdb
    import pandas as pd

    from newsspark.contract_sql import DUCK_SQL, SPARK_SQL

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, "intro words here " + shared + " closing remark", "en"),
        (1, shared + " different tail entirely now", "en"),
        (2, "totally unique content with no repeats at all whatsoever ok",
         "en"),
    ]
    pdf = pd.DataFrame(
        [(i, t, l, "src0", len(t)) for i, t, l in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_gram_hits"])
        for r in spark.sql(SPARK_SQL["dedup_substring_spans"]).collect()
    }
    # doc 0: shared tokens at positions 3..12 -> 8-grams at 3,4,5 -> span
    # [3, 13); doc 1: positions 0..9 -> grams 0,1,2 -> span [0, 10)
    assert got == {(0, 3, 13, 3), (1, 0, 10, 3)}
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        tuple(r) for r in
        con.execute(DUCK_SQL["dedup_substring_spans"]).fetchall()
    }
    assert got == want
