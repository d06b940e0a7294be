"""Pipeline-level regressions and plan checks."""
import pyspark.sql.functions as F

from newsspark.pipeline import method_metrics, run_extract


def test_null_html_rows_survive_the_size_lane(spark):
    # Regression: length(html) > N is NULL for NULL html; the row must not
    # fall through both lanes (caught during runtime verification, round 1).
    rows = [("https://x.com/a", None), ("https://x.com/b", b"<p>hi</p>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = run_extract(spark, df, num_partitions=2).collect()
    assert len(out) == 2
    null_row = [r for r in out if r["url"] == "https://x.com/a"][0]
    assert null_row["method"] == "none" and null_row["error"] is not None


def test_size_lane_routes_large_docs(spark):
    big = ("<html><body><article>" + "<p>big page paragraph with plenty of words, commas, and text.</p>" * 2000 + "</article></body></html>").encode()
    rows = [("https://x.com/big", big)] + [
        (f"https://x.com/s{i}", b"<p>small.</p>") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = run_extract(spark, df, num_partitions=2, size_lane_bytes=1024).collect()
    assert len(out) == 11
    big_row = [r for r in out if r["url"] == "https://x.com/big"][0]
    assert big_row["error"] is None and len(big_row["text"]) > 1000


def test_column_pruning_reaches_the_scan(spark, tmp_path):
    # Only (url, html) may be read from the pages table — ReadSchema must not
    # include text/lang/warc_ts (SURVEY.md §4.2 column pruning).
    p = str(tmp_path / "pages")
    spark.createDataFrame(
        [("u1", None, b"<p>x</p>", "txt", "ko")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).write.parquet(p)
    pages = spark.read.parquet(p)
    plan = run_extract(spark, pages)._jdf.queryExecution().executedPlan().toString()
    read_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_lines, plan
    for line in read_lines:
        schema_part = line.split("ReadSchema")[1]
        assert "html" in schema_part
        assert "text" not in schema_part and "lang" not in schema_part, line


def test_method_metrics_schema(spark):
    df = spark.createDataFrame(
        [("u", b"<p>x</p>")], "url string, html binary"
    )
    m = method_metrics(run_extract(spark, df, num_partitions=1))
    assert set(m.columns) == {"method", "n_rows", "n_failed", "text_chars"}
    assert m.count() >= 1


def test_site_rules_broadcast_join_equals_default_path(spark, tiny_docs=None):
    from newsspark.pages import pages_pdf
    from newsspark.pipeline import default_site_rules_df
    import duckdb

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        "where doc_id < 120 order by doc_id"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs])
    pages = spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")
    rules = default_site_rules_df(spark)

    base = {r["url"]: r for r in run_extract(spark, pages, num_partitions=4).collect()}
    joined = {
        r["url"]: r
        for r in run_extract(
            spark, pages, num_partitions=4, site_rules=rules
        ).collect()
    }
    assert set(base) == set(joined)
    for url in base:
        for f in ("title", "text", "date", "method", "error"):
            assert base[url][f] == joined[url][f], (url, f)
        assert list(base[url]["images"] or []) == list(joined[url]["images"] or [])

    # the rules path is map-only: no join of any kind in the physical plan
    # (first-match over the collected config-sized rule list — a url hitting
    # two patterns must not duplicate, and a containment join can't express
    # first-match)
    plan = (
        run_extract(spark, pages, num_partitions=4, site_rules=rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan


def test_overlapping_site_rules_no_duplication_most_specific_wins(spark):
    from newsspark.pages import pages_pdf
    import duckdb

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        "where doc_id < 120 order by doc_id"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs])
    pages = spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")
    n_pages = pages.count()

    # two rules match every naver url; the generic one has selectors that
    # can never match, so output correctness proves the specific rule won
    rules = spark.createDataFrame(
        [
            ("naver.com", "#no_such_body", ".no_such_title"),
            ("n.news.naver.com", "#dic_area", ".media_end_head_headline"),
        ],
        "host_pattern string, body_selector string, title_selector string",
    )
    out = run_extract(spark, pages, num_partitions=4, site_rules=rules).collect()
    assert len(out) == n_pages  # r1 bug: multi-match doubled these rows
    urls = [r["url"] for r in out]
    assert len(urls) == len(set(urls))
    naver_ok = [
        r for r in out
        if "naver.com" in r["url"] and r["error"] is None and r["text"]
    ]
    assert naver_ok, "specific rule must extract the naver pages"


def test_extract_run_single_pass_tables(spark, tmp_path):
    """extract_run writes the extracted rows ONCE, partitioned by status —
    the articles/quarantine split is partition pruning, not a rewrite —
    and records a real content-address snapshot in lineage."""
    import duckdb
    from newsspark.pages import pages_pdf
    from newsspark.pipeline import extract_run

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        "where doc_id < 80"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs])
    pages = spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")
    out = str(tmp_path / "run")
    summary = extract_run(spark, pages, out, num_partitions=4)
    assert summary["n_rows"] == 80
    articles = spark.read.parquet(summary["articles_path"])
    quarantine = spark.read.parquet(summary["quarantine_path"])
    assert articles.where("error is not null").count() == 0
    assert quarantine.where("error is null").count() == 0
    assert articles.count() + quarantine.count() == 80
    assert quarantine.count() == summary["n_failed"]
    lineage = spark.read.parquet(f"{out}/lineage").collect()
    assert len(lineage) == 1 and lineage[0]["status"] == "ok"
    # real snapshot: the ParquetCatalog content-address of extracted/, and
    # NULL bucket fields (a 0 sentinel would trip the resume consistency
    # check if this lineage dir were reused by run_with_checkpoint)
    assert lineage[0]["snapshot_id"] == summary["snapshot_id"] != ""
    assert lineage[0]["bucket"] is None and lineage[0]["n_buckets"] is None
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.count() >= 2
    # single-pass layout: every data row lives in exactly one parquet tree
    import os

    assert not os.path.exists(f"{out}/_all")
    assert sorted(
        d for d in os.listdir(f"{out}/extracted") if d.startswith("status=")
    ) == ["status=failed", "status=ok"]


def test_warc_ts_partition_pruning(spark, tmp_path):
    # pages partitioned by warc date -> a date predicate must prune at the
    # scan (SURVEY.md §4.2 partition pruning)
    p = str(tmp_path / "pages_part")
    rows = [(f"u{i}", f"2026-01-{1 + i % 3:02d}", b"<p>x</p>") for i in range(30)]
    spark.createDataFrame(rows, "url string, dt string, html binary").write.partitionBy(
        "dt"
    ).parquet(p)
    df = spark.read.parquet(p).where("dt = '2026-01-02'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() == 10
    # only one of three partition dirs is read
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "2026-01-02" in m.group(1), plan


def test_huge_pages_route_through_size_lane_identically(spark):
    import duckdb
    from newsspark.engines import extract_article
    from newsspark.pages import pages_pdf

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        "where doc_id < 40"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs], huge_every=10)
    huge = pdf[pdf["archetype"].str.endswith("+huge")]
    assert len(huge) >= 2
    assert (huge["html"].map(len) > 2_000_000).all()

    pages = spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")
    got = {
        r["url"]: r
        for r in run_extract(
            spark, pages, num_partitions=4, size_lane_bytes=1_000_000
        ).collect()
    }
    assert len(got) == len(pdf)
    # padding is comments only: extraction output identical to the oracle
    for _, row in pdf.iterrows():
        want = extract_article(row["url"], row["html"])
        assert got[row["url"]]["text"] == want["text"], row["url"]
        assert got[row["url"]]["method"] == want["method"]


def test_pre_bucketed_mode_no_exchange_same_output(spark):
    import duckdb
    from newsspark.pages import pages_pdf

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        "where doc_id < 60"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs])
    pages = spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")

    shuffled = {r["url"]: r for r in run_extract(spark, pages, num_partitions=4).collect()}
    bucketed_df = run_extract(spark, pages, pre_bucketed=True)
    bucketed = {r["url"]: r for r in bucketed_df.collect()}
    assert set(shuffled) == set(bucketed)
    for url in shuffled:
        for f in ("title", "text", "date", "method", "error"):
            assert shuffled[url][f] == bucketed[url][f]
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_derive_published_ts_mixed_formats(spark):
    from newsspark.pipeline import derive_published_ts

    rows = [
        ("2026-01-02T10:30:00+09:00",),   # ISO with offset (meta passthrough)
        ("2025-05-13 16:30:00",),          # naver span format
        ("2024-03-04",),                   # bare URL date
        ("2026-13-40",),                   # F3 unvalidated -> NULL, not error
        ("",),                             # unknown -> NULL
        ("Jan 3rd, maybe?",),              # verbatim junk -> NULL
    ]
    df = spark.createDataFrame(rows, "date string").withColumn(
        "ts", derive_published_ts(__import__("pyspark.sql.functions", fromlist=["col"]).col("date"))
    )
    got = [r["ts"] for r in df.collect()]
    assert got[0] is not None and got[1] is not None and got[2] is not None
    assert got[3] is None and got[4] is None and got[5] is None


def test_bucketed_tables_join_without_shuffle(spark):
    """The 100 TB co-location story, demonstrated: two tables bucketed on the
    join key join WITHOUT any Exchange in the physical plan — at scale this
    is the ingest-once/join-many shape (Iceberg bucket(N, url) transform or
    a bucketed Hive table; pre_bucketed extraction relies on the same
    property)."""
    from pyspark.sql import functions as F

    a = spark.range(0, 2000).select(
        F.col("id").alias("url_id"), (F.col("id") % 7).alias("v")
    )
    b = spark.range(0, 2000).select(
        F.col("id").alias("url_id"), (F.col("id") % 13).alias("w")
    )
    spark.sql("DROP TABLE IF EXISTS bjoin_a")
    spark.sql("DROP TABLE IF EXISTS bjoin_b")
    a.write.bucketBy(8, "url_id").sortBy("url_id").saveAsTable("bjoin_a")
    b.write.bucketBy(8, "url_id").sortBy("url_id").saveAsTable("bjoin_b")
    try:
        # disable broadcast so the join strategy must rely on bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bjoin_a").join(spark.table("bjoin_b"), "url_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bjoin_a")
        spark.sql("DROP TABLE IF EXISTS bjoin_b")


def test_extract_run_all_ok_keeps_both_partition_paths_readable(spark, tmp_path):
    """partitionBy only creates directories for statuses that occur; a run
    with zero failures must still leave quarantine_path readable (empty),
    not PATH_NOT_FOUND — and vice versa (code-review r3 finding)."""
    import duckdb
    from newsspark.pages import pages_pdf
    from newsspark.pipeline import extract_run

    # rich_og archetype pages (slot < 30) extract cleanly
    ids = [i for i in range(300) if (i * 2654435761) % 100 < 30][:15]
    docs = dict(
        duckdb.sql(
            "select doc_id, text from "
            "'/root/testdata/sf0.001/documents.parquet' where doc_id < 300"
        ).fetchall()
    )
    pdf = pages_pdf(ids, [docs[i] for i in ids])
    pages = spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")
    out = str(tmp_path / "run_ok")
    summary = extract_run(spark, pages, out, num_partitions=2)
    assert summary["n_failed"] == 0 and summary["n_rows"] == len(ids)
    articles = spark.read.parquet(summary["articles_path"])
    quarantine = spark.read.parquet(summary["quarantine_path"])  # empty, readable
    assert articles.count() == len(ids)
    assert quarantine.count() == 0
    assert quarantine.schema == articles.schema


def test_curate_corpus_every_stage_bites(spark):
    """The composed curation query (cascade -> error filter -> exact dedup
    -> quality flag) must exercise every stage on the golden corpus: 34
    rows error-filtered, one duplicate-text cluster collapsed, one short
    doc flagged for drop.  Pinned so a future engine/threshold change that
    silently disables a stage fails loudly."""
    import __spark_entry__ as entrymod

    out = entrymod._curate_corpus(spark, "unused").toPandas()
    assert len(out) == 466
    assert int((out["n_copies"] > 1).sum()) == 1
    assert int((~out["keep"]).sum()) == 1
    assert (out[~out["keep"]]["n_tokens"] < 128).all()


def test_huge_pages_through_default_single_lane(spark):
    """r6: the size-lane split is off by default (its big-lane branch
    re-scanned the whole source); fat rows are bounded by
    arrow.maxBytesPerBatch instead.  Multi-MB pages must still extract
    identically through the default single-lane path."""
    import duckdb

    from newsspark.engines import extract_article
    from newsspark.pages import pages_pdf

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        "where doc_id < 30"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs], huge_every=10)
    assert (pdf["html"].map(len) > 2_000_000).any()
    pages = spark.createDataFrame(
        pdf[["url", "html"]], "url string, html binary"
    )
    got = {r["url"]: r for r in run_extract(
        spark, pages, num_partitions=4).collect()}
    assert len(got) == len(pdf)
    for _, row in pdf.iterrows():
        want = extract_article(row["url"], row["html"])
        assert got[row["url"]]["text"] == want["text"], row["url"]
        assert got[row["url"]]["method"] == want["method"]
