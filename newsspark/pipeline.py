"""Spark pipeline: the vectorized extraction job + scale machinery.

Design (SURVEY.md §3.2/§4.2):
- ONE vectorized pandas UDF (Arrow-batched, no per-row Python dispatch at the
  Spark level) wraps the pure cascade from ``newsspark.engines``:
  decode -> stage1 -> gate -> stage2 -> gate -> stage3 -> merge.
- Explicit ``repartition(n, xxhash64(url))`` before the UDF so load is uniform
  regardless of input file layout (north-rule requirement).
- Size lane: documents above a byte threshold are routed to a dedicated lane
  with more partitions so one 20 MB page never stalls a batch
  (SURVEY.md §4.2 skew handling).
- Checkpoint/lineage: ``run_with_checkpoint`` processes url-hash buckets,
  appends one lineage row per completed bucket, and on restart anti-joins the
  completed buckets out of the scan — failed runs resume without recompute.

The job is DataFrame end-to-end; the UDF is the single Python island.
"""

from __future__ import annotations

import time
import uuid
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .engines import extract_article

ARTICLE_FIELDS = ("title", "text", "date", "images", "method", "error")

ARTICLE_STRUCT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("images", T.ArrayType(T.StringType())),
        T.StructField("method", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

ARTICLES_SCHEMA = T.StructType(
    [T.StructField("url", T.StringType())] + list(ARTICLE_STRUCT.fields)
)


def _extract_batch(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    """Arrow batch -> article records. The per-document tree parse is
    inherently per-document; vectorization = batching documents per Arrow
    chunk (SURVEY.md §4.2)."""
    records = [extract_article(u, h) for u, h in zip(url, html)]
    return pd.DataFrame(
        {f: [r[f] for r in records] for f in ARTICLE_FIELDS}
    )


extract_articles = F.pandas_udf(_extract_batch, returnType=ARTICLE_STRUCT)


def _extract_batch_with_rules(
    url: pd.Series, html: pd.Series, body_sel: pd.Series, title_sel: pd.Series
) -> pd.DataFrame:
    """Variant fed by the site-rules broadcast join: per-row rule columns
    (null when no rule matched) instead of the static default table."""
    records = []
    for u, h, bs, ts in zip(url, html, body_sel, title_sel):
        rules = (("", bs, ts or "h1"),) if isinstance(bs, str) and bs else ()
        records.append(extract_article(u, h, site_rules=rules))
    return pd.DataFrame({f: [r[f] for r in records] for f in ARTICLE_FIELDS})


extract_articles_with_rules = F.pandas_udf(
    _extract_batch_with_rules, returnType=ARTICLE_STRUCT
)


def default_site_rules_df(spark: SparkSession) -> DataFrame:
    """The site-rules dimension table (FIXTURES.md §4), seeded with the naver
    row the reference hard-codes (extractor.py:472-474)."""
    from .engines import DEFAULT_SITE_RULES

    return spark.createDataFrame(
        [(h, b, t) for h, b, t in DEFAULT_SITE_RULES],
        "host_pattern string, body_selector string, title_selector string",
    )


def run_extract(
    spark: SparkSession,
    pages: DataFrame,
    num_partitions: Optional[int] = None,
    size_lane_bytes: Optional[int] = None,
    site_rules: Optional[DataFrame] = None,
    pre_bucketed: bool = False,
) -> DataFrame:
    """pages(url, html, ...) -> articles(url, title, text, date, images,
    method, error).  Only (url, html) are referenced so Catalyst prunes every
    other column at the scan (SURVEY.md §4.2 column pruning).

    ``site_rules``: optional dimension table (host_pattern, body_selector,
    title_selector) — the F2 generalization.  The FIRST matching rule wins,
    like the reference's in-order rule scan (extractor.py:472-482); match
    order is most-specific-pattern-first (longest host_pattern, ties on the
    pattern text), so 'news.naver.com' beats 'naver.com'.  Implemented as a
    map-only first-match over the collected rule list (config-sized, the
    same driver-side-model shape as a broadcast) rather than a containment
    join: a url matching two rules must NOT be duplicated, and a broadcast
    nested-loop join evaluates every (row, rule) pair anyway — this shape
    does the same work with zero join and no dup risk.

    ``pre_bucketed``: skip the explicit url-hash exchange and trust the
    input's own partitioning.  Use when the pages table is ALREADY stored
    bucketed by url hash (Iceberg ``bucket(N, url)`` partition transform or
    an equivalent bucketed write): at 100 TB the shuffle is the single
    largest fixed cost of a rerun, and a bucketed table pays it once at
    ingest instead of on every extraction run.  Row-level output is
    identical either way (the UDF is row-wise); only load balance and the
    resume bucketing rely on the hash, and a bucketed table provides both."""
    n = num_partitions or max(spark.sparkContext.defaultParallelism * 2, 8)

    if site_rules is not None:
        rule_rows = sorted(
            site_rules.select(
                "host_pattern", "body_selector", "title_selector"
            ).collect(),
            key=lambda r: (-len(r["host_pattern"] or ""), r["host_pattern"] or ""),
        )
        if not rule_rows:  # empty dim table: no rule ever matches
            rule_rows = [
                {"host_pattern": "\x00never", "body_selector": "",
                 "title_selector": ""}
            ]
        rules_arr = F.array(
            *[
                F.struct(
                    F.lit(r["host_pattern"]).alias("hp"),
                    F.lit(r["body_selector"]).alias("bs"),
                    F.lit(r["title_selector"]).alias("ts"),
                )
                for r in rule_rows
            ]
        )
        # F.get (0-based) returns NULL for no-match; element_at would throw
        # under ANSI mode
        first_rule = F.get(
            F.filter(rules_arr, lambda s: F.col("url").contains(s["hp"])),
            0,
        )
        df = pages.select(
            "url",
            "html",
            first_rule["bs"].alias("body_selector"),
            first_rule["ts"].alias("title_selector"),
        )

        def lane(part: DataFrame, parts: int) -> DataFrame:
            if not pre_bucketed:
                part = part.repartition(parts, F.xxhash64("url"))
            return (
                part.withColumn(
                    "a",
                    extract_articles_with_rules(
                        F.col("url"), F.col("html"),
                        F.col("body_selector"), F.col("title_selector"),
                    ),
                )
                .select("url", "a.*")
            )

    else:
        df = pages.select("url", "html")

        def lane(part: DataFrame, parts: int) -> DataFrame:
            if not pre_bucketed:
                part = part.repartition(parts, F.xxhash64("url"))
            return (
                part.withColumn("a", extract_articles(F.col("url"), F.col("html")))
                .select("url", "a.*")
            )

    if size_lane_bytes:
        # Size-lane split: oversized documents get their own, finer-grained
        # lane so Arrow batches stay bounded and stragglers don't serialize
        # a whole partition behind one huge page.
        # r6: OFF by default.  The split's only plan-level effect is routing
        # rows through a second filter+exchange+UDF branch, and since both
        # branches re-SCAN the pages source, the big-lane pass re-reads and
        # re-decodes every html payload even when zero rows qualify —
        # measured 4.75s vs 3.42s (interleaved best-of-4, 200k pages, w32)
        # purely from the duplicate scan.  Batch memory is now bounded
        # directly by spark.sql.execution.arrow.maxBytesPerBatch (set in
        # newsspark.session — the Spark 4 knob that caps batch BYTES, which
        # is what the lane split approximated with a row-size predicate).
        # Pass size_lane_bytes explicitly to re-enable the split; row-level
        # output is identical either way (the UDF is row-wise; pinned by
        # test_huge_pages_route_through_size_lane_identically).
        # coalesce: NULL html must not fall through both lanes
        is_big = F.coalesce(
            F.length("html") > F.lit(int(size_lane_bytes)), F.lit(False)
        )
        small = lane(df.where(~is_big), n)
        big = lane(df.where(is_big), n)
        return small.unionByName(big)
    return lane(df, n)


def method_metrics(articles: DataFrame) -> DataFrame:
    """Run metrics: per-method row counts and text mass — the batch analog of
    the reference's per-request prints (SURVEY.md §2 J)."""
    return (
        articles.groupBy("method")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_failed"),
            F.sum(F.length("text")).alias("text_chars"),
        )
        .orderBy("method")
    )


def derive_published_ts(date_col):
    """Derived TIMESTAMP from the reference's mixed-format ``date`` string
    (SURVEY.md §1.4: the raw string column is the contract; this column is
    additive).  Handles the three formats the cascade emits — ISO-8601 with
    offset, 'YYYY-MM-DD HH:mm:ss' (naver span), bare 'YYYY-MM-DD' — and is
    NULL for empty/unparseable values (F3's unvalidated month/day included)."""
    cleaned = F.nullif(F.trim(date_col), F.lit(""))
    return F.coalesce(
        F.try_to_timestamp(cleaned),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(F.substring(cleaned, 1, 10), F.lit("yyyy-MM-dd")),
    )


def extract_run(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: Optional[str] = None,
    num_partitions: Optional[int] = None,
    site_rules: Optional[DataFrame] = None,
    snapshot_id: str = "",
) -> dict:
    """The one-call replacement for the reference's HTTP endpoints
    (SURVEY.md §3.2): pages in -> three tables out under ``out_dir``:

      extracted/   ALL rows, written ONCE, partitioned by ``status``
                   (``status=ok`` = successful articles, ``status=failed`` =
                   the quarantine / HTTP-500 analog); read a partition
                   subdirectory directly to get just that slice
      metrics/     per-method row counts / failure counts / text mass
      lineage/     one row for this run (run_id, snapshot, counts, wall_ms)

    The extracted rows are written exactly once (VERDICT r2: the previous
    _all + filtered-rewrite layout wrote the dominant artifact 3x — at
    100 TB that is 2x redundant write I/O); partition pruning on ``status``
    gives consumers the same articles/quarantine split for free.  Run totals
    come from the (tiny) collected metrics table, not a second full-data
    aggregation.  ``snapshot_id`` defaults to the ParquetCatalog
    content-address of the committed dataset so lineage always records a
    real, verifiable snapshot (the Iceberg-snapshot analog).

    Returns a summary dict including the articles/quarantine paths."""
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.time()
    result = run_extract(
        spark, pages, num_partitions=num_partitions, site_rules=site_rules
    )
    result = result.withColumn("published_ts", derive_published_ts(F.col("date")))
    result = result.withColumn(
        "status", F.when(F.col("error").isNull(), "ok").otherwise("failed")
    )
    # run totals ride along on the write itself (Observation) — no second
    # full-data job; partitionBy only creates directories for statuses that
    # occur, so afterwards any MISSING status gets an empty (but real,
    # schema-bearing) parquet dir: both summary paths are always readable,
    # including all-ok, all-failed, and empty-input runs
    from pyspark.sql import Observation

    obs = Observation(f"extract_run_{run_id}")
    observed = result.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("f"),
    )
    observed.write.mode("overwrite").partitionBy("status").parquet(
        f"{out_dir}/extracted"
    )
    stats = obs.get
    n = int(stats["n"] or 0)
    f = int(stats["f"] or 0)
    data_schema = result.drop("status").schema
    for status, present in (("ok", n - f > 0), ("failed", f > 0)):
        if not present:
            spark.createDataFrame([], data_schema).repartition(1).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/extracted/status={status}")
    extracted = spark.read.parquet(f"{out_dir}/extracted")
    metric_rows = method_metrics(extracted).collect()
    spark.createDataFrame(
        metric_rows, "method string, n_rows long, n_failed long, text_chars long"
    ).write.mode("overwrite").parquet(f"{out_dir}/metrics")
    if not snapshot_id:
        from .catalog import ParquetCatalog

        try:
            snapshot_id = ParquetCatalog(out_dir).snapshot_id("extracted")
        except NotImplementedError:
            # non-local out_dir: no default content-address; callers on a
            # cluster pass the input table's (Iceberg) snapshot explicitly
            snapshot_id = ""
    wall_ms = int((time.time() - t0) * 1000)
    # bucket/n_buckets are NULL for the unbucketed whole-table run: a 0
    # sentinel would trip completed_buckets' n_buckets consistency check if
    # this lineage dir were ever reused by run_with_checkpoint (ADVICE r2)
    lineage_row = [
        (run_id, None, None, snapshot_id, n, f, wall_ms, "ok")
    ]
    spark.createDataFrame(lineage_row, LINEAGE_SCHEMA).write.mode(
        "append"
    ).parquet(f"{out_dir}/lineage")
    return {
        "run_id": run_id,
        "n_rows": n,
        "n_failed": f,
        "wall_ms": wall_ms,
        "snapshot_id": snapshot_id,
        "articles_path": f"{out_dir}/extracted/status=ok",
        "quarantine_path": f"{out_dir}/extracted/status=failed",
    }


# ---------------------------------------------------------------------------
# Checkpoint / lineage / resume (SURVEY.md §4.2)
# ---------------------------------------------------------------------------

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("snapshot_id", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_failed", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


class SimulatedFailure(RuntimeError):
    """Raised by run_with_checkpoint(fail_after_buckets=...) in tests."""


def completed_buckets(
    spark: SparkSession, lineage_dir: str, n_buckets: Optional[int] = None
) -> set:
    """Buckets already marked ok.  When ``n_buckets`` is given, a lineage
    written under a DIFFERENT bucket count is a hard error: bucket ids only
    identify hash ranges relative to their n_buckets, so resuming with a new
    count would silently skip wrong ranges (missing + duplicated urls)."""
    try:
        rows = (
            spark.read.schema(LINEAGE_SCHEMA)
            .parquet(lineage_dir)
            .where(F.col("status") == "ok")
            .select("bucket", "n_buckets")
            .distinct()
            .collect()
        )
    except Exception:
        return set()
    if n_buckets is not None:
        seen = {r["n_buckets"] for r in rows} - {None}
        if seen and seen != {n_buckets}:
            raise ValueError(
                f"lineage at {lineage_dir} was written with n_buckets="
                f"{sorted(seen)}, resume requested n_buckets={n_buckets}; "
                "restart clean or reuse the original bucket count"
            )
    return {r["bucket"] for r in rows}


def run_with_checkpoint(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    lineage_dir: str,
    n_buckets: int = 8,
    num_partitions: Optional[int] = None,
    snapshot_id: str = "",
    fail_after_buckets: Optional[int] = None,
) -> str:
    """Resumable extraction: url-hash buckets are units of commit.

    Each bucket's output is written to ``out_dir/bucket=<b>`` (idempotent
    overwrite) and acknowledged by one appended lineage row; a restart skips
    every bucket already marked ok.  On a real cluster the bucket loop is N
    independent jobs whose scans prune to one hash range each — the same
    anti-join-the-done-work shape works against Iceberg snapshot ids.

    Each lineage row records a real ``snapshot_id``: the caller's (e.g. the
    Iceberg snapshot of the INPUT pages table this run reads), or — when not
    given — the ParquetCatalog content-address of the bucket's committed
    output, so an acknowledged bucket is verifiable against what is actually
    on disk.
    """
    from .catalog import ParquetCatalog

    run_id = uuid.uuid4().hex[:12]
    cat = ParquetCatalog(out_dir)
    done = completed_buckets(spark, lineage_dir, n_buckets=n_buckets)
    bucket_col = F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    pages_b = pages.withColumn("__bucket", bucket_col)
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = pages_b.where(F.col("__bucket") == b).drop("__bucket")
        articles = run_extract(spark, part, num_partitions=num_partitions)
        articles.write.mode("overwrite").parquet(f"{out_dir}/bucket={b}")
        stats = spark.read.parquet(f"{out_dir}/bucket={b}").agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("f"),
        ).collect()[0]
        wall_ms = int((time.time() - t0) * 1000)
        if snapshot_id:
            bucket_snap = snapshot_id
        else:
            try:
                bucket_snap = cat.snapshot_id(f"bucket={b}")
            except NotImplementedError:
                bucket_snap = ""  # non-local out_dir: pass one explicitly
        row = [(run_id, b, n_buckets, bucket_snap, int(stats["n"]),
                int(stats["f"] or 0), wall_ms, "ok")]
        spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            lineage_dir
        )
        processed += 1
        if fail_after_buckets is not None and processed >= fail_after_buckets:
            raise SimulatedFailure(f"injected failure after {processed} buckets")
    return run_id
