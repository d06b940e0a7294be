"""r6 isolation benchmarks (guide §1.4): noop-sink per-lane timing plus the
single-core cascade microbench.  bench.py is FROZEN for the driver's
measurement; every extra number cited in OPTIMIZATION_r06.md comes from
here so it can be re-run.

    python bench_extra.py            # all sections
    python bench_extra.py cascade    # just the single-core engine bench

Interleaved best-of-N per lane (the host has minutes-long noisy-neighbor
windows — BENCH/BASELINE.md); one Spark job at a time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def bench_cascade_single_core() -> dict:
    """Pure-Python cascade throughput over real corpus-shaped pages —
    isolates the engines.py/htmlite.py work from all Spark overhead."""
    import duckdb

    from newsspark.engines import extract_article
    from newsspark.pages import pages_pdf

    docs = duckdb.sql(
        f"select doc_id, text from '{SF_DIR}/documents.parquet' "
        "order by doc_id limit 1000"
    ).fetchall()
    pdf = pages_pdf([d for d, _ in docs], [t for _, t in docs], replicas=2)
    urls, htmls = list(pdf["url"]), list(pdf["html"])
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        for u, h in zip(urls, htmls):
            extract_article(u, h)
        best = min(best, time.time() - t0)
    return {
        "pages": len(urls),
        "best_sec": round(best, 3),
        "docs_per_sec_core": round(len(urls) / best, 0),
    }


def bench_lanes() -> dict:
    """Interleaved noop-sink timing of the lanes this round touched."""
    from pyspark.sql import functions as F

    from newsspark import textops
    from newsspark.linkops import (
        crawl_frontier_gated,
        crawl_schedule,
        extract_links_core,
        extract_links_table,
        robots_filter,
        robots_rules_df,
        synth_link_pages,
    )
    from newsspark.pdfops import extract_pdf_table, synth_pdf_table
    from newsspark.pipeline import run_extract
    from newsspark.session import get_spark

    spark = get_spark(app_name="newsspark-bench-extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rules = robots_rules_df(spark)

        def links():
            return extract_links_core(
                synth_link_pages(docs, num_partitions=CPUS)
            )

        pages_cache = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH", ".cache"
        )
        cascade = None
        for name in sorted(os.listdir(pages_cache)) if os.path.isdir(
            pages_cache
        ) else []:
            if name.startswith(f"pages_{os.path.basename(SF_DIR)}_"):
                cascade = os.path.join(pages_cache, name)
        lanes = {
            "links_core": lambda: links(),
            "extract_links": lambda: extract_links_table(
                synth_link_pages(docs, num_partitions=CPUS)
            ),
            "robots_filter": lambda: robots_filter(links(), rules),
            "crawl_frontier_gated": lambda: crawl_frontier_gated(
                links(), rules
            ),
            "crawl_schedule": lambda: crawl_schedule(links(), rules),
            "dedup_substring_spans": lambda: textops.dedup_substring_spans(
                docs
            ),
            "dedup_substring_spans_guarded":
                lambda: textops.dedup_substring_spans(
                    docs, pre_dedup_exact=True
                ),
            "pdf_extract": lambda: extract_pdf_table(
                synth_pdf_table(docs, num_partitions=CPUS)
            ),
        }
        if cascade is not None:
            pages = spark.read.parquet(cascade)

            def cascade_lane():
                return run_extract(spark, pages, num_partitions=CPUS).select(
                    "url", "title", F.length("text").alias("n"), "error"
                )

            lanes["extract_cascade_w32"] = cascade_lane

        def run(df):
            df.write.format("noop").mode("overwrite").save()

        for make in lanes.values():  # warmup: codegen/JIT
            run(make())
        best = {k: float("inf") for k in lanes}
        for _ in range(4):
            for k, make in lanes.items():
                spark.sparkContext.setJobDescription(f"bench_extra:{k}")
                t0 = time.time()
                run(make())
                best[k] = min(best[k], round(time.time() - t0, 3))
        return best
    finally:
        spark.stop()


def main() -> None:
    only = sys.argv[1] if len(sys.argv) > 1 else None
    out: dict = {}
    if only in (None, "cascade"):
        out["cascade_single_core"] = bench_cascade_single_core()
    if only in (None, "lanes"):
        out["lanes_noop_best"] = bench_lanes()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
