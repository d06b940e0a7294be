"""Per-round benchmark harness.

Runs the headline extraction job plus representative operator queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

The pages corpus (Common-Crawl-style, FIXTURES.md §1) is synthesized
deterministically from documents.parquet and cached as parquet under
BENCH/.cache so the bench times the extraction job, not the generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BENCH", ".cache")

# pages per document: sf0.1 has 5k docs -> 200k pages
REPLICAS = int(os.environ.get("NEWSSPARK_BENCH_REPLICAS", "40"))


def _sf_tag() -> str:
    return os.path.basename(SF_DIR.rstrip("/")) or "sf"


def _quiesce_stop(spark) -> None:
    """Cancel stragglers and let Python-accumulator heartbeats drain before
    tearing the session down: stopping the w32 JVM mid-heartbeat printed a
    PythonAccumulatorV2.merge socket stack trace into the r2 bench tail —
    benign (rc=0, timings parsed) but a polluted tail eventually masks a
    real failure (VERDICT r2 #6)."""
    try:
        spark.sparkContext.cancelAllJobs()
        time.sleep(1.0)
    except Exception:
        pass
    spark.stop()
    time.sleep(0.5)


def _w8_subprocess(pages_path: str, repeats: int = 2, cores: int = 8) -> float:
    """Run the width-8 extraction lane in its own spark-submit JVM via
    run_scaling's build_zip/run_one — ONE copy of the launch recipe, so the
    bench's w8 number stays comparable to the scaling evidence by
    construction — and return the best wall seconds."""
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_scaling

    zpath = run_scaling.build_zip()
    with tempfile.NamedTemporaryFile(suffix=".jsonl", mode="r") as out:
        rec = run_scaling.run_one(cores, pages_path, zpath, out.name, repeats)
    return float(rec["wall_sec"])


def ensure_pages(spark) -> str:
    from newsspark.pages import CORPUS_VERSION, pages_df

    path = os.path.join(
        CACHE, f"pages_{_sf_tag()}_r{REPLICAS}_v{CORPUS_VERSION}.parquet"
    )
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        pages_df(spark, SF_DIR, replicas=REPLICAS).repartition(128).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> None:
    from newsspark import textops
    from newsspark.contract_sql import SPARK_SQL
    from newsspark.pipeline import run_extract
    from newsspark.session import get_spark

    spark = get_spark(app_name="newsspark-bench", cores=CPUS,
                      shuffle_partitions=CPUS)
    try:
        pages_path = ensure_pages(spark)
        timings: dict = {}

        # headline: full extraction cascade over the cached pages table
        pages = spark.read.parquet(pages_path)
        n_pages = pages.count()
        best = float("inf")
        for _ in range(3):  # best-of-3: the host has noisy-neighbor windows
            # (minutes-long 2x swings — a third trial materially cuts the
            # odds every trial lands in a slow window)
            t0 = time.time()
            out = run_extract(spark, pages, num_partitions=CPUS)
            # aggregate over every output field so the UDF cannot be pruned
            stats = out.agg(
                F.count("*").alias("n"),
                F.sum(F.length("text")).alias("chars"),
                F.sum(F.size("images")).alias("imgs"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("err"),
            ).collect()[0]
            best = min(best, time.time() - t0)
            assert stats["n"] == n_pages
        timings["extract_cascade"] = round(best, 3)

        # phase barrier: the 200k-page extract leaves the 24g heap full of
        # garbage, and without an explicit collection the next several
        # operator lanes pay its GC debt instead of measuring themselves
        # (measured: simhash64 8-12s dirty vs 1.2-1.6s after gc+settle)
        spark._jvm.System.gc()
        time.sleep(5)

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

        # untimed warmup: the first textops job in a fresh JVM pays codegen
        # JIT + scheduler spin-up (~5-15s observed — r1 recorded 16.7s for a
        # ~1s warm dedup_minhash_lsh); operator timings should time operators
        textops.dedup_minhash_lsh(docs.limit(500)).write.format("noop").mode(
            "overwrite"
        ).save()

        def timed(name, make_df):
            # take a THUNK: ann_ivf_topk trains its k-means eagerly at
            # construction time (collect per Lloyd iteration), which must be
            # inside the timed region
            t = time.time()
            make_df().write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t, 3)

        # guarded lanes = production defaults (pre_dedup_exact + max_bucket,
        # the r3 semantics upgrade); the *_unguarded twins keep the r1/r2
        # lane semantics so cross-round regressions stay visible instead of
        # conflating the guard cost with drift (VERDICT r3 #2) — unguarded
        # lanes are excluded from the headline total like the r3 lanes
        timed("dedup_minhash_lsh", lambda: textops.dedup_minhash_lsh(docs))
        timed("dedup_minhash_lsh_unguarded", lambda: textops.dedup_minhash_lsh(
            docs, pre_dedup_exact=False, max_bucket=None))
        timed("simhash64", lambda: textops.simhash64(docs))
        timed("dedup_pipeline", lambda: textops.dedup_pipeline(docs))
        timed("dedup_pipeline_unguarded", lambda: textops.dedup_pipeline(
            docs, pre_dedup_exact=False, max_bucket=None))
        timed("ann_bruteforce_topk", lambda: textops.ann_bruteforce_topk(emb))
        timed("ann_lsh_topk", lambda: textops.ann_lsh_topk(emb))
        # the FAISS phases reported separately (train once, index once,
        # search per query batch): mixing them hid the actual search cost
        t0 = time.time()
        ivf_model = textops.ivf_train(emb)
        timings["ann_ivf_train"] = round(time.time() - t0, 3)
        t0 = time.time()
        ivf_idx = textops.ivf_index(emb, ivf_model).persist()
        ivf_idx.count()
        timings["ann_ivf_index"] = round(time.time() - t0, 3)
        timed("ann_ivf_topk", lambda: textops.ann_ivf_topk(
            emb, model=ivf_model, index=ivf_idx))
        ivf_idx.unpersist()
        timed("quality_score", lambda: textops.quality_score(docs))
        timed("dedup_exact", lambda: textops.dedup_exact(docs))

        # second phase barrier: the dedup/ANN block above (now including the
        # two unguarded lanes) leaves enough heap garbage to poison the
        # late lanes — r4 observed pdf_extract at 15.6s inside a full bench
        # run vs 0.7-3.0s isolated, the same GC-debt pattern as the r3
        # extract barrier
        spark._jvm.System.gc()
        time.sleep(5)

        # round-3 lanes (EXCLUDED from the headline total so 'value' stays
        # comparable with earlier recorded rounds; per-lane numbers in
        # 'queries' are the signal)
        from newsspark.contract_sql import _LINED_SPARK
        from newsspark.pdfops import extract_pdf_table, synth_pdf_table

        lined = docs.selectExpr("doc_id", f"{_LINED_SPARK} AS text")
        timed("dedup_lines", lambda: textops.dedup_lines(lined))
        # round-5 lane (excluded from the headline total; production
        # xxhash64 builder — the dedup-lane convention)
        timed("dedup_substring_spans",
              lambda: textops.dedup_substring_spans(docs))
        timed(
            "pdf_extract",
            lambda: extract_pdf_table(
                synth_pdf_table(docs, num_partitions=CPUS)
            ),
        )

        # round-4 lanes (also excluded from the headline total)
        from newsspark.linkops import extract_links_table, synth_link_pages

        timed("pack_sequences", lambda: textops.pack_sequences(docs))
        timed("dedup_simhash_pairs",
              lambda: textops.dedup_simhash_pairs(docs))
        timed("extract_links", lambda: extract_links_table(
            synth_link_pages(docs, num_partitions=CPUS)))
        from newsspark.linkops import (
            crawl_frontier_gated,
            extract_links_core,
            robots_filter,
            robots_rules_df,
        )

        # composed over the UNSORTED links core (the r5 composition form)
        timed("robots_filter", lambda: robots_filter(
            extract_links_core(synth_link_pages(docs, num_partitions=CPUS)),
            robots_rules_df(spark)))
        timed("crawl_frontier_gated", lambda: crawl_frontier_gated(
            extract_links_core(synth_link_pages(docs, num_partitions=CPUS)),
            robots_rules_df(spark)))

        import __spark_entry__ as entrymod

        entrymod._views(spark, SF_DIR)
        for name in ("tpch_pricing_summary", "join_orders_by_nation",
                     "events_hourly"):
            timed(name, lambda n=name: spark.sql(SPARK_SQL[n]))

        # second width: extract docs/s at local[8], so width regressions show
        # up per-round without a full run_scaling.py pass (the host stops
        # scaling past ~8 busy workers — BENCH/BASELINE.md).  Runs as a
        # spark-submit --py-files SUBPROCESS (scripts/bench_job.py — the
        # same job run_scaling.py launches; the north-rule launch shape):
        # a second in-process session shared the JVM with the stopped w32
        # context, and its task completions spammed dead-accumulator ERROR
        # traces into the bench tail (r2/r3 artifact noise).
        _quiesce_stop(spark)
        timings["extract_cascade_w8"] = _w8_subprocess(pages_path, repeats=2)

        # headline total excludes the w8 lane (extra measurement work added
        # in round 2) and the round-3 op lanes — keeping the lane set of
        # 'value' fixed preserves comparability across recorded rounds
        excluded = {"extract_cascade_w8", "dedup_lines", "pdf_extract",
                    "dedup_minhash_lsh_unguarded", "dedup_pipeline_unguarded",
                    "pack_sequences", "dedup_simhash_pairs", "extract_links",
                    "robots_filter", "crawl_frontier_gated",
                    "dedup_substring_spans"}
        total = round(
            sum(v for k, v in timings.items() if k not in excluded), 3
        )
        print(
            json.dumps(
                {
                    "metric": "newsspark_bench_total",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": _sf_tag(),
                    "pages": n_pages,
                    "docs_per_sec": round(n_pages / timings["extract_cascade"], 1),
                    "docs_per_sec_w8": round(
                        n_pages / timings["extract_cascade_w8"], 1
                    ),
                    "cores": CPUS,
                    "extract_failed_rows": int(stats["err"] or 0),
                }
            )
        )
    finally:
        _quiesce_stop(spark)


if __name__ == "__main__":
    main()
