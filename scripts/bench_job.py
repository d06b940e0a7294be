"""Standalone extraction job for the two-parallelism scaling run.

Launched via spark-submit --py-files (north rule):
    spark-submit --master local[N] --py-files newsspark.zip \
        scripts/bench_job.py --cores N --pages <parquet> --out <json>

Times ONLY the extraction job (read cached pages -> repartition -> pandas-UDF
cascade -> aggregate), excluding session startup, and appends one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from newsspark.pipeline import run_extract

    spark = (
        SparkSession.builder.appName(f"newsspark-scaling-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "32m")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.pages)
    n_pages = pages.count()

    walls = []
    for _ in range(args.repeats):
        t0 = time.time()
        out = run_extract(spark, pages, num_partitions=args.cores)
        stats = out.agg(
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("chars"),
        ).collect()[0]
        walls.append(time.time() - t0)
        assert stats["n"] == n_pages
    wall = min(walls)

    record = {
        "cores": args.cores,
        "pages": n_pages,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_pages / wall, 1),
    }
    with open(args.out, "a", encoding="utf-8") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
