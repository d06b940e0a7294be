"""Freeze compression_ratio's (doc_id, n_chars, comp_len) over sf0.001 documents to
tests/fixtures/golden/compression.jsonl — the DuckDB oracle for the
compression_ratio driver query recomputes n_chars/ratio from the documents
table and replays it all from here (DuckDB has no zlib; the fixture is self-contained because the driver's documents view runs at a different sf than the pinned sf0.001 input).  A pytest pins the
live mapInPandas output to the fixture.

Re-run ONLY when the compression spec (zlib level, encoding) deliberately
moves or the zlib build changes, and say so in the commit message.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden", "compression.jsonl",
)


def main() -> None:
    from newsspark.session import get_spark
    from newsspark.textops import compression_ratio

    spark = get_spark(app_name="freeze-compression", cores=8,
                      shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = compression_ratio(docs).orderBy("doc_id").collect()
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "n_chars": r["n_chars"],
                                "comp_len": r["comp_len"]}) + "\n")
    print(f"froze {len(rows)} rows -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
