"""Dev smoke: Spark extraction vs pure-Python oracle on sf0.001."""
import sys, time

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd

from newsspark.engines import extract_article
from newsspark.pages import pages_df, pages_pdf
from newsspark.pipeline import run_extract, method_metrics
from newsspark.session import get_spark

spark = get_spark(cores=8)
t0 = time.time()
pages = pages_df(spark, "/root/testdata/sf0.001")
articles = run_extract(spark, pages, num_partitions=16)
result = {r["url"]: r.asDict() for r in articles.collect()}
print(f"spark: {len(result)} rows in {time.time()-t0:.1f}s")

# oracle
docs = duckdb.sql(
    "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' order by doc_id"
).df()
pdf = pages_pdf(docs["doc_id"], docs["text"])
mismatch = 0
for _, row in pdf.iterrows():
    want = extract_article(row["url"], row["html"])
    got = result[row["url"]]
    for f in ("title", "text", "date", "method", "error"):
        if got[f] != want[f]:
            mismatch += 1
            print("MISMATCH", f, row["url"], repr(got[f])[:80], "!=", repr(want[f])[:80])
            break
    else:
        if list(got["images"]) != want["images"]:
            mismatch += 1
            print("MISMATCH images", row["url"], got["images"], want["images"])
print("mismatches:", mismatch)
method_metrics(articles).show(truncate=False)
spark.stop()
