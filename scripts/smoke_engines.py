"""Dev smoke: run the pure cascade over one generated page per archetype."""
import sys

sys.path.insert(0, "/root/repo")
from collections import Counter

import duckdb

from newsspark.engines import extract_article
from newsspark.pages import archetype_for, build_page

docs = duckdb.sql(
    "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' order by doc_id"
).fetchall()

seen = Counter()
examples = {}
for doc_id, text in docs:
    i = int(doc_id)
    arch = archetype_for(i)
    page = build_page(i, text)
    rec = extract_article(page["url"], page["html"])
    seen[(arch, rec["method"], rec["error"] is not None)] += 1
    if arch not in examples:
        examples[arch] = (page["url"], rec)

for key, n in sorted(seen.items()):
    print(f"{n:4d}  {key}")
print()
for arch, (url, rec) in sorted(examples.items()):
    print("=" * 30, arch, url)
    print(" title:", repr(rec["title"])[:110])
    print(" text :", repr(rec["text"])[:160], f"(len={len(rec['text'])})")
    print(" date :", repr(rec["date"]))
    print(" imgs :", rec["images"])
    print(" meth :", rec["method"], " err:", rec["error"])
