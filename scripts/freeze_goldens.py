"""Freeze golden fixtures: pure-Python cascade output over the tiny corpus.

Run once (and only deliberately re-run when the frozen engine spec changes):
    python scripts/freeze_goldens.py

Writes tests/fixtures/golden/articles.jsonl — one JSON object per url with
ensure_ascii=False, mirroring the reference's response serialization
(main.py:642-644). tests/test_golden.py replays the Spark pipeline against
these bytes.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from newsspark.engines import extract_article
from newsspark.pages import build_page

N_DOCS = 500
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden", "articles.jsonl",
)


def main() -> None:
    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet' "
        f"where doc_id < {N_DOCS} order by doc_id"
    ).fetchall()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for doc_id, text in docs:
            page = build_page(int(doc_id), text)
            rec = extract_article(page["url"], page["html"])
            rec["archetype"] = page["archetype"]
            f.write(json.dumps(rec, ensure_ascii=False, sort_keys=True) + "\n")
    print(f"froze {len(docs)} goldens -> {OUT}")


if __name__ == "__main__":
    main()
