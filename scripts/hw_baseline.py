"""Raw-hardware extraction baseline: pure Python multiprocessing, no Spark.

Measures what this box's cores can do on the same per-document work, so
BENCH/BASELINE.md can separate Spark overhead from hardware contention
(this sandbox's cores stop scaling linearly past ~8 workers — turbo/membw).
"""
import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")


def work(args):
    lo, hi = args
    import duckdb

    from newsspark.engines import extract_article
    from newsspark.pages import build_page

    docs = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.1/documents.parquet'"
    ).fetchall()
    for i in range(lo, hi):
        _, t = docs[i % len(docs)]
        p = build_page(i, t)
        extract_article(p["url"], p["html"])
    return hi - lo


def measure(nproc: int, total: int = 24000, repeats: int = 2) -> dict:
    chunks = [(k * total // nproc, (k + 1) * total // nproc) for k in range(nproc)]
    best = float("inf")
    with mp.Pool(nproc) as pool:
        pool.map(work, [(0, 1)] * nproc)  # warm imports
        for _ in range(repeats):
            t0 = time.time()
            pool.map(work, chunks)
            best = min(best, time.time() - t0)
    return {"nproc": nproc, "docs_per_sec": round(total / best, 1),
            "wall_sec": round(best, 2)}


if __name__ == "__main__":
    out = [measure(int(a)) for a in sys.argv[1:]] or [measure(8), measure(32)]
    print(json.dumps(out))
