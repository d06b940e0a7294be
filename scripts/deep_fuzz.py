"""Deep cross-engine fuzz soak: the same strategies and comparator as
tests/test_cross_engine_fuzz.py, run for many more examples than the
CI-budgeted suite — a mining pass for parity holes (this class of run is
what found the 1-ulp ln ntile flip and the Unicode-table tokenizer
boundary).

    python scripts/deep_fuzz.py [examples_per_suite]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from hypothesis import HealthCheck, given, settings  # noqa: E402

import test_cross_engine_fuzz as fuzz  # noqa: E402
from newsspark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    spark = get_spark(app_name="deep-fuzz", cores=8, shuffle_partitions=8)

    @settings(max_examples=n, deadline=None, database=None,
              suppress_health_check=list(HealthCheck))
    @given(pdf=fuzz._corpus())
    def run_docs(pdf):
        fuzz._compare(spark, pdf, fuzz.FUZZ_QUERIES)

    @settings(max_examples=n, deadline=None, database=None,
              suppress_health_check=list(HealthCheck))
    @given(pdf=fuzz._events_corpus())
    def run_events(pdf):
        fuzz._compare_events(spark, pdf, fuzz.EVENTS_FUZZ_QUERIES)

    # embeddings examples cost ~8s each (five literal-heavy ANN plans per
    # example), so the suite soaks at a quarter of the docs/events budget
    n_emb = max(5, n // 4)

    @settings(max_examples=n_emb, deadline=None, database=None,
              suppress_health_check=list(HealthCheck))
    @given(X=fuzz._emb_corpus())
    def run_emb(X):
        fuzz._compare_emb(spark, X, fuzz.EMB_FUZZ_QUERIES)

    print(f"docs suite: {n} examples x {len(fuzz.FUZZ_QUERIES)} queries")
    run_docs()
    print("docs suite: OK")
    print(f"events suite: {n} examples x {len(fuzz.EVENTS_FUZZ_QUERIES)} queries")
    run_events()
    print("events suite: OK")
    print(f"emb suite: {n_emb} examples x {len(fuzz.EMB_FUZZ_QUERIES)} queries")
    run_emb()
    print("emb suite: OK")

    @settings(max_examples=n_emb, deadline=None, database=None,
              suppress_health_check=list(HealthCheck))
    @given(pdf=fuzz._hash_corpus())
    def run_hash(pdf):
        fuzz._compare_docs_entries(spark, pdf, fuzz.HASH_FUZZ_QUERIES)

    print(f"hash suite: {n_emb} examples x {len(fuzz.HASH_FUZZ_QUERIES)} queries")
    run_hash()
    print("hash suite: OK")

    @settings(max_examples=n_emb, deadline=None, database=None,
              suppress_health_check=list(HealthCheck))
    @given(pdf=fuzz._link_corpus())
    def run_links(pdf):
        fuzz._compare_docs_entries(spark, pdf, fuzz.LINK_FUZZ_QUERIES)

    print(f"link suite: {n_emb} examples x {len(fuzz.LINK_FUZZ_QUERIES)} queries")
    run_links()
    print("link suite: OK")
    spark.stop()


if __name__ == "__main__":
    main()
