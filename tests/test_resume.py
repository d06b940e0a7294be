"""Kill-and-resume: a failed run recomputes only unfinished buckets and the
final output is identical to a clean full run (SURVEY.md §5.2 layer 6)."""
import pytest

from newsspark.pages import pages_pdf
from newsspark.pipeline import (
    SimulatedFailure,
    completed_buckets,
    run_with_checkpoint,
)


def _pages(spark, tiny_docs, n=120):
    pdf = pages_pdf([d for d, _ in tiny_docs[:n]], [t for _, t in tiny_docs[:n]])
    return spark.createDataFrame(pdf[["url", "html"]], "url string, html binary")


def test_kill_and_resume_identical_output(spark, tiny_docs, tmp_path):
    pages = _pages(spark, tiny_docs)
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")
    full_lineage = str(tmp_path / "lineage_full")
    part_lineage = str(tmp_path / "lineage_part")

    run_with_checkpoint(spark, pages, full_dir, full_lineage, n_buckets=4,
                        num_partitions=4)

    with pytest.raises(SimulatedFailure):
        run_with_checkpoint(spark, pages, part_dir, part_lineage, n_buckets=4,
                            num_partitions=4, fail_after_buckets=2)
    done_mid = completed_buckets(spark, part_lineage)
    assert len(done_mid) == 2

    # resume: finishes only the remaining buckets
    run_with_checkpoint(spark, pages, part_dir, part_lineage, n_buckets=4,
                        num_partitions=4)
    done_after = completed_buckets(spark, part_lineage)
    assert done_after == {0, 1, 2, 3}

    full = {r["url"]: r for r in spark.read.parquet(full_dir).collect()}
    resumed = {r["url"]: r for r in spark.read.parquet(part_dir).collect()}
    assert set(full) == set(resumed)
    for url in full:
        a, b = full[url], resumed[url]
        for f in ("title", "text", "date", "method", "error"):
            assert a[f] == b[f], (url, f)
        assert list(a["images"] or []) == list(b["images"] or []), url

    # the resume run wrote lineage rows only for the 2 missing buckets
    lineage = spark.read.parquet(part_lineage).collect()
    assert len(lineage) == 4
    assert len({r["run_id"] for r in lineage}) == 2  # two distinct runs
    # every acknowledged bucket carries a real snapshot: the ParquetCatalog
    # content-address of its committed output (VERDICT r2 #8)
    from newsspark.catalog import ParquetCatalog

    cat = ParquetCatalog(part_dir)
    for r in lineage:
        assert r["snapshot_id"] == cat.snapshot_id(f"bucket={r['bucket']}") != ""


def test_resume_with_different_n_buckets_is_refused(spark, tiny_docs, tmp_path):
    """Bucket ids are only meaningful relative to their n_buckets: resuming
    under a different count would silently skip wrong hash ranges."""
    pages = _pages(spark, tiny_docs)
    out_dir = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")
    with pytest.raises(SimulatedFailure):
        run_with_checkpoint(spark, pages, out_dir, lineage, n_buckets=4,
                            num_partitions=4, fail_after_buckets=2)
    with pytest.raises(ValueError, match="n_buckets"):
        run_with_checkpoint(spark, pages, out_dir, lineage, n_buckets=8,
                            num_partitions=4)
    # the original count still resumes cleanly
    run_with_checkpoint(spark, pages, out_dir, lineage, n_buckets=4,
                        num_partitions=4)
    assert completed_buckets(spark, lineage, n_buckets=4) == {0, 1, 2, 3}
