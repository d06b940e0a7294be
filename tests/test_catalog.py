"""Catalog seam: parquet fallback behaves table-like; snapshot ids are
content-addressed and change on append."""
from newsspark.catalog import ParquetCatalog, get_catalog


def test_parquet_catalog_roundtrip_and_snapshot(spark, tmp_path):
    cat = ParquetCatalog(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    cat.write(df, "t1")
    back = cat.read(spark, "t1")
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}

    snap1 = cat.snapshot_id("t1")
    assert len(snap1) == 16
    assert cat.snapshot_id("t1") == snap1  # deterministic

    cat.write(df, "t1", mode="append")
    snap2 = cat.snapshot_id("t1")
    assert snap2 != snap1  # append changes the committed file set


def test_get_catalog_falls_back_to_parquet(spark, tmp_path):
    cat = get_catalog(spark, str(tmp_path), catalog="nonexistent_iceberg")
    assert isinstance(cat, ParquetCatalog)
