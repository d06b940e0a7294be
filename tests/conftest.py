import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from newsspark.session import get_spark

    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    session = get_spark(
        app_name="newsspark-tests", cores=4, shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def tiny_docs():
    """(doc_id, text) pairs backing the golden corpus."""
    import duckdb

    return duckdb.sql(
        f"select doc_id, text from '{SF_TINY}/documents.parquet' "
        "where doc_id < 500 order by doc_id"
    ).fetchall()


@pytest.fixture(scope="session")
def goldens():
    import json

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "golden",
        "articles.jsonl",
    )
    with open(path, encoding="utf-8") as f:
        records = [json.loads(line) for line in f]
    return {r["url"]: r for r in records}
