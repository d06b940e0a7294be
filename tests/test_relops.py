"""asof_join: planted-edge semantics (inclusive tie, no-prior NULLs,
tolerance lookback), builder vs the oracle-checked SQL twin, and the
one-shuffle plan shape."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from newsspark.relops import asof_join

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def planted(spark):
    lefts = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00", 5.0),   # after r@09:00 -> 1.0
            (2, 10, "2024-01-01 11:00:00", 6.0),   # tie with r@11:00 -> 2.0
            (3, 10, "2024-01-01 08:00:00", 7.0),   # before any right -> NULL
            (4, 20, "2024-01-01 12:00:00", 8.0),   # user with no rights
        ],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rights = spark.createDataFrame(
        [
            (10, "2024-01-01 09:00:00", 1.0),
            (10, "2024-01-01 11:00:00", 2.0),
        ],
        "user_id long, ts string, rval double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return lefts, rights


def test_asof_semantics_planted(planted):
    lefts, rights = planted
    out = {
        r["event_id"]: (str(r["asof_ts"]) if r["asof_ts"] else None,
                        r["asof_rval"])
        for r in asof_join(lefts, rights).collect()
    }
    assert out[1] == ("2024-01-01 09:00:00", 1.0)
    assert out[2] == ("2024-01-01 11:00:00", 2.0)  # inclusive <= tie
    assert out[3] == (None, None)                  # nothing at-or-before
    assert out[4] == (None, None)                  # keyless user


def test_asof_tolerance_lookback(planted):
    lefts, rights = planted
    out = {
        r["event_id"]: r["asof_rval"]
        for r in asof_join(
            lefts, rights, tolerance=F.expr("INTERVAL 30 MINUTES")
        ).collect()
    }
    # event 1 is 60min after its match -> dropped by the lookback bound;
    # event 2 is an exact tie (0min) -> kept
    assert out[1] is None and out[2] == 2.0


def test_asof_builder_equals_sql_twin(spark):
    from newsspark.contract_sql import SPARK_SQL

    events = spark.read.parquet(f"{SF}/events.parquet")
    events.createOrReplaceTempView("events")
    lefts = events.where("event_type = 'click'").select(
        "event_id", "user_id", "ts", "value"
    )
    rights = (
        events.where("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("rval"))
    )
    a = (
        asof_join(lefts, rights)
        .select(
            "event_id", "user_id", F.col("ts").cast("string").alias("ts"),
            "value",
            F.col("asof_ts").cast("string").alias("purchase_ts"),
            F.col("asof_rval").alias("purchase_value"),
        )
        .orderBy("event_id")
        .toPandas()
    )
    b = spark.sql(SPARK_SQL["asof_join"]).toPandas()
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)


def test_asof_plan_single_shuffle(planted):
    lefts, rights = planted
    plan = (
        asof_join(lefts, rights)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash shuffle on the key for the window sort; crucially NO
    # cartesian/broadcast-nested-loop range join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_planted_edges(spark):
    """Boundary inclusivity at exactly ±window, cross-bin matches, key
    isolation, and no duplicate pairs from the banded plan."""
    from newsspark.relops import range_join

    lefts = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00", 1.0)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rights = spark.createDataFrame(
        [
            (10, "2024-01-01 09:00:00", 1.0),   # exactly -1h -> included
            (10, "2024-01-01 11:00:00", 2.0),   # exactly +1h -> included
            (10, "2024-01-01 08:59:59", 3.0),   # 1s outside -> excluded
            (10, "2024-01-01 10:59:00", 4.0),   # inside, different bin
            (10, "2024-01-01 10:00:00", 5.0),   # same instant -> included
            (20, "2024-01-01 10:00:00", 6.0),   # other key -> excluded
        ],
        "user_id long, ts string, rval double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = range_join(lefts, rights).collect()
    got = sorted(r["r_rval"] for r in out)
    assert got == [1.0, 2.0, 4.0, 5.0]
    assert len(out) == len({(r["event_id"], str(r["r_ts"]), r["r_rval"])
                            for r in out})  # banded plan: no pair twice


def test_range_join_builder_equals_sql_twin(spark):
    from newsspark.contract_sql import SPARK_SQL
    from newsspark.relops import range_join

    events = spark.read.parquet(f"{SF}/events.parquet")
    events.createOrReplaceTempView("events")
    lefts = events.where("event_type = 'click'").select(
        "event_id", "user_id", "ts", "value"
    )
    rights = events.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("rval")
    )
    a = (
        range_join(lefts, rights, right_cols=("rval",))
        .select(
            "event_id", "user_id", F.col("ts").cast("string").alias("ts"),
            F.col("r_ts").cast("string").alias("r_ts"),
            F.col("r_rval").alias("r_value"),
        )
        .orderBy("event_id", "r_ts", "r_value")
        .toPandas()
    )
    b = spark.sql(SPARK_SQL["range_join"]).toPandas()
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)


def test_range_join_plan_no_nested_loop(spark):
    from newsspark.relops import range_join

    events = spark.read.parquet(f"{SF}/events.parquet")
    lefts = events.where("event_type = 'click'").select(
        "event_id", "user_id", "ts", "value"
    )
    rights = events.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("value").alias("rval")
    )
    plan = (
        range_join(lefts, rights)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_reserved_column_guard(planted):
    """ADVICE r3: a left side already carrying an internal/output name
    (_is_left, _asof, asof_ts, _r_<c>, asof_<c>) must raise a clear
    ValueError instead of a confusing analysis error or silently wrong
    selection."""
    lefts, rights = planted
    for bad in ("_is_left", "_asof", "asof_ts", "_r_rval", "asof_rval"):
        with pytest.raises(ValueError, match="reserves column names"):
            asof_join(lefts.withColumn(bad, F.lit(1)), rights)
    # clean left still works
    assert asof_join(lefts, rights).count() == 4


def test_range_join_reserved_column_guard(spark):
    """Same collision guard as asof_join, for range_join's synthesized
    names (_bin, r_ts, r_<c>)."""
    from newsspark.relops import range_join

    lefts = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rights = spark.createDataFrame(
        [(10, "2024-01-01 10:30:00", 1.0)],
        "user_id long, ts string, rval double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for bad in ("_bin", "r_ts", "r_rval"):
        with pytest.raises(ValueError, match="reserves column names"):
            range_join(lefts.withColumn(bad, F.lit(1)), rights)
    assert range_join(lefts, rights).count() == 1
