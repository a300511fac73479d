"""Physical-plan regression guards: the optimizations SURVEY.md §4 promises
must actually appear in the executed plans — pushdown reaching the scan,
dimension joins staying broadcast, no accidental sort-merge or cartesian.

These assert on plan STRUCTURE, not timing, so they're stable across
machines while still failing loudly if a refactor silently de-optimizes a
query (e.g. a filter stops being pushable, a join loses its broadcast)."""

import re

import pytest

import __spark_entry__ as entrymod


def _plan(spark, name, sf_dir):
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_flagship_pushdown_and_pruning(spark, sf):
    p = _plan(spark, "flagship_scan", sf)
    assert "PushedFilters" in p
    assert "In(event_type" in p  # IN-set pushed to parquet
    # column pruning: props (unused) must not be read
    read_schema = re.search(r"ReadSchema: ([^\n]+)", p).group(1)
    assert "props" not in read_schema


def test_dim_joins_broadcast_not_sortmerge(spark, sf):
    for name in ["tpch_q3", "tpch_q5"]:
        p = _plan(spark, name, sf)
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p
        assert "CartesianProduct" not in p


def test_semi_join_is_broadcast(spark, sf):
    p = _plan(spark, "semi_join_ids", sf)
    assert "LeftSemi" in p and "BroadcastHashJoin" in p


def test_rollup_has_partial_aggregation(spark, sf):
    p = _plan(spark, "time_bucket_rollup", sf)
    # two-phase hash aggregate: map-side partial + final after one shuffle
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2


def test_single_window_shuffle(spark, sf):
    # sessionize: exactly one exchange for the per-user window chain
    p = _plan(spark, "sessionize", sf)
    assert p.count("Exchange") <= 2  # window partition + final agg


def test_lake_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.sources.lake import TimeseriesLake

    rows = [(f"c{i%3}", f"u{i%5}", i * 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["collection", "uuid", "value"]).withColumn(
        "time", F.timestamp_micros(F.col("value").cast("long") * 1_000_000)
    )
    root = str(tmp_path / "lake")
    df.write.partitionBy("collection").parquet(root)
    lake = TimeseriesLake.open(spark, root)
    p = (
        lake.scan(collections=["c1"], start="1970-01-01", end="1970-01-02")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in p and "c1" in p
