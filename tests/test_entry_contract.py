"""Driver-contract invariants: entry() runs, every oracle key has a query,
bench headline names exist, streaming rollup == batch rollup."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bench import HEADLINE


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_type", "bucket", "n", "avg_value", "min_value", "max_value"]


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 25  # the oracle-checked core stays large
    missing_oracle = set(qs) - set(oracles)
    # every intentionally rows-only entry is named in the oracle_sql docstring
    for name in missing_oracle:
        assert name in entrymod.oracle_sql.__doc__


def test_bench_headline_names_exist():
    qs = entrymod.queries()
    assert set(HEADLINE) <= set(qs)


def test_streaming_rollup_matches_batch(spark, sf_dir):
    from mortar_parquet_support_spark.operators.timeseries import time_bucket_rollup
    from mortar_parquet_support_spark.streaming.rollup import stream_rollup_once
    from mortar_parquet_support_spark.tables import load_table

    streamed = stream_rollup_once(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="15 minutes", value="value",
        aggs={"n": "count", "sum_value": "sum"},
    ).select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 2).alias("sum_value"),
    )
    s = {(r.event_type, str(r.bucket)): (r.n, r.sum_value) for r in streamed.collect()}
    b = {(r.event_type, str(r.bucket)): (r.n, r.sum_value) for r in batch.collect()}
    assert len(s) == len(b) > 0
    assert s == b
