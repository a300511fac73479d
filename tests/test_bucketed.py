"""Bucketed co-located joins: the write-once-pre-shuffle leg of the scale
strategy must produce join plans with ZERO Exchange operators."""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.sources.bucketed import bucketed_join, write_bucketed
from tests.conftest import plan_str


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # mode='overwrite' now recovers orphaned managed-table locations
    # (previous sessions whose catalog forgot the table) inside the helper
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        li.select("l_orderkey", "l_quantity", "l_extendedprice"),
        "bk_lineitem",
        bucket_cols=["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
        mode="overwrite",
    )
    write_bucketed(
        orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"),
        "bk_orders",
        bucket_cols=["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
        mode="overwrite",
    )
    yield "bk_lineitem", "bk_orders"
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    spark.sql("DROP TABLE IF EXISTS bk_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, sf_dir):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, on=["l_orderkey"])
    p = plan_str(joined)
    assert "Exchange" not in p, p  # co-located: zero shuffle at query time
    assert "Bucketed: true" in p, p  # planner actually used the bucket spec
    # and it still computes the right thing
    got = joined.count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exp = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == exp


def test_unbucketed_same_join_does_shuffle(spark, sf_dir):
    # control: the identical join over plain parquet needs Exchanges
    # (or a broadcast at this tiny scale) — bucketing is what removed them.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = plan_str(li.join(orders.hint("shuffle_merge"), li.l_orderkey == orders.o_orderkey))
    assert "Exchange" in p
