"""Salted-join correctness + generic format round-trips."""

from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.skew import key_histogram, salted_join
from mortar_parquet_support_spark.sources.formats import open_table, write_table


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 90% of rows on key 0
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], ["k", "name"])
    plain = {(r.k, r.v, r.name) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(big, small, "k").collect()}
    assert salted == plain
    left = {(r.k, r.v, r.name) for r in salted_join(big, small, "k", how="left").collect()}
    assert left == {(r.k, r.v, r.name) for r in big.join(small, "k", "left").collect()}


def test_key_histogram_finds_hot_key(spark):
    big = spark.range(20000).select((F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id"))).alias("k"))
    hist = key_histogram(big, "k", fraction=0.1)
    assert hist[0]["k"] == 0  # the hot key dominates the sample


def test_format_roundtrips(spark, tmp_path):
    df = spark.range(100).select("id", (F.col("id") * 2.5).alias("v"))
    for fmt in ["parquet", "orc", "json", "csv"]:
        path = str(tmp_path / fmt)
        opts = {"header": True} if fmt == "csv" else {}
        write_table(df, path, format=fmt, **opts)
        schema = "id BIGINT, v DOUBLE" if fmt in ("json", "csv") else None
        back = open_table(spark, path, format=fmt, schema=schema)
        assert back.count() == 100
        assert {r.id for r in back.collect()} == set(range(100))


def test_stream_enrich_equals_batch_join(spark, sf_dir):
    """Stream-static join over availableNow == the same batch join."""
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.streaming.rollup import stream_enrich_once
    from mortar_parquet_support_spark.tables import load_table

    got = stream_enrich_once(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    want = ev.join(dim, "user_id", "left")
    assert got.count() == want.count()
    assert (
        got.select("event_id", "user_name").exceptAll(
            want.select("event_id", "user_name")
        ).isEmpty()
    )
