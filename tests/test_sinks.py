"""Sink tests (SURVEY §2.1 S9-S11) + S6 conf wiring + S7 bounded batches."""

import os

from pyspark.sql import functions as F

from mortar_parquet_support_spark.sources import sinks


def _frame(spark, n=100):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 2.5).alias("v"), F.lit("x").alias("tag")
    )


def test_to_local_csv_appends_headerless(spark, tmp_path):
    df = _frame(spark, 50)
    target = str(tmp_path / "out.csv")
    n1 = sinks.to_local_csv(df, target)
    n2 = sinks.to_local_csv(df, target)  # append mode: second call doubles it
    assert n1 == n2 == 50
    with open(target) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert len(lines) == 100
    assert not lines[0].startswith("id")  # headerless, reference parity


def test_to_csv_distributed_returns_count(spark, tmp_path):
    out = str(tmp_path / "csvdir")
    n = sinks.to_csv(_frame(spark, 75), out, header=True)
    assert n == 75
    assert any(p.startswith("part-") for p in os.listdir(out))


def test_to_duckdb_create_then_insert(spark, tmp_path):
    db = str(tmp_path / "t.duckdb")
    con = sinks.to_duckdb(_frame(spark, 30), db, "t1")
    assert con.table("t1").count("*").fetchone()[0] == 30
    # second call INSERTs into the existing table via the same connection
    con2 = sinks.to_duckdb(_frame(spark, 30), db, "t1", connection=con)
    assert con2.table("t1").count("*").fetchone()[0] == 60
    con.close()


def test_to_pandas_limit_exact(spark):
    pdf = sinks.to_pandas(_frame(spark, 100), limit=7)
    assert len(pdf) == 7  # exact, not batch-granularity (SURVEY §7 R4)
    assert list(pdf.columns) == ["id", "v", "tag"]


def test_lake_to_batches_bounded(spark, tmp_path):
    from mortar_parquet_support_spark.sources.lake import TimeseriesLake

    rows = [("c0", f"u{i%4}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["collection", "uuid", "value"]).withColumn(
        "time", F.timestamp_micros((F.col("value") * 1_000_000).cast("long"))
    )
    root = str(tmp_path / "lake")
    df.write.partitionBy("collection").parquet(root)
    lake = TimeseriesLake.open(spark, root)
    total, batches = 0, 0
    for batch in lake.to_batches(max_rows=256):
        total += batch.num_rows
        batches += 1
    assert total == 1000
    assert batches >= 2  # actually bounded, not one giant batch


def _lake(spark, tmp_path, n=1000):
    from mortar_parquet_support_spark.sources.lake import TimeseriesLake

    rows = [("c0", f"u{i%4}", float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["collection", "uuid", "value"]).withColumn(
        "time", F.timestamp_micros((F.col("value") * 1_000_000).cast("long"))
    )
    root = str(tmp_path / "lake")
    df.write.partitionBy("collection").parquet(root)
    return TimeseriesLake.open(spark, root)


def test_to_batches_explicit_spill_dir(spark, tmp_path):
    """Cluster path: caller supplies a shared spill location; batches stream
    from it and the spill is deleted on exhaustion."""
    lake = _lake(spark, tmp_path)
    shared = tmp_path / "shared"
    shared.mkdir()
    total = sum(
        b.num_rows for b in lake.to_batches(max_rows=256, spill_dir=str(shared))
    )
    assert total == 1000
    assert list(shared.iterdir()) == []  # spill cleaned up via Hadoop FS


def test_to_batches_uses_checkpoint_dir(spark, tmp_path):
    """With no explicit spill_dir, the session checkpoint dir (shared by
    Spark's own contract) is used — not a driver-local tempdir."""
    lake = _lake(spark, tmp_path)
    ckpt = tmp_path / "ckpt"
    sc = spark.sparkContext
    old = lake._checkpoint_dir()
    sc.setCheckpointDir(str(ckpt))
    try:
        it = lake.to_batches(max_rows=256)
        first = next(iter(it))
        assert first.num_rows <= 256
        # the spill landed under the checkpoint dir while the iterator is live
        assert any(p.name.startswith("lake_batches_") for p in ckpt.rglob("lake_batches_*"))
    finally:
        if old:
            sc.setCheckpointDir(old)


def test_to_batches_local_iterator_fallback(spark, tmp_path):
    """The no-shared-filesystem fallback yields the same rows, Arrow-typed,
    in bounded batches."""
    from mortar_parquet_support_spark.sources.lake import _batches_via_local_iterator

    lake = _lake(spark, tmp_path)
    batches = list(_batches_via_local_iterator(lake.df, 256))
    assert all(b.num_rows <= 256 for b in batches)
    assert sum(b.num_rows for b in batches) == 1000
    got = sorted(v for b in batches for v in b.column(b.schema.get_field_index("value")).to_pylist())
    assert got == [float(i) for i in range(1000)]


def test_to_batches_nonlocal_resolution(spark, tmp_path, monkeypatch):
    """Simulate a non-local master with no checkpoint dir: to_batches must
    route to the toLocalIterator fallback, never a driver-local tempdir."""
    from mortar_parquet_support_spark.sources import lake as lake_mod

    lake = _lake(spark, tmp_path, n=300)
    monkeypatch.setattr(
        type(lake), "_checkpoint_dir", lambda self: None, raising=True
    )
    called = {}

    def fake_fallback(df, max_rows):
        called["hit"] = True
        return iter(())

    monkeypatch.setattr(lake_mod, "_batches_via_local_iterator", fake_fallback)

    class FakeSC:
        master = "spark://cluster:7077"

    class FakeSpark:
        sparkContext = FakeSC()

    lake.spark = FakeSpark()
    list(lake.to_batches(max_rows=64))
    assert called.get("hit")


def test_s3_conf_wiring(spark):
    from mortar_parquet_support_spark.session import get_spark

    s = get_spark("s3-conf", s3_endpoint="https://example.invalid:9000", s3_region="us-test-1")
    # getOrCreate applies non-static confs onto the active session
    assert s.conf.get("spark.hadoop.fs.s3a.endpoint") == "https://example.invalid:9000"
    assert s.conf.get("spark.hadoop.fs.s3a.endpoint.region") == "us-test-1"
