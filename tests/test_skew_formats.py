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


def test_interleave_bits_known_values(spark):
    from mortar_parquet_support_spark.functions import interleave_bits
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 5)], ["x", "y"])  # 0b011, 0b101
    key = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")
    ).first().z
    # bit j of x -> position 2j; bit j of y -> position 2j+1
    # x=011, y=101 -> z bits: pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0,
    # pos4=x2=0, pos5=y2=1 -> 0b100111 = 39
    assert key == 39


def test_zorder_key_locality(spark):
    """Sorting by the z-key interleaves both dimensions: the first half of
    the sorted order must stay in the low half of BOTH x and y ranges
    (single-column sort would span the full range of the other column)."""
    from mortar_parquet_support_spark.functions import zorder_key
    from pyspark.sql import functions as F

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    z = zorder_key(df, ["x", "y"], bits=5)
    ordered = df.withColumn("z", z).orderBy("z").collect()
    first_quarter = ordered[: len(ordered) // 4]
    xs = [r.x for r in first_quarter]
    ys = [r.y for r in first_quarter]
    assert max(xs) <= 16 and max(ys) <= 16  # both dims bounded, not just one
    # and the key is a bijection on the grid (no collisions at full bits)
    assert len({r.z for r in ordered}) == len(rows)


def test_zorder_layout_prunes_trailing_dim(spark, tmp_path):
    """write_zordered's whole point, measured at the FILE level off real
    parquet footers: under a linear (x-sorted) layout a trailing-column
    box predicate intersects EVERY file's y-minmax (y spans everything in
    each x-run); the z-ordered layout qualifies a strict subset on y
    while keeping x-pruning bounded — multi-dimensional stats pruning,
    not just a prettier sort."""
    import glob

    import pyarrow.parquet as pq
    import pytest

    from mortar_parquet_support_spark.sources.maintenance import write_zordered

    n, files = 20_000, 16
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
    )
    linear, zord = str(tmp_path / "linear"), str(tmp_path / "zord")
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(linear)
    write_zordered(df, zord, cols=["x", "y"], bits=10, files=files)

    def qualifying(root, col, lo, hi):
        hit = 0
        for f in glob.glob(f"{root}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st.min <= hi and st.max >= lo:
                    hit += 1
                    break
        return hit

    lin_total = len(glob.glob(f"{linear}/*.parquet"))
    z_total = len(glob.glob(f"{zord}/*.parquet"))
    assert lin_total > 4 and z_total > 4  # enough granularity to prune

    # trailing dim: linear qualifies everything, z-order a strict subset
    lin_y = qualifying(linear, "y", 0, 49)
    z_y = qualifying(zord, "y", 0, 49)
    assert lin_y == lin_total
    assert z_y < z_total, (z_y, z_total)
    # leading dim: z-order pays a bounded cost vs the perfect linear prune
    lin_x = qualifying(linear, "x", 0, 49)
    z_x = qualifying(zord, "x", 0, 49)
    assert lin_x <= 2
    assert z_x < z_total, (z_x, z_total)

    # content round-trips (the layout moves rows, never changes them)
    got = spark.read.parquet(zord)
    assert got.count() == n
    assert got.selectExpr("sum(x)", "sum(y)").first() == df.selectExpr(
        "sum(x)", "sum(y)"
    ).first()

    with pytest.raises(ValueError, match="__z"):
        write_zordered(
            df.withColumn("__z", F.lit(1)), str(tmp_path / "clash"), cols=["x"]
        )


def test_interleave_bits_overflow_guard_and_zorder_clamp(spark):
    import pytest

    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.functions import interleave_bits, zorder_key

    df = spark.createDataFrame([(1, 2, 3, 4)], ["a", "b", "c", "d"])
    with pytest.raises(ValueError):
        interleave_bits([F.col(c) for c in df.columns], bits=16)
    # zorder_key clamps to 63 // n_cols and stays non-negative
    k = df.select(zorder_key(df, ["a", "b", "c", "d"], bits=16).alias("z")).first().z
    assert k >= 0
    # empty frame / all-null column: constant key, no crash
    empty = spark.createDataFrame([], "x int, y int")
    assert empty.select(zorder_key(empty, ["x", "y"]).alias("z")).count() == 0
    nullcol = spark.createDataFrame([(None, 1), (None, 2)], "x int, y int")
    ks = [r.z for r in nullcol.select(zorder_key(nullcol, ["x", "y"]).alias("z")).collect()]
    assert all(k >= 0 for k in ks)


def test_stream_enrich_tolerates_key_in_dim_cols(spark):
    """Review finding r8: dim_cols containing the join key projected it
    twice and failed the equi-join with AMBIGUOUS_REFERENCE."""
    from mortar_parquet_support_spark.streaming.rollup import stream_enrich

    ev = spark.createDataFrame([(1, "a")], ["user_id", "etype"])
    dim = spark.createDataFrame([(1, "alice")], ["user_id", "name"])
    out = stream_enrich(ev, dim, on="user_id", dim_cols=["user_id", "name"])
    assert out.collect()[0].name == "alice"


def test_run_to_memory_drops_view_on_failure(spark, sf_dir):
    """Review finding r8: a failing streaming query used to leak the
    memory-sink temp view (driver-pinned rows) — the drop now runs in a
    finally block."""
    import pyspark.sql.functions as F
    from mortar_parquet_support_spark.streaming.rollup import (
        _events_stream,
        _run_to_memory,
    )

    before = {t.name for t in spark.catalog.listTables()}
    ev = _events_stream(spark, sf_dir).withColumn(
        "boom", F.raise_error(F.lit("deliberate"))
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        _run_to_memory(ev.select("event_id", "boom"))
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("mortar_stream_")}


def test_csv_default_roundtrip_loses_no_rows(spark, tmp_path):
    """Writer and reader header defaults must agree: Spark's raw writer
    default is headerless while open_table reads header=True, which
    silently ate the first row of every partition file."""
    from mortar_parquet_support_spark.sources.formats import open_table, write_table

    df = spark.range(10).selectExpr("id", "id * 2 AS v").repartition(2)
    p = str(tmp_path / "rt_csv")
    write_table(df, p, format="csv")
    back = open_table(spark, p, format="csv", schema="id bigint, v bigint")
    assert back.count() == 10
    assert {r.id for r in back.collect()} == set(range(10))


def test_write_table_rejects_bad_format(spark, tmp_path):
    import pytest

    from mortar_parquet_support_spark.sources.formats import write_table

    df = spark.range(1)
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(df, str(tmp_path / "x"), format="binaryFile")


def test_open_jdbc_rejects_parallelism_without_range(spark):
    import pytest

    from mortar_parquet_support_spark.sources.formats import open_jdbc

    with pytest.raises(ValueError, match="single cursor"):
        open_jdbc(spark, "jdbc:postgresql://h/db", "t", num_partitions=32)
