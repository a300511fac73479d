"""Generic table sources/sinks beyond the Parquet lake.

The reference supports exactly CSV-in / Parquet-at-rest / CSV·DuckDB·pandas-
out (SURVEY.md §2.1). An engine replacing it should read and write the
formats Spark ships connectors for, behind one consistent call — columnar
(parquet/orc) preferred, schema explicit for text formats (inference is a
full extra pass at 100 TB).

Connector caveat (applies to BOTH gates below): ``avro`` needs the
spark-avro connector jar, which the pip pyspark image does not bundle —
the format passes the gate and ``load()``/``save()`` then raises Spark's
"Failed to find data source: avro" until the jar is on the classpath
(real clusters ship it). Same caveat class as JDBC drivers (open_jdbc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

READ_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro", "binaryFile")
#: binaryFile is a read-only source; everything else round-trips
WRITE_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro")


def open_table(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read a table of any supported format. Text formats (csv/json) warn-by-
    design: pass ``schema`` — schema inference scans the data twice."""
    if format not in READ_FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {READ_FORMATS}")
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    if format == "csv" and "header" not in options:
        options["header"] = True
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write ``df`` in any round-trippable format. CSV defaults to
    ``header=true`` to mirror open_table's read default — Spark's writer
    default is headerless, and a default-options round-trip through the
    mismatched pair silently drops the first ROW of every partition file
    (the reader consumes it as the header line)."""
    if format not in WRITE_FORMATS:
        # the read-side gate raises a clear error for typos and read-only
        # sources; without this mirror, 'binaryFile' or 'paquet' would
        # surface as a deep connector exception at job time instead
        raise ValueError(f"unsupported format {format!r}; one of {WRITE_FORMATS}")
    if format == "csv" and "header" not in options:
        options["header"] = True
    writer = df.write.format(format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def open_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """JDBC source with parallel range partitioning (the scalable read
    shape: N concurrent range queries instead of one cursor). The v1 image
    ships no JDBC drivers — the call raises a clear error until a driver
    jar is on the classpath; the plumbing is real.

    ``num_partitions`` only takes effect together with
    ``partition_column`` (+ bounds) — Spark's JDBC source ignores a bare
    ``numPartitions`` on reads, so requesting parallelism without a range
    column is rejected loudly instead of silently scanning through one
    cursor."""
    if num_partitions is not None and partition_column is None:
        raise ValueError(
            "num_partitions without partition_column would read through a "
            "single cursor anyway — pass partition_column/lower_bound/"
            "upper_bound for a parallel read"
        )
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
