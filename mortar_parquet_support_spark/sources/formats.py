"""Generic table sources/sinks beyond the Parquet lake.

The reference supports exactly CSV-in / Parquet-at-rest / CSV·DuckDB·pandas-
out (SURVEY.md §2.1). An engine replacing it should read and write the
formats Spark ships connectors for, behind one consistent call — columnar
(parquet/orc) preferred, schema explicit for text formats (inference is a
full extra pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

READ_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro", "binaryFile")


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
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """JDBC source with parallel range partitioning (the scalable read
    shape: N concurrent range queries instead of one cursor). The v1 image
    ships no JDBC drivers — the call raises a clear error until a driver
    jar is on the classpath; the plumbing is real."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
