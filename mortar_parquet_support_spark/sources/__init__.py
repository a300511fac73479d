"""Sources & sinks: CSV stream ingest, the Parquet timeseries lake, TTL
graphs, and export sinks (CSV / DuckDB / pandas)."""

from mortar_parquet_support_spark.sources.ingest import (  # noqa: F401
    UUID_RE,
    ingest_csv,
    ingest_directory,
)
from mortar_parquet_support_spark.sources.lake import (  # noqa: F401
    TimeseriesLake,
    write_metadata_summary,
)
from mortar_parquet_support_spark.sources.ttl import parse_ttl, load_graph_dir  # noqa: F401
from mortar_parquet_support_spark.sources import sinks  # noqa: F401
