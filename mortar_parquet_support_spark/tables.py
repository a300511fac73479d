"""Loaders for the driver-provided relational tables (TESTDATA.md,
FIXTURES.md F4) with type normalization quirks handled in one place.

The notable quirk: ``events.ts`` has been written by different fixture
generations as either Parquet INT64 TIMESTAMP(NANOS) — which Spark has no
type for and refuses outright (PARQUET_TYPE_ILLEGAL) — or as a plain
microsecond timestamp. We detect which we got: a nanos file is read via the
documented escape hatch (``spark.sql.legacy.parquet.nanosAsLong``) and
rebuilt as a microsecond TIMESTAMP_NTZ with integer division — the same
floor-truncation DuckDB applies when it reads the file, so oracle
comparisons agree (SURVEY.md §7 R5); a microsecond file passes through
untouched. The NTZ reconstruction uses ``timestampadd`` on an NTZ literal,
which is session-timezone-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events parquet as-written, handling the INT64-nanos
    encoding. ``nanosAsLong`` is only set when the file actually needs it
    (a plain read throws PARQUET_TYPE_ILLEGAL on a nanos column), so the
    session conf stays honest for fixtures that don't."""
    path = f"{sf_dir}/events.parquet"
    try:
        return spark.read.parquet(path)
    except Exception as exc:
        # only the nanos-type refusal earns the conf flip — re-raise
        # anything else (missing dir, corrupt footer) without mutating
        # session state
        msg = str(exc).upper()
        # every Spark version's nanos refusal names the unit
        # ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))"); a bare
        # 'ILLEGAL' match would also flip the conf for unrelated
        # unsupported types (FIXED_LEN_BYTE_ARRAY, ...), whose retry then
        # fails identically but leaves the session mutated
        if "PARQUET" not in msg or "NANO" not in msg:
            raise
        # On retry SUCCESS the conf is deliberately NOT restored: the
        # returned frame is LAZY — physical planning (which snapshots the
        # Hadoop conf the executors use for schema conversion) happens at
        # first ACTION, so restoring here would resurface
        # PARQUET_TYPE_ILLEGAL mid-query. Known tradeoff: after the first
        # nanos fixture, a later unrelated read of an INT64
        # TIMESTAMP(NANOS) column in THIS session surfaces as bigint raw
        # nanos instead of erroring. On retry FAILURE the conf IS
        # restored — nothing was returned, so nothing depends on it.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            return spark.read.parquet(path)
        except Exception:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
            raise


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        raw = read_events_raw(spark, sf_dir)
        if dict(raw.dtypes)["ts"] in ("bigint", "long"):
            # INT64 TIMESTAMP(NANOS) file read via nanosAsLong: rebuild µs
            # NTZ. DIV (truncate toward zero) is deliberate: DuckDB's
            # ns->µs read also truncates toward zero (measured: -1500 ns
            # reads as ...999999 = -1 µs, -500 ns as epoch 0), so
            # pre-epoch sub-µs residues agree with the oracle
            # (pinned by test_nanos_rebuild_truncation_matches_duckdb).
            ts_ntz = F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            )
            return raw.withColumn("ts", ts_ntz)
        # µs-timestamp fixtures: normalize to NTZ so BOTH fixture
        # generations yield the same session-tz-independent type for
        # collect, window boundaries, and the DuckDB oracle. A file with
        # isAdjustedToUTC=false already reads as NTZ (pass through); a
        # UTC-adjusted file surfaces as LTZ and is rebuilt from the raw
        # epoch like the nanos branch — a bare cast('timestamp_ntz')
        # would render via the SESSION timezone and shift every value on
        # a non-UTC session relative to the other fixture generations.
        if dict(raw.dtypes)["ts"] == "timestamp_ntz":
            return raw
        ts_ntz = F.expr(
            "timestampadd(MICROSECOND, unix_micros(ts), "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
        return raw.withColumn("ts", ts_ntz)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, *, suffix: str = "") -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name + suffix)
