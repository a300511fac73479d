"""Export sinks: CSV, DuckDB, pandas (SURVEY.md §2.1 S9-S11).

The reference streams Arrow batches into each sink one at a time on a single
machine (``/root/reference/mortar-parquet-client/client.py:74-109``). Here
each sink is a distributed write where possible, with a local-file parity
mode where the reference's contract is "one local file/database".
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def to_csv(df: DataFrame, path: str, *, header: bool = False, mode: str = "append") -> int:
    """S9: distributed CSV export; returns the row count (client.py:74-80
    returns the number of exported rows).

    Writes a directory of part files (the scalable shape). The count comes
    from an ``Observation`` on the writing job itself — one execution, and
    the number reported is the number of rows actually written even when
    the plan is nondeterministic (unordered limit, sampling)."""
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    observed.write.mode(mode).option("header", header).csv(path)
    return int(obs.get["n"])


def _local_master(df: DataFrame) -> bool:
    return df.sparkSession.sparkContext.master.startswith("local")


def _ltz_as_micros(df: DataFrame) -> DataFrame:
    """Project TIMESTAMP (LTZ) columns to epoch micros for the driver-link
    iterator: toLocalIterator would otherwise hand back NAIVE datetimes in
    the driver's local tz, which are ambiguous for the repeated wall-clock
    hour of a DST fall-back — the instant itself survives only as an
    integer. Pairs with _csv_cell_formatter's _fmt_instant."""
    from pyspark.sql.types import TimestampType

    # backtick-quoted names, not bare F.col(name): a column name containing
    # dots would otherwise parse as struct-field access — a legal input the
    # pre-micros path (plain toLocalIterator) handled. Backticks inside the
    # name escape by doubling, per Spark identifier rules.
    cols = []
    for f in df.schema.fields:
        c = F.col("`" + f.name.replace("`", "``") + "`")
        if isinstance(f.dataType, TimestampType):
            c = F.unix_micros(c)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def _csv_cell_formatter(schema, session_tz: str):
    """Build a ``cell(i, v) -> str`` renderer matching Spark's own CSV
    writer defaults, for the driver-link (non-local-master) path.

    TIMESTAMP (LTZ) cells arrive as epoch MICROS (via ``_ltz_as_micros``)
    and render in the SESSION tz as ``yyyy-MM-dd'T'HH:mm:ss.SSSXXX`` ("Z"
    at zero offset) — Spark's CSV writer shape; NTZ values render without
    the offset, dates as ISO — so both ``to_local_csv`` paths emit
    byte-identical files no matter where the driver runs."""
    import datetime as _dt
    import re as _re

    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    # session tz may be an IANA name OR a fixed offset ('+08:00',
    # 'GMT+8', 'UTC+08:00') — Spark accepts both; ZoneInfo only the former
    m = _re.fullmatch(
        r"(?:GMT|UTC)?([+-])(\d{1,2})(?::?(\d{2}))?", session_tz.strip()
    )
    if m:
        sign = 1 if m.group(1) == "+" else -1
        delta = _dt.timedelta(
            hours=int(m.group(2)), minutes=int(m.group(3) or 0)
        )
        out_tz = _dt.timezone(sign * delta)
    else:
        try:
            from zoneinfo import ZoneInfo

            out_tz = ZoneInfo(session_tz)
        except Exception:
            out_tz = _dt.timezone.utc

    _epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

    def _fmt_instant(us):
        # receives epoch MICROS (see _ltz_as_micros): a naive driver-local
        # datetime is ambiguous in the DST fall-back hour (fold=0 picks the
        # wrong occurrence), so the instant crosses the driver link as an
        # exact integer instead
        v = _epoch + _dt.timedelta(microseconds=us)
        s = v.astimezone(out_tz).isoformat(timespec="milliseconds")
        return s[:-6] + "Z" if s.endswith("+00:00") else s

    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        FloatType,
        MapType,
        StructType,
    )

    # the LOCAL-master path fails loudly on these (Spark's CSV source
    # rejects complex/binary columns); the driver-link path must not
    # silently write Python reprs instead — error-vs-garbage is the worst
    # way for the two paths to diverge (review r14)
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType))
    ]
    if bad:
        raise ValueError(
            f"CSV does not support column(s) {bad} (array/map/struct/"
            "binary) — cast or drop them first (Spark's own CSV writer "
            "rejects them too)"
        )

    formatters = {}
    for i, field in enumerate(schema.fields):
        if isinstance(field.dataType, TimestampType):
            formatters[i] = _fmt_instant
        elif isinstance(field.dataType, TimestampNTZType):
            formatters[i] = lambda v: v.isoformat(timespec="milliseconds")
        elif isinstance(field.dataType, DateType):
            formatters[i] = lambda v: v.isoformat()
        elif isinstance(field.dataType, FloatType):
            # Float.toString semantics, NOT Double.toString: Spark renders
            # float columns with shortest-round-trip digits at FLOAT
            # precision ('0.1'), while the Python row value is the widened
            # double (0.10000000149011612) — rendering that as a double
            # diverges on every non-exact float (review r14)
            formatters[i] = _java_float_repr

    def cell(i, v):
        if v is None:
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        fmt = formatters.get(i)
        if fmt is not None:
            return fmt(v)
        if isinstance(v, float):
            return _java_double_repr(v)
        return str(v)

    return cell


def _java_double_repr(v: float) -> str:
    """Java ``Double.toString`` rendering — what Spark's CSV writer emits:
    shortest round-trip digits, plain decimal for 1e-3 <= |v| < 1e7,
    otherwise ``D.DDDE<exp>`` scientific (no '+', no zero-padded
    exponent), NaN/Infinity words. Python's repr shares the shortest
    digits but differs on all the formatting (1e+16 vs 1.0E16, nan vs
    NaN), which broke the byte-parity contract (review finding r8)."""
    import math
    from decimal import Decimal

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    sign = "-" if math.copysign(1.0, v) < 0 else ""
    if v == 0.0:
        return sign + "0.0"
    t = Decimal(repr(abs(v))).as_tuple()
    digits = "".join(map(str, t.digits))
    adj = t.exponent + len(digits) - 1
    return _format_java_digits(sign, digits, adj)


def _format_java_digits(sign: str, digits: str, adj: int) -> str:
    """Render shortest-round-trip ``digits`` (value = 0.D1D2... * 10^(adj+1))
    with Java's Double/Float.toString formatting rules — the shared tail of
    the double and float renderers. Trailing zeros in the digit string are
    dropped FIRST: Python's positional repr of e.g. 1e7 ('10000000.0')
    carries them, and Java prints '1.0E7', never '1.00000000E7'
    (review r14)."""
    digits = digits.rstrip("0") or "0"
    if -3 <= adj < 7:
        if adj >= 0:
            ip = digits[: adj + 1].ljust(adj + 1, "0")
            fp = digits[adj + 1:] or "0"
            return f"{sign}{ip}.{fp}"
        return sign + "0." + "0" * (-adj - 1) + digits
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{adj}"


def _java_float_repr(v: float) -> str:
    """Java ``Float.toString`` rendering: shortest digits that round-trip
    at FLOAT32 precision, with the same plain/scientific formatting rules
    as the double renderer. The driver link hands float columns over as
    widened Python doubles, so the shortest float32 decimal comes from
    numpy's unique (shortest round-trip) formatter."""
    import math

    import numpy as np

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    sign = "-" if math.copysign(1.0, v) < 0 else ""
    if v == 0.0:
        return sign + "0.0"
    s = np.format_float_scientific(np.float32(abs(v)), unique=True)
    mant, _, exp = s.partition("e")
    digits = mant.replace(".", "").rstrip("0") or "0"
    return _format_java_digits(sign, digits, int(exp))


def _spark_csv_line(cells) -> str:
    """One CSV line exactly as Spark's writer emits it: null -> empty
    unquoted; empty string -> ``\"\"`` (the writer's default emptyValue,
    which keeps '' distinguishable from null on read-back); minimal
    quoting with the quote char escaped by BACKSLASH (Spark's default
    escape — csv.writer's doubled quotes misparse under it); '\\n'
    terminator (csv.writer's CRLF default polluted the bytes)."""
    out = []
    for s in cells:
        if s is None:
            out.append("")
        elif s == "":
            out.append('""')
        elif any(ch in s for ch in (",", '"', "\n", "\r")):
            # inside a quoted field the ESCAPE character itself must be
            # escaped too: '"a,b\\"' would let the raw backslash eat the
            # closing quote under Spark's escape='\\' reader — Spark's own
            # writer doubles it (review r14)
            out.append(
                '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
            )
        else:
            out.append(s)
    return ",".join(out) + "\n"


def to_local_csv(df: DataFrame, filename: str, *, header: bool = False) -> int:
    """S9 parity mode: append everything to ONE local CSV file, exactly the
    reference's ``data_sparql_to_csv`` shape (client.py:74-80). Only for
    result sets that fit one machine.

    Local master: one coalesced Spark CSV write into a tempdir, stitched
    into ``filename`` (fast path; executor disk IS the driver's). Any
    other master: executors can't see the driver's /tmp, so rows stream
    over the driver link (``toLocalIterator``, bounded memory) and are
    rendered with Spark's own CSV conventions (``_spark_csv_line``:
    backslash-escaped quotes, '' as \"\", '\\n' endings, Java float
    rendering) — nulls render as empty, booleans
    as true/false, and timestamps in Spark's own CSV shape (session-tz
    instants as ``yyyy-MM-dd'T'HH:mm:ss.SSSXXX``, NTZ without the
    offset), so both paths emit byte-identical files regardless of the
    driver's local timezone."""
    if not _local_master(df):
        cell = _csv_cell_formatter(
            df.schema,
            df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC"),
        )
        n = 0
        with open(filename, "a", newline="") as out:
            if header:
                out.write(_spark_csv_line(df.columns))
            for row in _ltz_as_micros(df).toLocalIterator(prefetchPartitions=True):
                out.write(_spark_csv_line([cell(i, v) for i, v in enumerate(row)]))
                n += 1
        return n
    tmp = tempfile.mkdtemp(prefix="mortar_csv_")
    try:
        obs = Observation()
        observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
        observed.coalesce(1).write.mode("overwrite").option("header", header).csv(tmp)
        parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
        with open(filename, "ab") as out:
            for p in parts:
                with open(p, "rb") as f:
                    shutil.copyfileobj(f, out)
        return int(obs.get["n"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def to_duckdb(df: DataFrame, database: str, table: str, *, connection=None):
    """S10: land the result in a DuckDB table (client.py:82-93).

    The reference round-trips one temp parquet file per Arrow batch; here,
    on a local master, one distributed parquet write stages the whole
    result and DuckDB ingests the directory in a single ``parquet_scan``.
    On any OTHER master the driver's tempdir is invisible to executors, so
    the result streams over the driver link as Arrow RecordBatches
    (bounded memory) and DuckDB consumes the reader directly — the closest
    shape to the reference's own batch loop. Returns the OPEN connection
    (the caller owns its lifetime — a relation alone dies with a
    garbage-collected connection); read the result via ``con.table(table)``.
    """
    import duckdb

    con = connection or duckdb.connect(database)
    # identifier-quote the caller's table name: a space or reserved word
    # would otherwise break the statements, and a hostile value would be
    # executed verbatim (review finding r8)
    qtable = '"' + table.replace('"', '""') + '"'
    # scope the existence check to the CURRENT catalog+schema and to base
    # tables: a same-named view, or a table in another ATTACHed database,
    # used to route the write down INSERT against a table that doesn't
    # exist in the target catalog
    exists = (
        con.execute(
            "SELECT count(*) FROM information_schema.tables "
            "WHERE table_name = ? AND table_schema = current_schema() "
            "AND table_catalog = current_database() "
            "AND table_type = 'BASE TABLE'",
            [table],
        ).fetchone()[0]
        > 0
    )
    if not _local_master(df):
        import pyarrow as pa

        from mortar_parquet_support_spark.sources.lake import (
            _batches_via_local_iterator,
        )

        from pyspark.sql.pandas.types import to_arrow_schema

        reader = pa.RecordBatchReader.from_batches(
            to_arrow_schema(df.schema), _batches_via_local_iterator(df, 1 << 16)
        )
        con.register("__mortar_staged", reader)
        try:
            if exists:
                con.execute(f"INSERT INTO {qtable} SELECT * FROM __mortar_staged")
            else:
                con.execute(
                    f"CREATE TABLE {qtable} AS SELECT * FROM __mortar_staged"
                )
        finally:
            con.unregister("__mortar_staged")
        con.commit()
        return con
    staging = tempfile.mkdtemp(prefix="mortar_duck_")
    try:
        df.write.mode("overwrite").parquet(staging)
        pattern = os.path.join(staging, "*.parquet")
        if exists:
            con.execute(f"INSERT INTO {qtable} SELECT * FROM parquet_scan('{pattern}')")
        else:
            con.execute(f"CREATE TABLE {qtable} AS SELECT * FROM parquet_scan('{pattern}')")
        con.commit()
        return con
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def to_pandas(df: DataFrame, *, limit: int | None = None):
    """S11: collect to pandas (client.py:95-109). ``limit`` is EXACT here —
    a documented upgrade over the reference's batch-granularity
    approximation (client.py:101-104, SURVEY.md §7 R4)."""
    if limit is not None:
        df = df.limit(int(limit))
    return df.toPandas()
