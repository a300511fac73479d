"""Fixture-dtype contract (SURVEY §7 R5, verdict r6 #6): the driver has
regenerated ``events.parquet`` with DIFFERENT physical encodings across
rounds — INT64 TIMESTAMP(NANOS) (which Spark refuses without
``nanosAsLong``) and plain µs TIMESTAMP_NTZ. Every loader in the repo must
handle BOTH, yielding the same logical values and the same types:

- batch ``load_table``: ts is always TIMESTAMP_NTZ (session-tz-independent,
  what the DuckDB oracle compares against), nanos floor-truncated to µs;
- streaming ``_events_stream``: ts is always TIMESTAMP (LTZ) — the only
  type ``withWatermark``/event-time state accept — with the same instants
  under the UTC session timezone.

These tests pin that contract against synthetic files of both encodings so
the next fixture regeneration can't silently break five operators again.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.tables import load_table

# one duplicate key pair (event_id 0/3 share user 7/"click") + a None ts
_BASE = datetime.datetime(2024, 5, 1, 12, 0, 0)
_ROWS = [
    (0, _BASE, 7, "click", 1.0, "{}"),
    (1, _BASE + datetime.timedelta(minutes=1, microseconds=123456), 8, "view", 2.0, "{}"),
    (2, _BASE + datetime.timedelta(hours=2), 9, "purchase", 3.0, "{}"),
    (3, _BASE + datetime.timedelta(hours=3), 7, "click", 4.0, "{}"),
]


def _write_events(dirpath, unit: str) -> str:
    """Write events.parquet with ts encoded at the given resolution
    (``'ns'`` -> INT64 TIMESTAMP(NANOS), ``'us'`` -> µs TIMESTAMP_NTZ)."""
    dirpath.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(table, dirpath / "events.parquet", version="2.6")
    return str(dirpath)


@pytest.fixture(scope="module")
def encodings(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_encodings")
    return {
        "ns": _write_events(root / "ns_fix", "ns"),
        "us": _write_events(root / "us_fix", "us"),
    }


def test_written_encodings_differ(encodings):
    """Sanity: the two files really carry the two historical encodings."""
    ns_type = pq.read_schema(encodings["ns"] + "/events.parquet").field("ts").type
    us_type = pq.read_schema(encodings["us"] + "/events.parquet").field("ts").type
    assert ns_type == pa.timestamp("ns")
    assert us_type == pa.timestamp("us")


def test_load_table_both_encodings_ntz_and_equal(spark, encodings):
    outs = {}
    for name, d in encodings.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz", name
        outs[name] = sorted(
            (r.event_id, r.ts) for r in df.select("event_id", "ts").collect()
        )
    assert outs["ns"] == outs["us"]
    # and the values are the wall-clock instants we wrote (µs precision)
    assert outs["us"][1][1] == _BASE + datetime.timedelta(minutes=1, microseconds=123456)


def test_events_stream_event_time_capable_both_encodings(spark, encodings):
    """_events_stream must yield a TIMESTAMP (LTZ) ts on both encodings and
    drive a watermark-bearing operator end-to-end — the exact combination a
    fixture regeneration broke in round 6."""
    from mortar_parquet_support_spark.streaming.rollup import stream_dedup_once

    for name, d in encodings.items():
        out = stream_dedup_once(spark, d).collect()
        got = sorted((r.user_id, r.event_type) for r in out)
        assert got == [(7, "click"), (8, "view"), (9, "purchase")], name


def test_events_stream_instants_match_batch(spark, encodings):
    """The streaming LTZ instants equal the batch NTZ wall-clock under the
    UTC session tz, on both encodings."""
    from mortar_parquet_support_spark.streaming.rollup import (
        _events_stream,
        _run_to_memory,
    )

    for name, d in encodings.items():
        ev = _events_stream(spark, d)
        assert dict(ev.dtypes)["ts"] == "timestamp", name
        out = _run_to_memory(
            ev.select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts")),
            output_mode="append",
        )
        got = sorted((r.event_id, r.ts) for r in out.collect())
        batch = sorted(
            (r.event_id, r.ts)
            for r in load_table(spark, d, "events").select("event_id", "ts").collect()
        )
        assert got == batch, name


def test_nanos_rebuild_truncation_matches_duckdb(spark, tmp_path):
    """A review pass claimed DuckDB FLOORS converting ns->us (making 'ts
    DIV 1000' wrong pre-epoch); measurement shows DuckDB truncates toward
    zero exactly like DIV (-1500 ns -> -1 us, -500 ns -> 0). Pin the
    agreement on both sides of the epoch so neither engine's convention
    can drift unnoticed."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mortar_parquet_support_spark.tables import load_table

    path = str(tmp_path / "events.parquet")
    # -1500 ns and +1500 ns: DuckDB floors to -2us / +1us
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([-1500, 1500], pa.timestamp("ns")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["a", "a"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(tbl, path, use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    got = {
        r.event_id: r.ts
        for r in load_table(spark, str(tmp_path), "events").collect()
    }
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"select event_id, cast(ts as timestamp) from read_parquet('{path}')"
        ).fetchall()
    }
    assert got == want, (got, want)
