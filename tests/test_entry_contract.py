"""Driver-contract invariants: entry() runs, every oracle key has a query,
bench headline names exist, streaming rollup == batch rollup."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bench import HEADLINE


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_type", "bucket", "n", "avg_value", "min_value", "max_value"]


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 25  # the oracle-checked core stays large
    missing_oracle = set(qs) - set(oracles)
    # every intentionally rows-only entry is named in the oracle_sql docstring
    for name in missing_oracle:
        assert name in entrymod.oracle_sql.__doc__


def test_bench_headline_names_exist():
    qs = entrymod.queries()
    assert set(HEADLINE) <= set(qs)


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir):
    from mortar_parquet_support_spark.streaming.rollup import stream_dedup_once
    from mortar_parquet_support_spark.tables import load_table

    got = {(r.user_id, r.event_type) for r in stream_dedup_once(spark, sf_dir).collect()}
    exp = {
        (r.user_id, r.event_type)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == exp and len(got) > 0


def test_stateful_sessionize_stream(spark, tmp_path):
    # user 1: events at 0/5/10 min then 120/125 -> first session closes when
    # the 2h event arrives (gap path); user 2: one session at 0/10 min ->
    # closed via event-time timeout once the global watermark passes it; the
    # still-open user-1 session (120-125) must stay in state, unemitted.
    import datetime

    from mortar_parquet_support_spark.streaming.rollup import (
        _run_to_memory,
        stateful_sessionize_stream,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [(1, base + datetime.timedelta(minutes=m), 1.0) for m in [0, 5, 10, 120, 125]]
    rows += [(2, base + datetime.timedelta(minutes=m), 1.0) for m in [0, 10]]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    src = str(tmp_path / "ev")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sess = stateful_sessionize_stream(stream, key="user_id", ts="ts", gap="30 minutes")
    got = sorted(
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in _run_to_memory(sess, output_mode="append").collect()
    )
    assert got == [
        (1, base, base + datetime.timedelta(minutes=10), 3),
        (2, base, base + datetime.timedelta(minutes=10), 2),
    ]


def test_streaming_rollup_matches_batch(spark, sf_dir):
    from mortar_parquet_support_spark.operators.timeseries import time_bucket_rollup
    from mortar_parquet_support_spark.streaming.rollup import stream_rollup_once
    from mortar_parquet_support_spark.tables import load_table

    streamed = stream_rollup_once(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = time_bucket_rollup(
        ev, ts="ts", keys=["event_type"], bucket="15 minutes", value="value",
        aggs={"n": "count", "sum_value": "sum"},
    ).select(
        "event_type",
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 2).alias("sum_value"),
    )
    s = {(r.event_type, str(r.bucket)): (r.n, r.sum_value) for r in streamed.collect()}
    b = {(r.event_type, str(r.bucket)): (r.n, r.sum_value) for r in batch.collect()}
    assert len(s) == len(b) > 0
    assert s == b


def test_sparql_bridges_fixture_structure(spark):
    """The r12-promoted sparql_bridges entry: 17 bridge rows (siteA: vav0's
    2x2 multi-match + 7 single-pair VAVs; siteB: vav0's 2x2 + 2 singles),
    with the negative space pinned — the orphan sensor (no hasPoint edge)
    and the RVAV (subclass of VAV; QUERY1's `a brick:VAV` is exact-type)
    must contribute nothing."""
    from mortar_parquet_support_spark.entries.reference_surface import (
        _sparql_bridges,
    )

    rows = _sparql_bridges(spark, "/unused").collect()
    assert len(rows) == 17
    assert {r.site for r in rows} == {"siteA", "siteB"}
    assert sum(1 for r in rows if r.site == "siteA") == 11
    assert all(not r.vav.endswith("#rv") for r in rows)
    ids = {r.sen for r in rows} | {r.sp for r in rows}
    assert all(len(i) == 36 for i in ids)
    # multi-match: siteA vav0 appears 4 times (2 sensors x 2 setpoints)
    assert sum(1 for r in rows if r.vav == "urn:siteA#vav0") == 4
