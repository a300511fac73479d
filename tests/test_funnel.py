"""funnel: sequential-conversion semantics + single-shuffle plan shape.

The operator's docstring claims running-min-window == k-join-chain
semantics; the oracle entry (funnel_steps) checks that at sf0.01 against
DuckDB. Here: the edge semantics a fixture can miss — out-of-order steps
don't count, equal timestamps DO (>= tie rule), the within window cuts
from the FIRST step, users without step 1 still appear — and the plan
shape (one exchange for k windows + the closing agg).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.timeseries import funnel
from tests.conftest import plan_str


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


@pytest.fixture()
def events(spark):
    return _ev(
        spark,
        [
            # u1: clean A -> B -> C conversion
            (1, 0, "A"), (1, 10, "B"), (1, 20, "C"),
            # u2: B fires BEFORE A — doesn't count; later B completes step 2
            (2, 0, "B"), (2, 5, "A"), (2, 30, "B"),
            # u3: A and B at the SAME second (tie counts), no C
            (3, 7, "A"), (3, 7, "B"),
            # u4: only C — no steps complete, still present in output
            (4, 3, "C"),
            # u5: C before B completes — C must not count
            (5, 0, "A"), (5, 2, "C"), (5, 4, "B"),
        ],
    )


def test_sequential_semantics(spark, events):
    out = {
        r.user_id: r
        for r in funnel(events, ["A", "B", "C"], ts="ts").collect()
    }
    assert len(out) == 5
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731

    assert (out[1].t_A, out[1].t_B, out[1].t_C, out[1].n_steps) == (
        t(0), t(10), t(20), 3,
    )
    # u2: the ts=0 B is ignored (precedes A at ts=5)
    assert (out[2].t_A, out[2].t_B, out[2].t_C, out[2].n_steps) == (
        t(5), t(30), None, 2,
    )
    # u3: tie at ts=7 counts (>= rule)
    assert (out[3].t_A, out[3].t_B, out[3].n_steps) == (t(7), t(7), 2)
    assert (out[4].t_A, out[4].n_steps) == (None, 0)
    # u5: C at ts=2 precedes B at ts=4 -> step 3 incomplete
    assert (out[5].t_A, out[5].t_B, out[5].t_C, out[5].n_steps) == (
        t(0), t(4), None, 2,
    )


def test_within_window_cuts_from_first_step(spark):
    events = _ev(
        spark,
        [
            (1, 0, "A"), (1, 10, "B"), (1, 40, "C"),  # C past A+30s
            (2, 0, "A"), (2, 10, "B"), (2, 30, "C"),  # C exactly at A+30s
        ],
    )
    out = {
        r.user_id: r
        for r in funnel(
            events, ["A", "B", "C"], ts="ts", within="30 seconds"
        ).collect()
    }
    assert out[1].t_C is None and out[1].n_steps == 2
    assert out[2].t_C == datetime(2024, 1, 1, 0, 0, 30) and out[2].n_steps == 3


def test_matches_join_chain_reference(spark, sf_dir):
    """Window formulation == the k-self-join formulation, on real fixture
    data with a step ordering the oracle entry doesn't use."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    )
    steps = ["signup", "click", "error"]
    got = funnel(ev, steps, ts="ts").orderBy("user_id").collect()

    s0 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    s1 = (
        ev.join(s0, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") >= F.col("t0")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.join(s1, "user_id")
        .filter((F.col("event_type") == "error") & (F.col("ts") >= F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    ref = (
        ev.select("user_id")
        .distinct()
        .join(s0, "user_id", "left")
        .join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.t_signup, r.t_click, r.t_error) for r in got] == [
        (r.user_id, r.t0, r.t1, r.t2) for r in ref
    ]


def test_null_users_never_convert(spark):
    """Window partitioning groups NULL users together, but join-chain
    semantics (and the SQL oracle) never match NULL keys — the NULL-user
    row must report n_steps = 0, not conversions fabricated from
    unrelated anonymous events (regression)."""
    events = spark.createDataFrame(
        [
            (None, datetime(2024, 1, 1, 0, 0, 0), "A"),
            (None, datetime(2024, 1, 1, 0, 0, 5), "B"),
            (1, datetime(2024, 1, 1, 0, 0, 1), "A"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    rows = {r.user_id: r for r in funnel(events, ["A", "B"], ts="ts").collect()}
    assert rows[None].n_steps == 0
    assert rows[None].t_A is None and rows[None].t_B is None
    assert rows[1].n_steps == 1


def test_single_exchange_plan(spark, events):
    out = funnel(events, ["A", "B", "C"], ts="ts")
    out.collect()
    plan = plan_str(out)
    # AQE's toString prints the Final Plan AND an Initial Plan echo —
    # count exchanges only in the executed (final) section.
    final = plan.split("== Initial Plan ==")[0]
    # k windows + final agg share one hash partitioning on user_id: the
    # only exchange is that one shuffle, never one per step.
    assert final.count("Exchange hashpartitioning") == 1, plan
