"""salted_agg (plans/skew.py): two-phase skew-safe aggregation must equal
the direct groupBy and carry the (key, salt) first exchange."""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.plans.skew import salted_agg
from tests.conftest import plan_str


def test_salted_agg_equals_direct(spark):
    rows = (
        [("hot", float(i % 97)) for i in range(5000)]
        + [("cold", float(i)) for i in range(50)]
        + [(None, 7.0), ("hot", None)]
    )
    df = spark.createDataFrame(rows, "k string, v double")
    out = {
        r.k: r
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("v", "count"),
                "s": ("v", "sum"),
                "m": ("v", "avg"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            buckets=8,
        ).collect()
    }
    direct = {
        r.k: r
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.avg("v").alias("m"), F.min("v").alias("lo"), F.max("v").alias("hi"),
        )
        .collect()
    }
    assert set(out) == set(direct)
    for k, d in direct.items():
        g = out[k]
        assert g.n == d.n and g.lo == d.lo and g.hi == d.hi, k
        assert abs(g.s - d.s) < 1e-6 and abs(g.m - d.m) < 1e-9, k
    # all-NULL values group: count 0, NULL sum/avg/min/max like groupBy
    dfn = spark.createDataFrame([("x", None), ("x", None)], "k string, v double")
    rn = salted_agg(dfn, ["k"], {"n": ("v", "count"), "m": ("v", "avg")}).collect()[0]
    assert rn.n == 0 and rn.m is None


def test_salted_agg_collect_set(spark):
    """collect_set decomposes as partial-set union (the state-heavy fn
    where salting actually pays — see the docstring); result is the
    direct groupBy's set, returned sorted; NULL values dropped like
    collect_set does; all-NULL group yields an empty array."""
    rows = (
        [("hot", i % 13) for i in range(2000)]
        + [("cold", i) for i in range(5)]
        + [("hot", None), ("nul", None)]
    )
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        r.k: list(r.vals)
        for r in salted_agg(
            df, ["k"], {"vals": ("v", "collect_set")}, buckets=8
        ).collect()
    }
    direct = {
        r.k: sorted(r.vals)
        for r in df.groupBy("k")
        .agg(F.collect_set("v").alias("vals"))
        .collect()
    }
    assert got == direct
    assert got["hot"] == list(range(13)) and got["nul"] == []


def test_salted_agg_plan_and_validation(spark):
    df = spark.createDataFrame([("a", 1.0)] * 100, "k string, v double")
    out = salted_agg(df, ["k"], {"s": ("v", "sum")}, buckets=4)
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    # two exchanges: (k, salt) then (k)
    assert "__salt" in plan and plan.count("Exchange") >= 2
    with pytest.raises(ValueError, match="decomposable"):
        salted_agg(df, ["k"], {"d": ("v", "count_distinct")})
    with pytest.raises(ValueError, match="buckets"):
        salted_agg(df, ["k"], {"s": ("v", "sum")}, buckets=0)
    with pytest.raises(ValueError, match="at least one"):
        salted_agg(df, ["k"], {})
