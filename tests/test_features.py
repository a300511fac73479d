"""Feature preprocessing (operators/features.py): winsorize clips to
per-group exact percentiles; robust_outliers flags by MAD distance."""

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.features import (
    robust_outliers,
    winsorize,
)


def test_winsorize_hand_computed(spark):
    # group a: 1..10 -> p10=1.9, p90=9.1 (type-7 linear interpolation)
    rows = [("a", float(i)) for i in range(1, 11)] + [("b", 5.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, value="v", keys=["g"], lower=0.1, upper=0.9)
    got = {(r.g, r.v): r.v_winsorized for r in out.collect()}
    assert abs(got[("a", 1.0)] - 1.9) < 1e-9   # clipped up
    assert abs(got[("a", 10.0)] - 9.1) < 1e-9  # clipped down
    assert got[("a", 5.0)] == 5.0              # untouched inside
    assert got[("b", 5.0)] == 5.0              # single-value group
    assert got[("b", None)] is None            # NULL passes through
    with pytest.raises(ValueError, match="lower"):
        winsorize(df, value="v", lower=0.9, upper=0.1)


def test_robust_outliers_mad(spark):
    # median 5, deviations [4,3,2,1,0,1,2,3,4,95] -> MAD = 2.5
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.v: r for r in robust_outliers(df, value="v", n_mads=3.5).collect()}
    med, mad = 5.5, 2.5  # medians of vals and |v - 5.5| resp.
    for v in vals:
        expect = (v - med) / (1.4826 * mad)
        assert abs(out[v].robust_z - expect) < 1e-9, v
    flagged = {v for v, r in out.items() if r.is_outlier}
    assert flagged == {100.0}
    # zero-MAD group: >= half identical -> nothing flagged, NULL z
    dfz = spark.createDataFrame(
        [(5.0,)] * 6 + [(900.0,)], "v double"
    )
    outz = robust_outliers(dfz, value="v").collect()
    assert all(not r.is_outlier for r in outz)
    assert all(r.robust_z is None for r in outz)


def test_winsorize_no_row_side_shuffle(spark):
    from tests.conftest import plan_str

    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(300)], "g int, v double"
    )
    out = winsorize(df, value="v", keys=["g"])
    out.collect()
    plan = plan_str(out).split("== Initial Plan ==")[0]
    # the bounds aggregate shuffles; the row side joins broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
