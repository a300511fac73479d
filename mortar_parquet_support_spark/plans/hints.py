"""Size-guarded join hints.

A hardcoded ``F.broadcast(filtered_fact)`` is right at benchmark scale and
wrong at 100 TB: a post-filter orders table can exceed executor memory, and
the hint FORCES the broadcast regardless (hints override the planner's size
check). ``maybe_broadcast`` applies the hint only when Catalyst's own size
estimate for the frame fits under the session's broadcast threshold —
below it you get the guaranteed-broadcast plan (and plan tests can assert
it); above it the hint disappears and AQE picks the strategy from runtime
sizes, exactly what you want on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {
    "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
    "p": 1 << 50,  # JavaUtils accepts pebibytes too
}


def _parse_bytes(conf: str) -> int:
    """Parse Spark's byte-size conf syntax ('10485760', '10MB', '1g',
    '-1' = disabled). Multiply BEFORE truncating ('1.5g' is 1.5 GiB, not
    1 GiB — review finding r8)."""
    s = conf.strip().lower().removesuffix("b")
    if not s:
        return -1
    mult = 1
    if s and s[-1] in _UNITS:
        mult = _UNITS[s[-1]]
        s = s[:-1]
    try:
        return int(float(s) * mult)
    except ValueError:
        return -1


def maybe_broadcast(df: DataFrame, *, threshold: int | None = None) -> DataFrame:
    """Broadcast hint iff Catalyst's size estimate fits the threshold
    (defaults to the session's ``spark.sql.autoBroadcastJoinThreshold``).

    The estimate comes from the optimized logical plan — file sizes for
    scans, propagated through projections/filters — the same signal the
    planner itself uses, read BEFORE forcing its hand. Returns ``df``
    unchanged when broadcasting is disabled (threshold < 0) or the
    estimate is unavailable.
    """
    spark = df.sparkSession
    if threshold is None:
        threshold = _parse_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        )
    if threshold < 0:
        return df
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df
    return F.broadcast(df) if 0 <= size <= threshold else df
