"""Mergeable-sketch rollups: pay the raw scan once, answer coarser
aggregations from sketch state forever after.

The 100 TB pattern this enables (the lambda-architecture "rollup reuse"
trick): a nightly job computes per-(hour, key) HLL sketches of e.g.
distinct users — one scan of the raw events. Daily / weekly / all-time
distinct counts are then answered by UNIONING the stored sketches
(`hll_union_agg`), which touches kilobytes of sketch state instead of
rescanning terabytes of raw rows. HLL union preserves the distinct set's
sketch information: in sparse mode the re-aggregated estimate equals a
direct coarse-grained sketch of the raw data exactly; in dense mode the
Datasketches union gadget (internally HLL_8) can differ from a directly
built HLL_4 sketch by well under ±1% — never more than the sketch's own
~1.6% error bound at lg_k=12 (tested at both regimes).

Built on Spark's native Datasketches bindings (`hll_sketch_agg`,
`hll_union_agg`, `hll_sketch_estimate`) — JVM-side, mergeable across
partitions, fixed memory per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    *,
    ts: str,
    bucket: str,
    keys: list[str],
    distinct_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """One raw scan -> per-(time-bucket, keys) HLL sketch columns
    (``<col>_sketch``) plus an exact row count. Output is the compact,
    mergeable representation to persist."""
    aggs = [
        F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"{c}_sketch")
        for c in distinct_cols
    ]
    return (
        df.groupBy(F.window(F.col(ts), bucket).alias("w"), *keys)
        .agg(*aggs, F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket"),
            *keys,
            *[f"{c}_sketch" for c in distinct_cols],
            "n",
        )
    )


def hll_reaggregate(
    sketches: DataFrame,
    *,
    group_cols: list[str],
    sketch_cols: list[str],
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain WITHOUT touching raw
    data: union the sketch state per group and estimate. Row counts sum
    exactly alongside.

    ``allow_different_lg_k=True`` tolerates stored sketches built with
    different ``lg_k`` values (a job that raised precision mid-history —
    exactly the long-lived lambda-architecture table this module targets);
    the union downgrades to the coarsest config. Left strict by default so
    an UNINTENDED precision mix still fails loudly."""
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(f"{c}_sketch"), allow_different_lg_k)
        ).alias(f"{c}_distinct")
        for c in sketch_cols
    ]
    return sketches.groupBy(*group_cols).agg(*aggs, F.sum("n").alias("n"))


def hll_estimate(sketches: DataFrame, *, sketch_cols: list[str]) -> DataFrame:
    """Estimate in place: swap each ``<col>_sketch`` for ``<col>_distinct``."""
    out = sketches
    for c in sketch_cols:
        out = out.withColumn(
            f"{c}_distinct", F.hll_sketch_estimate(F.col(f"{c}_sketch"))
        ).drop(f"{c}_sketch")
    return out
