"""Skew-mitigation plan shapes: salted two-phase aggregation.

A groupBy on a skewed key concentrates one key's rows in one reduce task
— AQE can split skewed JOIN partitions but an aggregation GROUP can
never be split, so a single hot key (one domain with 30% of a crawl, a
NULL user id holding a third of the events) is a hard scale ceiling.
The fix is the classic two-phase shape: shuffle FIRST on (key, salt)
so every task gets 1/buckets of the hot key, partially aggregate, then
re-aggregate the (keys x buckets)-bounded partials on the key alone.
Algebra is preserved for the decomposable aggregates (count/sum/min/max
and avg as sum/count); the second exchange carries at most
keys x buckets rows — model-sized, never data-sized.

Spark's own hash aggregate already does map-side partials, which makes
plain groupBy fine MOST of the time — salting matters when the
REDUCE-side per-key state is itself the problem (extreme row counts per
key overwhelming one task's spill budget, or partial aggregation
disabled by distinct-like state). `skew_report`
(operators/profile.py) is the measurement that says which keys need
this.

Measured evidence (tools/bench_skew.py -> BENCH_SKEW.json; 20M rows,
one key owning 30%, local[32], r10):

- routing, the part that transfers to a real cluster unchanged: the
  max-reduce-task input drops from 6.44M rows (14.7x the median task)
  under key-partitioning to 1.19M (1.9x) under (key, salt) — the salt
  caps any task at ~1/buckets of a hot key, exactly as designed;
- wall-time, honestly: direct groupBy WON both regimes on this single
  128 GB JVM (scalar 0.68s vs 1.99s salted; collect_set 1.92s vs 8.15s)
  — map-side partials collapse the hot key per task even for
  collect_set when distinct-values << hot-rows, and the salted plan
  pays a keys x buckets map-state blowup plus a second exchange.

Decision rule (what the two numbers together mean): salt when
`skew_report` shows a top-key share whose max-task INPUT would exceed
what one executor can hold/spill (share x rows x row-bytes vs executor
memory) or visibly straggle the stage — that is the regime local[32]
cannot exhibit (no per-executor memory wall, in-memory shuffle) and
where the 14.7x -> 1.9x routing cap is the difference between an OOM
retry loop and a balanced stage. Below that wall, direct groupBy's
partial aggregation is already the optimal plan and salting is pure
overhead. For per-key state that partial aggregation cannot shrink at
all (window functions, applyInPandas), salting the AGGREGATE does not
apply — restructure the computation instead (sessionize's bounded
windows, incremental probes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (phase-1 fn, phase-2 fn); avg is handled separately
#: as a sum/count pair so the re-aggregation stays exact, collect_set
#: separately as partial-set union.
_DECOMPOSABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: "list[str]",
    aggs: "dict[str, tuple[str, str]]",
    *,
    buckets: int = 32,
    salt_col: "str | Column | None" = None,
) -> DataFrame:
    """Two-phase aggregate for skewed keys: ``aggs`` maps output name ->
    (column, fn) with fn in {count, sum, min, max, avg, collect_set}.
    Results equal the direct ``groupBy(keys).agg(...)`` exactly
    (count/sum/min/max are algebraically decomposable; avg re-aggregates
    as exact sum/count; collect_set as partial-set union — returned
    SORTED for determinism, since set order is unspecified either way) —
    the plan is what changes: phase 1 shuffles on (keys, salt) so no
    reduce task owns more than ~1/``buckets`` of any key, phase 2
    shuffles only the bounded partials.

    ``collect_set`` is the fn where salting pays at scale: unlike the
    scalar aggregates (whose map-side partials already collapse a hot
    key to one row per task — direct groupBy is fine), its reduce-side
    state is value-set-sized, so the hot key's single reduce task in the
    direct plan hash-merges the key's ENTIRE row stream; phase 1 spreads
    that merge over ``buckets`` tasks and phase 2 only unions the
    already-deduped partial sets (bounded by buckets x distinct-values,
    not rows). tools/bench_skew.py is the measured comparison.

    The salt defaults to a deterministic per-row hash of ALL columns
    (xxhash64 % buckets) — re-runs produce identical partials; pass
    ``salt_col`` to salt on something cheaper or coarser. NULL keys form
    a group like groupBy does. ``avg`` of an empty/all-NULL group is
    NULL, exactly as direct aggregation yields."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not aggs:
        raise ValueError("salted_agg needs at least one aggregate")
    for name, (col, fn) in aggs.items():
        if fn not in (*_DECOMPOSABLE, "avg", "collect_set"):
            raise ValueError(
                f"aggregate {name}={fn!r} is not decomposable "
                f"(supported: {sorted((*_DECOMPOSABLE, 'avg', 'collect_set'))})"
            )
    keys = list(keys)
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
        if salt_col is None
        else (F.col(salt_col) if isinstance(salt_col, str) else salt_col)
    )
    phase1_exprs, phase2_exprs = [], []
    for name, (col, fn) in aggs.items():
        if fn == "collect_set":
            phase1_exprs.append(F.collect_set(col).alias(f"__p_{name}"))
            phase2_exprs.append(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(f"__p_{name}")))
                ).alias(name)
            )
        elif fn == "avg":
            phase1_exprs.append(F.sum(col).alias(f"__s_{name}"))
            phase1_exprs.append(
                F.count(F.col(col)).alias(f"__c_{name}")
            )
            phase2_exprs.append(
                (
                    F.sum(f"__s_{name}")
                    / F.when(F.sum(f"__c_{name}") > 0, F.sum(f"__c_{name}"))
                ).alias(name)
            )
        else:
            p1, p2 = _DECOMPOSABLE[fn]
            phase1_exprs.append(p1(F.col(col)).alias(f"__p_{name}"))
            phase2_exprs.append(p2(f"__p_{name}").alias(name))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_exprs)
    )
    return partial.groupBy(*keys).agg(*phase2_exprs)
