"""Skew end-to-end proof (VERDICT r9 ask #6): measure direct groupBy vs
salted_agg on a deliberately hot-key frame — one key owning ~30% of all
rows — and record BOTH wall-times AND the per-reduce-task routing
imbalance the salt exists to fix.

Writes BENCH_SKEW.json at the repo root:

  {"n_rows": .., "hot_share_measured": ..,
   "routing": {"direct_max_task_rows": .., "direct_median_task_rows": ..,
               "salted_max_task_rows": .., "salted_median_task_rows": ..,
               "imbalance_direct": .., "imbalance_salted": ..},
   "scalar": {"direct_sec": .., "salted_sec": .., "equal": true},
   "collect_set": {"direct_sec": .., "salted_sec": .., "equal": true},
   ...sentinels}

Two aggregate regimes, measured separately because their skew stories
differ (plans/skew.py docstring):

- scalar (count/sum/avg): map-side partials collapse the hot key to one
  row per map task, so direct groupBy is expected to be FINE — this
  measurement documents that salting is NOT needed here (and what its
  overhead costs when applied anyway);
- collect_set: reduce state is value-set-sized and the direct plan's
  single hot-key reduce task merges every partial of the hot key —
  the regime where the salt spreads the merge.

The routing measurement is plan-independent ground truth: rows are
hashed to ``buckets`` reduce sides exactly as the two plans' first
exchanges would route them (key vs key+salt), and the max/median task
input is reported. Wall-times on local[32] share one machine's memory
bus, so the routing numbers are the part that transfers to a real
cluster unchanged: a reduce task capped at ~1/buckets of a hot key
cannot be the straggler/OOM that the 30%-of-everything task is.

Usage: python tools/bench_skew.py [n_rows] (default 20_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = 3  # best-of-3, same convention as bench_scaling
BUCKETS = 32
N_KEYS_COLD = 20_000
DISTINCT_VALS = 50_000


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000

    from bench import gate_whole_run
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-bench-skew")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # whole-run sentinel gate (VERDICT r14 #7): the measured body re-runs
    # until its own steal/JIT sentinels land in band, else annotates
    out = gate_whole_run(jit_after_max_sec=None, run_fn=lambda attempt: _measure(spark, cpus, n_rows, attempt))
    path = os.path.join(ROOT, "BENCH_SKEW.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


def _measure(spark, cpus: int, n_rows: int, attempt: int) -> dict:
    from pyspark.sql import functions as F

    from bench import _cpu_jiffies, _jit_probe, warmup
    from mortar_parquet_support_spark.plans.skew import salted_agg

    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 9_000 + 100_000 * attempt)
    jif0, steal0 = _cpu_jiffies()

    # deterministic hot-key frame: key 'hot' for ~30% of rows (xxhash64
    # bucketed), else 20k cold keys; one numeric column for the scalar
    # regime, one bounded-cardinality value column for the set regime.
    # Materialized to parquet so every timed plan pays an identical scan
    # (timing generation+agg would hide the agg behind the range codegen).
    fixture = os.path.join(ROOT, "spark-warehouse", f"skew_fixture_{n_rows}")
    # _SUCCESS-guarded, not bare isdir: an interrupted multi-minute write
    # leaves a partial dir every later run (and gate retry) would silently
    # reuse as complete (review r15; the bench_sf100 stress corpus rule)
    if not os.path.exists(os.path.join(fixture, "_SUCCESS")):
        (
            spark.range(n_rows)
            .select(
                F.when(
                    F.pmod(F.xxhash64("id"), F.lit(10)) < 3, F.lit("hot")
                )
                .otherwise(
                    F.concat(
                        F.lit("k"),
                        F.pmod(F.xxhash64("id"), F.lit(N_KEYS_COLD)).cast(
                            "string"
                        ),
                    )
                )
                .alias("k"),
                (F.col("id") % 997).cast("double").alias("num"),
                F.pmod(F.xxhash64(F.col("id") + 13), F.lit(DISTINCT_VALS))
                .alias("val"),
            )
            .write.mode("overwrite")
            .parquet(fixture)
        )
    df = spark.read.parquet(fixture)
    hot_share = (
        df.filter(F.col("k") == "hot").count() / df.count()
    )

    def timed(make_df):
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            make_df().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    # --- routing ground truth: rows per reduce task under each shape ---
    def task_rows(*cols):
        per = (
            df.repartition(BUCKETS, *cols)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        ns = sorted((r.n for r in per), reverse=True)
        return ns[0], ns[len(ns) // 2]

    salt = F.pmod(F.xxhash64("k", "num", "val"), F.lit(BUCKETS))
    d_max, d_med = task_rows(F.col("k"))
    s_max, s_med = task_rows(F.col("k"), salt)

    # --- scalar regime ---
    scalar_direct = timed(
        lambda: df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("num").alias("s"),
            F.avg("num").alias("m"),
        )
    )
    scalar_salted = timed(
        lambda: salted_agg(
            df,
            ["k"],
            {"n": ("num", "count"), "s": ("num", "sum"), "m": ("num", "avg")},
            buckets=BUCKETS,
        )
    )
    chk = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("num").alias("s"))
        .join(
            salted_agg(
                df, ["k"], {"n2": ("num", "count"), "s2": ("num", "sum")},
                buckets=BUCKETS,
            ),
            "k",
        )
        .filter(
            (F.col("n") != F.col("n2"))
            | (F.abs(F.col("s") - F.col("s2")) > 1e-6 * F.abs(F.col("s")))
        )
        .count()
    )
    scalar_equal = chk == 0

    # --- set regime ---
    set_direct = timed(
        lambda: df.groupBy("k").agg(F.collect_set("val").alias("vals"))
    )
    set_salted = timed(
        lambda: salted_agg(
            df, ["k"], {"vals": ("val", "collect_set")}, buckets=BUCKETS
        )
    )
    set_chk = (
        df.groupBy("k")
        .agg(F.array_sort(F.collect_set("val")).alias("a"))
        .join(
            salted_agg(
                df, ["k"], {"b": ("val", "collect_set")}, buckets=BUCKETS
            ),
            "k",
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    set_equal = set_chk == 0

    jit_after = _jit_probe(spark, 9_500 + 100_000 * attempt)
    jif1, steal1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2)
        if jif1 > jif0
        else None
    )

    out = {
        "n_rows": n_rows,
        "buckets": BUCKETS,
        "n_cold_keys": N_KEYS_COLD,
        "distinct_vals": DISTINCT_VALS,
        "hot_share_measured": round(hot_share, 4),
        "runs_per_query": RUNS,
        "routing": {
            "direct_max_task_rows": d_max,
            "direct_median_task_rows": d_med,
            "salted_max_task_rows": s_max,
            "salted_median_task_rows": s_med,
            "imbalance_direct": round(d_max / max(d_med, 1), 2),
            "imbalance_salted": round(s_max / max(s_med, 1), 2),
        },
        "scalar": {
            "direct_sec": scalar_direct,
            "salted_sec": scalar_salted,
            "equal": scalar_equal,
        },
        "collect_set": {
            "direct_sec": set_direct,
            "salted_sec": set_salted,
            "equal": set_equal,
        },
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": steal_pct,
    }
    return out


if __name__ == "__main__":
    raise SystemExit(main())
