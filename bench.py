"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query is materialized through the ``noop`` sink — full plan execution,
zero driver-collect overhead — so timings measure engine throughput, not
row serialization to Python. A warmup action amortizes JVM/codegen startup
out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: every family SURVEY §2 + north-star covers, weighted
# toward the plans whose physical shape matters at scale (shuffles, joins,
# windows, LSH self-joins).
# Queries whose first run lands under this take the MEDIAN of 3 runs —
# sub-second timings proved round-to-round noisy (±70%) on unchanged
# plans; multi-second ones stay single-run (see the loop comment).
MEDIAN3_BELOW_SEC = 1.0
# ...plus named exceptions: multi-second entries whose round-to-round
# drift proved NOT proportionally small — dedup_minhash swung 2.24s ->
# 3.05s (+36%) on an unchanged plan in r11 (its eager materialize
# barriers make it GC/page-cache sensitive), tpch_q3 1.07s -> 0.68s.
# The r9 median-of-3 rationale applies to them verbatim. knn_ivf_build
# joined the median policy in round 12 (+23% r10->r11 swing on unchanged
# code); each of its 3 runs is a REAL build via ivf_index_rebuild, the
# memoization bypassed and the prior index unpersisted.
MEDIAN3_ALWAYS = {"dedup_minhash", "tpch_q3"}

HEADLINE = [
    "flagship_scan",
    "semi_join_ids",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "group_distinct",
    # the no-Expand HLL scale path benched alongside its exact twin so the
    # sketch-vs-Expand gap stays measured (see _group_distinct docstring)
    "group_distinct_approx",
    "window_topk",
    "time_bucket_rollup",
    "sessionize",
    "asof_join",
    "dedup_exact",
    "dedup_minhash",
    "knn_cosine",
    "knn_cosine_arrow",
    "knn_ivf",
    "text_metrics",
    "text_quality",
    "tpch_q10",
    "tpch_q18",
    "range_join",
    # round 8 additions: funnel (chained-window plan) and hashed linear
    # classifier (broadcast weight join). incremental_dedup is NOT
    # headlined: at fixture scale its wall time is fixed job overhead
    # (index open + bloom collect + three tiny joins over 5k rows), which
    # would add gate noise without measuring anything that scales; its
    # correctness entry and plan-shape tests stay, and the probe plan is
    # broadcast-only by construction (test_incremental.py).
    "funnel_steps",
    "linear_classifier",
]


def _cpu_jiffies() -> tuple[int, int]:
    """(total, steal) jiffies from /proc/stat line 1. Steal accumulating
    DURING the run is hypervisor-level contention — time the VM wanted CPU
    but the host gave it to someone else — invisible to process listings
    and to load average inside the guest."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except Exception:
        return 0, 0


def _jit_probe(spark, salt: int) -> float:
    """Compile-speed sentinel: a plan this session has NEVER seen (distinct
    literals + aliases defeat the plan/codegen caches), so the timing is
    dominated by analysis + whole-stage codegen + Janino/JIT compile — the
    driver-side cost that dominates first-run query latency at small SF and
    drifts with the host's JIT throughput. Run before AND after the query
    loop; if both are multiples of their historical ~0.3-0.5s, the whole
    run's first-execution timings are inflated by the environment, not by
    plan changes."""
    t0 = time.perf_counter()
    spark.range(100_000).selectExpr(
        *[f"sum(id * {salt + i}) as s_{salt}_{i}" for i in range(40)]
    ).collect()
    return round(time.perf_counter() - t0, 3)


def gate_whole_run(
    run_fn,
    *,
    steal_max_pct: float = 0.5,
    jit_after_max_sec: float | None = 0.45,
    max_attempts: int = 3,
) -> dict:
    """Whole-artifact sentinel gate for the tools/ benches (VERDICT r14
    "Next round" #7: every timing artifact gets the gate bench.py's own
    suite got in r14, not just a recorded-but-unenforced sentinel).

    ``run_fn(attempt)`` executes the tool's ENTIRE measured body and
    returns its artifact dict, which must carry ``steal_pct`` and (if it
    probes JIT) ``jit_sentinel_after_sec``; the attempt index is passed
    so the body can rotate its jit-probe salts (a retry that reuses the
    previous salts could hit the codegen cache and pass a noisy run as
    clean — the r14 bench.py lesson). The first in-band attempt ships;
    if none is, the LAST ships with an explicit ``noise_annotation`` —
    noisy numbers are published as noisy, never silently.

    The tools/ callers pass ``jit_after_max_sec=None`` (steal-only
    band, jit recorded but not gated) deliberately: a whole-run retry
    re-compiles the body's full stage set, so by attempt 2 the jit
    probe measures the session's own accumulated code-cache pressure,
    not the machine — observed 0.309s -> 0.959s between attempts of an
    IDENTICAL body while steal went clean (BENCH_SF100 first regen).
    bench.py's own suite keeps both legs: its session compiles a
    bounded, small stage set per attempt, which is what the 0.45s band
    was calibrated on."""
    attempts = []
    for attempt in range(max_attempts):
        result = run_fn(attempt)
        sp = result.get("steal_pct")
        ja = result.get("jit_sentinel_after_sec")
        # an UNMEASURABLE steal (None: /proc/stat unreadable or a zero
        # jiffy delta) is NOT clean — the gate cannot vouch for a run it
        # could not measure (review r15; bench.py's own suite makes the
        # opposite call because its artifact exposes the raw None for
        # the driver to judge, but this helper's whole contract is the
        # clean-or-annotated verdict)
        clean = (sp is not None and sp <= steal_max_pct) and (
            jit_after_max_sec is None or ja is None or ja <= jit_after_max_sec
        )
        attempts.append((result, clean))
        if clean:
            break
    picked = next((r for r, c in attempts if c), attempts[-1][0])
    any_clean = any(c for _, c in attempts)
    picked["sentinel_gate"] = {
        "attempts": len(attempts),
        "band_steal_pct": steal_max_pct,
        "band_jit_after_sec": jit_after_max_sec,
        "clean": any_clean,
        "per_attempt_steal_pct": [r.get("steal_pct") for r, _ in attempts],
        "per_attempt_jit_after_sec": [
            r.get("jit_sentinel_after_sec") for r, _ in attempts
        ],
    }
    if any_clean:
        annotation = None
    elif all(r.get("steal_pct") is None for r, _ in attempts):
        annotation = (
            "steal is unmeasurable on this host (/proc/stat) — the gate "
            "could not run; timings are ungated"
        )
    else:
        band = f"steal<={steal_max_pct}%"
        if jit_after_max_sec is not None:  # jit leg may be advisory-only
            band += f", jit_after<={jit_after_max_sec}s"
        annotation = (
            f"ALL {len(attempts)} attempts out of sentinel band ({band}) "
            "— timings are machine-noise-inflated; last attempt shown"
        )
    picked["noise_annotation"] = annotation
    return picked


def best_of(fn, runs: int = 3) -> float:
    """min-of-N steady-state wall for a thunk — the one spelling the
    profile tools share (profile_minhash and profile_ivf each had a
    verbatim copy; review r12)."""
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def warmup(spark, cpus: int) -> tuple[float, float]:
    """Shared session warmup: JVM/codegen startup + Python/Arrow worker
    pool spawn (one per core, reused afterwards), then a steady-state
    probe. Returns (warmup_first_sec, warmup_sec). The SECOND number is
    the contention sentinel: pure fixed work (~0.1-0.3s idle) — a
    multiple of that means the run was co-tenant-loaded and the query
    timings are inflated by the machine, not the plans (observed 3.6x
    whole-suite spread from contention). bench_scaling.py reuses this so
    both harnesses warm identically."""

    def _identity(batches):
        yield from batches

    t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, 1_000, 1, cpus).mapInArrow(_identity, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    t1 = time.perf_counter()
    spark.range(1_000_001).selectExpr("sum(id)").collect()  # steady-state probe
    return round(t1 - t0, 3), round(time.perf_counter() - t1, 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-bench")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    warmup_first_sec, warmup_sec = warmup(spark, cpus)
    # Warm the OS page cache over the inputs: timings should measure the
    # engine, not whether the VM's virtual disk happens to have the files
    # cached (observed 3-4x whole-suite swings from cold page cache alone).
    import glob as _glob

    def _warm(path):
        with open(path, "rb") as f:
            while f.read(1 << 22):
                pass

    for p in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        if os.path.isdir(p):  # generated fixtures are parquet DIRECTORIES
            for q in sorted(_glob.glob(os.path.join(p, "*.parquet"))):
                _warm(q)
        else:
            _warm(p)

    qs = entrymod.queries()

    # Sentinel gate (VERDICT r13 "Next round" #2): the r13 artifact was
    # noise-contaminated (steal 0.04 -> 0.49, jit_after +56% on fixed
    # work) and a real regression next round would hide inside it. The
    # whole timed suite now re-runs (up to MAX_ATTEMPTS) when its own
    # sentinels land out of band, and if NO attempt is clean the best
    # one ships with an explicit noise_annotation — never silently.
    # Bands from the r11/r12 idle runs: steal <= 0.2%, jit_after <= 0.45s
    # (historical idle 0.3-0.35s + 30% headroom).
    STEAL_MAX_PCT = 0.2
    JIT_AFTER_MAX_SEC = 0.45
    MAX_ATTEMPTS = 3

    attempts = []
    for _attempt in range(MAX_ATTEMPTS):
        attempts.append(_run_suite(spark, entrymod, qs, sf_dir, _attempt))
        a = attempts[-1]
        a["sentinels_clean"] = bool(
            (a["steal_pct"] is None or a["steal_pct"] <= STEAL_MAX_PCT)
            and a["jit_sentinel_after_sec"] <= JIT_AFTER_MAX_SEC
        )
        if a["sentinels_clean"]:
            break
    clean = [a for a in attempts if a["sentinels_clean"]]
    picked = clean[0] if clean else min(attempts, key=lambda a: a["total"])
    noise_annotation = None
    if not clean:
        noise_annotation = (
            f"ALL {len(attempts)} attempts out of sentinel band "
            f"(steal<={STEAL_MAX_PCT}%, jit_after<={JIT_AFTER_MAX_SEC}s): "
            + "; ".join(
                f"attempt{i}: steal={a['steal_pct']}% "
                f"jit_after={a['jit_sentinel_after_sec']}s "
                f"total={a['total']}s"
                for i, a in enumerate(attempts)
            )
            + " — timings are machine-noise-inflated, best attempt shown"
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": picked["total"],
                "unit": "sec",
                "warmup_sec": warmup_sec,
                "warmup_first_sec": warmup_first_sec,
                # drift sentinels: jit_* is fresh-plan compile speed (driver
                # JVM); steal_pct is hypervisor CPU steal across the query
                # loop. Historical idle values: jit ~0.3-0.5s, steal ~0%.
                "jit_sentinel_before_sec": picked["jit_sentinel_before_sec"],
                "jit_sentinel_after_sec": picked["jit_sentinel_after_sec"],
                "steal_pct": picked["steal_pct"],
                "sentinel_gate": {
                    "attempts": len(attempts),
                    "picked_attempt": attempts.index(picked),
                    "clean": bool(clean),
                    "per_attempt_totals": [a["total"] for a in attempts],
                },
                "noise_annotation": noise_annotation,
                "prewarm_sec": picked["prewarm_sec"],
                # queries reported as median-of-3 (first run < 1s);
                # everything else is single-run
                "median3": picked["median3"],
                "queries": picked["timings"],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


def _run_suite(spark, entrymod, qs, sf_dir: str, attempt: int = 0) -> dict:
    """ONE full pass over HEADLINE (prewarm + timed runs + sentinels) —
    the retry unit of the sentinel gate in main(). The jit-probe salts
    shift with the attempt index: a retry that reused the previous
    attempt's salts could hit Spark's codegen cache, return a
    cached-compile time, and pass a still-noisy run as clean — the
    probe's whole premise is a plan this session has never seen."""
    jit_before = _jit_probe(spark, 1_000 + 100_000 * attempt)

    # Plan-compile warmup: run each headline query once at sf0.001 (~600x
    # less data) IMMEDIATELY BEFORE its timed run, so whole-stage codegen
    # compiles each plan's classes right when they're about to be reused.
    # The timed numbers then measure engine THROUGHPUT at sf0.1, not
    # Janino/JIT compile time, which (a) is a constant that amortizes to
    # nothing at real scale and (b) proved to drift 3-7x with host JIT
    # throughput between rounds, drowning the signal the bench exists to
    # track. Interleaving matters: a prewarm-all-then-time-all pass LOSES
    # most of its effect because Spark's generated-code cache is a bounded
    # LRU (~100 compiled units) and 20 queries' codegen stages exceed it —
    # the early queries' classes are evicted before the timed loop reaches
    # them (measured: tpch_q3 2.3s batched vs 1.5s interleaved). The
    # warmup's own cost is recorded (prewarm_sec), nothing is hidden.
    prewarm_dir = "/root/testdata/sf0.001"
    do_prewarm = os.path.isdir(prewarm_dir) and os.path.abspath(
        prewarm_dir
    ) != os.path.abspath(sf_dir)
    prewarm_sec = 0.0
    jif0, steal0 = _cpu_jiffies()

    timings: dict[str, float] = {}
    median3: list[str] = []
    for name in HEADLINE:
        if do_prewarm:
            t0 = time.perf_counter()
            try:
                if name == "knn_ivf":
                    entrymod.ivf_index_for(spark, prewarm_dir)
                qs[name](spark, prewarm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass  # a prewarm failure only costs warm cache, never the run
            prewarm_sec += time.perf_counter() - t0
        if name == "knn_ivf":
            # Build/probe split: the one-time index build (centroid seeding
            # + Lloyd refinement + persisted assignment scan) is amortized
            # across query batches in the serving shape, so it is timed as
            # its own line; "knn_ivf" then measures the per-batch PROBE on
            # the memoized index. Both lines count toward the total.
            # Median-of-3 (round 12 noise discipline): three fresh builds,
            # the last staying memoized for the probe below.
            build_runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                entrymod.ivf_index_rebuild(spark, sf_dir)
                build_runs.append(time.perf_counter() - t0)
            timings["knn_ivf_build"] = round(sorted(build_runs)[1], 3)
            median3.append("knn_ivf_build")
        # The timer wraps plan CONSTRUCTION too, not just execution: some
        # operators (minhash LSH) eagerly materialize intermediate frames
        # inside the callable, and timing only the final write would
        # silently exclude that work.
        def _time_once() -> float:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        first = _time_once()
        if first < MEDIAN3_BELOW_SEC or name in MEDIAN3_ALWAYS:
            # Sub-second queries are where single-run noise (a stray GC, a
            # page-cache miss, one slow task) swamps the signal — observed
            # range_join 0.34s vs 0.58s round to round on an UNCHANGED
            # 1-exchange plan. Median of 3 runs makes round comparisons
            # track plan changes, not scheduler jitter; multi-second
            # queries stay single-run (noise is proportionally small and
            # re-running them would triple bench wall time for nothing).
            runs = sorted([first, _time_once(), _time_once()])
            timings[name] = round(runs[1], 3)
            median3.append(name)
        else:
            timings[name] = round(first, 3)
    prewarm_sec = round(prewarm_sec, 3)

    jit_after = _jit_probe(spark, 2_000 + 100_000 * attempt)
    jif1, steal1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2) if jif1 > jif0 else None
    )

    return {
        "total": round(sum(timings.values()), 3),
        "timings": timings,
        "median3": median3,
        "prewarm_sec": prewarm_sec,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": steal_pct,
    }


if __name__ == "__main__":
    raise SystemExit(main())
