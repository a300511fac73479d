"""Micro-batch cadence measurement for the r11 streaming monitors
(VERDICT r11 ask #6): drive ``stream_drift_by`` and ``stream_validate``
over a generated fixture whose events table is a DIRECTORY of part files,
split into many micro-batches via ``maxFilesPerTrigger`` — the measured
witness for the "two jobs per batch" (drift) / "one rule-fold scan per
batch" (validate) claims that were previously pytest-pinned but never
timed. Also runs each monitor single-batch on the same data, so the
per-micro-batch overhead (scheduling + state bookkeeping + parquet append)
is separable from the data work.

Writes BENCH_STREAMING.json at the repo root:

  {"sf_dir": .., "n_events": .., "monitors": {name: {
     "batches": .., "wall_sec": .., "batches_per_sec": ..,
     "rows_per_sec": .., "single_batch_wall_sec": ..,
     "per_batch_overhead_sec": ..}}, ...sentinels}

Usage: python tools/bench_streaming.py [sf_dir] [max_files_per_trigger]
(defaults: testdata_sf/sf1, 2 -> 16 micro-batches over 32 part files)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "testdata_sf/sf1")
    mfpt = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if not os.path.isdir(os.path.join(sf_dir, "events.parquet")):
        print(
            "cadence needs a directory-layout events fixture — generate "
            f"with: python tools/gen_sf.py 1 {sf_dir}"
        )
        return 2

    from bench import gate_whole_run
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-bench-streaming")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # whole-run sentinel gate (VERDICT r14 #7)
    out = gate_whole_run(jit_after_max_sec=None, run_fn=lambda attempt: _measure(spark, cpus, sf_dir, mfpt, attempt))
    path = os.path.join(ROOT, "BENCH_STREAMING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


def _measure(spark, cpus: int, sf_dir: str, mfpt: int, attempt: int) -> dict:
    from bench import _cpu_jiffies, _jit_probe, warmup
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_by_once,
        stream_validate_once,
    )
    from mortar_parquet_support_spark.tables import read_events_raw

    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 21_000 + 100_000 * attempt)
    jif0, steal0 = _cpu_jiffies()

    n_events = read_events_raw(spark, sf_dir).count()
    monitors = {
        "stream_drift_by": stream_drift_by_once,
        "stream_validate": stream_validate_once,
    }
    results: dict[str, dict] = {}
    for name, fn in monitors.items():
        t0 = time.perf_counter()
        out = fn(spark, sf_dir, reader_options={"maxFilesPerTrigger": mfpt})
        batches = out.select("batch_id").distinct().count()
        wall = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        out1 = fn(spark, sf_dir)
        single_batches = out1.select("batch_id").distinct().count()
        single_wall = round(time.perf_counter() - t0, 3)
        results[name] = {
            "batches": batches,
            "wall_sec": wall,
            "batches_per_sec": round(batches / wall, 3) if wall else None,
            "rows_per_sec": round(n_events / wall, 1) if wall else None,
            "single_batch_wall_sec": single_wall,
            "single_batches": single_batches,
            # marginal cost of splitting the same data into `batches`
            # micro-batches instead of one: scheduling + per-batch state
            # bookkeeping + one parquet append per batch
            "per_batch_overhead_sec": round(
                (wall - single_wall) / max(batches - single_batches, 1), 4
            ),
        }

    jit_after = _jit_probe(spark, 21_500 + 100_000 * attempt)
    jif1, steal1 = _cpu_jiffies()
    out = {
        "sf_dir": sf_dir,
        "n_events": n_events,
        "max_files_per_trigger": mfpt,
        "monitors": results,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2)
        if jif1 > jif0
        else None,
    }
    return out


if __name__ == "__main__":
    raise SystemExit(main())
