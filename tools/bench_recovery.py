"""recover_lake at journal scale (VERDICT r13 "Next round" #7): the
recovery probe claims one existence check on the idle path and one
JVM-side byte copy per journal read — but nothing measured a recovery
whose journal names THOUSANDS of partitions. This tool synthesizes a
crashed transaction directly on disk (live files + staged files + the
journal JSON — recovery is pure filesystem mechanics, so the files'
contents are irrelevant) and times:

  - idle_no_maint:   recover on a lake that never had maintenance
                     (the fast path every streaming tick pays)
  - idle_with_maint: recover on a lake with an empty .maint (the
                     steady state after any completed maintenance)
  - roll_forward:    full recovery of an after_journal crash over
                     --parts partitions x --files files each (park
                     every journaled live file, promote every staged
                     file, delete the txn)

Writes BENCH_RECOVERY.json at the repo root and prints one JSON line
with per-partition and per-file milliseconds. The driver-side loop
costs a handful of Hadoop FS calls per partition over py4j; this
artifact is the evidence for whether that holds at journal scale or
needs a JVM-side batch path.

Usage: python tools/bench_recovery.py [--parts 5000] [--files 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid as uuidlib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def synth_crashed_txn(lake: str, parts: int, files: int) -> None:
    """An after_journal crash: every journaled live file still live,
    every staged file still staged, journal committed."""
    txn = os.path.join(lake, ".maint", f"txn-{uuidlib.uuid4().hex}")
    journal: dict[str, list[str]] = {}
    for i in range(parts):
        name = f"collection=c{i:05d}"
        live = os.path.join(lake, name)
        stage = os.path.join(txn, "stage", name)
        os.makedirs(live, exist_ok=True)
        os.makedirs(stage, exist_ok=True)
        rels = []
        for j in range(files):
            rel = f"part-{j:04d}-old.parquet"
            with open(os.path.join(live, rel), "w") as f:
                f.write("old")
            rels.append(rel)
            with open(
                os.path.join(stage, f"part-{j:04d}-new.parquet"), "w"
            ) as f:
                f.write("new")
        journal[name] = rels
    os.makedirs(os.path.join(txn, "backup"), exist_ok=True)
    with open(os.path.join(txn, "journal.json"), "w") as f:
        json.dump({"partitions": journal, "counts_total": parts * files}, f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=5000)
    ap.add_argument("--files", type=int, default=1)
    args = ap.parse_args()

    import tempfile

    from mortar_parquet_support_spark.session import get_spark
    from mortar_parquet_support_spark.sources.publish import recover_lake

    spark = get_spark("mortar-bench-recovery")
    base = tempfile.mkdtemp(prefix="recovery-bench-")

    # -- idle paths (best of 5: these are single-digit-ms probes) --------
    lake0 = os.path.join(base, "lake-idle")
    os.makedirs(lake0)
    idle_no_maint = min(
        _timed(lambda: recover_lake(spark, lake0)) for _ in range(5)
    )
    os.makedirs(os.path.join(lake0, ".maint"))
    idle_with_maint = min(
        _timed(lambda: recover_lake(spark, lake0)) for _ in range(5)
    )

    # -- serial vs pooled A/B at 1000 partitions --------------------------
    # INTERLEAVED (serial, pooled) x3 and reported as MEDIAN per mode:
    # this machine has multi-x noise phases (observed 14.8s-60s for the
    # identical pooled run), so alternation cancels drift and the median
    # resists a single lucky/unlucky run.
    import mortar_parquet_support_spark.sources.publish as pub

    def run_once(parts: int, files: int, workers: int) -> float:
        lake = os.path.join(base, f"lake-{uuidlib.uuid4().hex}")
        os.makedirs(lake)
        synth_crashed_txn(lake, parts, files)
        prev = pub._MAINT_POOL_WORKERS
        pub._MAINT_POOL_WORKERS = workers
        try:
            t0 = time.perf_counter()
            actions = recover_lake(spark, lake)
            dt = time.perf_counter() - t0
        finally:
            pub._MAINT_POOL_WORKERS = prev
        assert [a["action"] for a in actions] == ["rolled_forward"], actions
        sample = sorted(os.listdir(os.path.join(lake, "collection=c00000")))
        assert sample == [f"part-{j:04d}-new.parquet" for j in range(files)]
        assert not any(
            p.startswith("txn-")
            for p in os.listdir(os.path.join(lake, ".maint"))
        )
        return dt

    ab_parts = min(args.parts, 1000)
    serial_runs, pooled_runs = [], []
    for _ in range(3):
        serial_runs.append(run_once(ab_parts, args.files, workers=1))
        pooled_runs.append(run_once(ab_parts, args.files, workers=16))
    # MEDIAN, not min: a min-of-2 headline once published a 1.9x speedup
    # whose sibling pooled run showed none at all (review r14 round 3) —
    # with this machine's multi-x noise phases the median is the honest
    # central tendency, and all runs ship in the artifact
    serial = sorted(serial_runs)[1]
    pooled = sorted(pooled_runs)[1]

    # -- headline: the full --parts journal through the shipped config ----
    t_head = run_once(args.parts, args.files, workers=16)

    out = {
        "parts": args.parts,
        "files_per_part": args.files,
        "idle_no_maint_ms": round(idle_no_maint * 1000, 2),
        "idle_with_empty_maint_ms": round(idle_with_maint * 1000, 2),
        "ab_parts": ab_parts,
        "serial_per_partition_ms": round(serial * 1000 / ab_parts, 3),
        "pooled_per_partition_ms": round(pooled * 1000 / ab_parts, 3),
        "pool_speedup_median": round(serial / pooled, 2),
        "pool_speedup_best": round(min(serial_runs) / min(pooled_runs), 2),
        "serial_runs_sec": [round(x, 3) for x in serial_runs],
        "pooled_runs_sec": [round(x, 3) for x in pooled_runs],
        "headline_roll_forward_sec": round(t_head, 3),
        "headline_per_partition_ms": round(t_head * 1000 / args.parts, 3),
        "note": (
            "recovery is metadata-RPC-bound (py4j round trips per file "
            "move); the pool overlaps latency but the GIL caps the win. "
            "A journal this size implies a publish that rewrote as many "
            "partitions in ONE maintenance op and paid the same RPC "
            "count in its swap phase - batch maintenance accordingly."
        ),
    }
    with open(os.path.join(ROOT, "BENCH_RECOVERY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
