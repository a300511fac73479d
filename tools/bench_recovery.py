"""recover_lake at journal scale. r14 measured the Python loop at
24 ms/partition serial (py4j RPC-bound, GIL-capped pool ~1.3x) and
VERDICT r14 "Next round" #2 prescribed the fix this tool now witnesses:
the whole journal converges in ONE py4j call with the loop JVM-side
(java/MaintBatchOps.java). This tool synthesizes a crashed transaction
directly on disk (live files + staged files + the journal JSON —
recovery is pure filesystem mechanics, so the files' contents are
irrelevant) and times:

  - idle_no_maint:   recover on a lake that never had maintenance
                     (the fast path every streaming tick pays)
  - idle_with_maint: recover on a lake with an empty .maint (the
                     steady state after any completed maintenance)
  - three-way A/B at 1000 partitions: python-serial, python-pooled
                     (the r14 shipped path), jvm-batch (the r15 path)
  - roll_forward:    the full --parts journal through the shipped
                     config (jvm-batch with python fallback)
  - objstore_latency: subprocess drive (tools/recovery_latency_drive.py)
                     injecting 20 ms per rename into the objstore mimic
                     and recovering at JVM executor width 1 vs 32 - the
                     r16 overlap witness (VERDICT r15 "Next round" #1)

Timings are sentinel-gated (VERDICT r14 "Next round" #7: every timing
artifact, not just bench.py): each timed run records /proc/stat CPU
steal across itself and re-runs up to 3 times until steal <= 0.5%; if
no attempt lands clean the LAST is kept and the artifact says so in
noise_annotation — never silently.

Writes BENCH_RECOVERY.json at the repo root and prints one JSON line.

Usage: python tools/bench_recovery.py [--parts 5000] [--files 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import uuid as uuidlib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STEAL_MAX_PCT = 0.5
MAX_ATTEMPTS = 3


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


# the one /proc/stat jiffies parser, shared with bench.py (review r15:
# a third local copy would let the tools' sentinel gates silently
# diverge on a steal-column fix)
from bench import _cpu_jiffies as _cpu_steal  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=5000)
    ap.add_argument("--files", type=int, default=1)
    args = ap.parse_args()

    import tempfile

    import mortar_parquet_support_spark.sources.publish as pub
    from mortar_parquet_support_spark.session import get_spark
    from mortar_parquet_support_spark.sources.publish import recover_lake

    spark = get_spark("mortar-bench-recovery")
    base = tempfile.mkdtemp(prefix="recovery-bench-")
    dirty_attempts = []
    exhausted = {"count": 0}  # timed regions that never landed clean

    def gated(fn, label: str) -> float:
        """Steal-gated timing: retry until the run itself saw steal
        within band; keep the last otherwise (recorded below, tagged
        with ``label`` so the annotation maps to a published number)."""
        for attempt in range(MAX_ATTEMPTS):
            j0, s0 = _cpu_steal()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            j1, s1 = _cpu_steal()
            steal = 100.0 * (s1 - s0) / (j1 - j0) if j1 > j0 else 0.0
            if steal <= STEAL_MAX_PCT:
                return dt
            dirty_attempts.append(
                {"region": label, "steal_pct": round(steal, 2),
                 "sec": round(dt, 3)}
            )
        exhausted.setdefault("regions", []).append(label)
        exhausted["count"] += 1
        return dt  # every attempt dirty — keep the last, annotate below

    # -- idle paths (best of 5: these are single-digit-ms probes) --------
    lake0 = os.path.join(base, "lake-idle")
    os.makedirs(lake0)
    idle_no_maint = min(
        gated(lambda: recover_lake(spark, lake0), "idle_no_maint")
        for _ in range(5)
    )
    os.makedirs(os.path.join(lake0, ".maint"))
    idle_with_maint = min(
        gated(lambda: recover_lake(spark, lake0), "idle_with_maint")
        for _ in range(5)
    )

    # -- serial vs pooled vs jvm-batch A/B at 1000 partitions -------------
    # INTERLEAVED x3 per mode and reported as MEDIAN: this machine has
    # multi-x noise phases (observed 14.8s-60s for the identical pooled
    # run), so alternation cancels drift, the median resists a single
    # lucky run, and the steal gate above rejects contaminated ones.
    def run_once(parts: int, files: int, *, workers: int, jvm: bool,
                 label: str) -> float:
        """One steal-gated recovery timing. The retry CANNOT reuse the
        lake (recovery converges it — a second run would time the idle
        path), so every attempt synthesizes a fresh crashed txn; only
        the recover_lake span is timed and steal-judged."""
        prev_w, prev_j = pub._MAINT_POOL_WORKERS, pub._USE_JVM_BATCH
        pub._MAINT_POOL_WORKERS = workers
        pub._USE_JVM_BATCH = jvm
        try:
            for _attempt in range(MAX_ATTEMPTS):
                lake = os.path.join(base, f"lake-{uuidlib.uuid4().hex}")
                os.makedirs(lake)
                synth_crashed_txn(lake, parts, files)
                j0, s0 = _cpu_steal()
                t0 = time.perf_counter()
                actions = recover_lake(spark, lake)
                dt = time.perf_counter() - t0
                j1, s1 = _cpu_steal()
                _assert_recovered(actions, lake, files)
                steal = 100.0 * (s1 - s0) / (j1 - j0) if j1 > j0 else 0.0
                if steal <= STEAL_MAX_PCT:
                    return dt
                dirty_attempts.append(
                    {"region": label, "steal_pct": round(steal, 2),
                     "sec": round(dt, 3)}
                )
            exhausted.setdefault("regions", []).append(label)
            exhausted["count"] += 1
            return dt
        finally:
            pub._MAINT_POOL_WORKERS = prev_w
            pub._USE_JVM_BATCH = prev_j

    def _assert_recovered(actions, lake, files):
        assert [a["action"] for a in actions] == ["rolled_forward"], actions
        sample = sorted(os.listdir(os.path.join(lake, "collection=c00000")))
        assert sample == [f"part-{j:04d}-new.parquet" for j in range(files)]
        assert not any(
            p.startswith("txn-")
            for p in os.listdir(os.path.join(lake, ".maint"))
        )

    modes = {
        "serial": {"workers": 1, "jvm": False},
        "pooled": {"workers": 16, "jvm": False},
        "jvm_batch": {"workers": 16, "jvm": True},
    }
    ab_parts = min(args.parts, 1000)
    runs: dict[str, list[float]] = {m: [] for m in modes}
    for _ in range(3):
        for m, kw in modes.items():
            runs[m].append(run_once(ab_parts, args.files, label=m, **kw))
    med = {m: sorted(v)[1] for m, v in runs.items()}

    # -- headline: the full --parts journal through the shipped config ----
    t_head = run_once(
        args.parts, args.files, workers=16, jvm=True, label="headline"
    )

    # -- object-store overlap witness (subprocess: mimic FS needs the
    # driver classpath at JVM launch; it carries its own steal gate) ------
    latency = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools",
                                          "recovery_latency_drive.py")],
            capture_output=True, text=True, timeout=900, cwd=ROOT,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                latency = json.loads(line)
                break
        if latency is None or proc.returncode != 0:
            latency = {"error": f"drive rc={proc.returncode}",
                       "stderr_tail": proc.stderr[-500:], **(latency or {})}
    except Exception as exc:  # the local-FS numbers stay publishable
        latency = {"error": repr(exc)}

    out = {
        "parts": args.parts,
        "files_per_part": args.files,
        "idle_no_maint_ms": round(idle_no_maint * 1000, 2),
        "idle_with_empty_maint_ms": round(idle_with_maint * 1000, 2),
        "ab_parts": ab_parts,
        "serial_per_partition_ms": round(med["serial"] * 1000 / ab_parts, 3),
        "pooled_per_partition_ms": round(med["pooled"] * 1000 / ab_parts, 3),
        "jvm_batch_per_partition_ms": round(
            med["jvm_batch"] * 1000 / ab_parts, 3
        ),
        "jvm_batch_speedup_vs_serial_median": round(
            med["serial"] / med["jvm_batch"], 2
        ),
        "jvm_batch_speedup_vs_pooled_median": round(
            med["pooled"] / med["jvm_batch"], 2
        ),
        "runs_sec": {
            m: [round(x, 3) for x in v] for m, v in runs.items()
        },
        "headline_roll_forward_sec": round(t_head, 3),
        "headline_per_partition_ms": round(t_head * 1000 / args.parts, 3),
        "sentinel_gate": {
            "band_steal_pct": STEAL_MAX_PCT,
            "retries_per_run": MAX_ATTEMPTS,
            "dirty_attempts_discarded": dirty_attempts,
        },
        "noise_annotation": (
            None
            if exhausted["count"] == 0
            else "timed region(s) "
                 f"{sorted(set(exhausted.get('regions', [])))} never "
                 "landed inside the steal band; "
                 "the LAST attempt is included — treat affected numbers "
                 "as upper bounds"
        ),
        "objstore_latency": latency,
        "note": (
            "r14's Python loop paid py4j round trips per file move "
            "(24 ms/partition serial, GIL-capped pool ~1.3x); the r15 "
            "jvm_batch path converges the whole journal in ONE py4j call "
            "(java/MaintBatchOps.java), so per-partition cost is now "
            "native FS-call latency, not driver RPC. The same batch path "
            "runs in publish's swap phase."
        ),
    }
    with open(os.path.join(ROOT, "BENCH_RECOVERY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
