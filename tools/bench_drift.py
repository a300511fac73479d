"""Interleaved A/B attribution of the r12->r14 +19% bench drift
(VERDICT r14 "Next round" #1): BENCH_r12 and BENCH_r14 both carry CLEAN
sentinels (steal 0.04%, jit_after ~0.33-0.35s) yet 20 of 24 queries
timed slower in r14, worst on paths r13/r14 never touched — so "machine
noise" is unproven and a real cross-cutting cost hiding in the r13
commits would silently re-base every future gate.

Method: the six most-drifted queries (linear_classifier 1.54x,
knn_cosine 1.30x, time_bucket_rollup 1.29x, dedup_exact 1.27x, plus the
two heaviest comparables dedup_minhash and tpch_q18) run in ALTERNATING
fresh subprocesses — r12 tree (the commit that shipped BENCH_r12), HEAD
tree — five rounds each, in ONE session on a page-cache-warmed sf0.1.
Each subprocess is a full cold JVM with bench.py's own warmup + prewarm
discipline and per-query median-of-3, plus its own steal/JIT sentinels.
Alternation cancels the machine's documented multi-x noise phases
(identical runs have measured 14.8s-60s); per-(tree, query) MEDIANS
across the five rounds are the headline, every raw number ships in the
artifact.

Verdict rule (from the punch item): HEAD <= 1.05x r12 median on the six
-> the drift was environment, not code; anything above implicates the
r13 tree and triggers a bisect.

Usage: python tools/bench_drift.py [--rounds 5] [--r12-tree /tmp/r12-tree]
Writes BENCH_DRIFT.json at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "linear_classifier",
    "knn_cosine",
    "time_bucket_rollup",
    "dedup_exact",
    "dedup_minhash",
    "tpch_q18",
]

# Self-contained per-tree runner: imports the TREE's __spark_entry__ (cwd
# must be the tree so mapInArrow pickles resolve), replicates bench.py's
# timing discipline (warmup, interleaved sf0.001 prewarm, noop sink,
# median-of-3), and prints one JSON line. Sentinels are inlined rather
# than imported so the SAME probe runs against both trees regardless of
# what each tree's bench.py knows how to measure.
_RUNNER = r'''
import json, os, sys, time
tree, sf_dir, salt_base = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = json.loads(sys.argv[4])
os.chdir(tree)
sys.path.insert(0, tree)

def cpu_jiffies():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0

def jit_probe(spark, salt):
    t0 = time.perf_counter()
    spark.range(100_000).selectExpr(
        *[f"sum(id * {salt + i}) as s_{salt}_{i}" for i in range(40)]
    ).collect()
    return round(time.perf_counter() - t0, 3)

import __spark_entry__ as em
from mortar_parquet_support_spark.session import get_spark

spark = get_spark("bench-drift")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

def _identity(batches):
    yield from batches

spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.range(0, 1_000, 1, cpus).mapInArrow(_identity, "id long").write \
    .format("noop").mode("overwrite").save()

qs = em.queries()
prewarm_dir = "/root/testdata/sf0.001"
jit_before = jit_probe(spark, salt_base)
j0, s0 = cpu_jiffies()
timings = {}
for name in names:
    try:  # interleaved plan-compile prewarm, exactly bench.py's rationale
        qs[name](spark, prewarm_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    timings[name] = round(sorted(runs)[1], 3)
jit_after = jit_probe(spark, salt_base + 500)
j1, s1 = cpu_jiffies()
print("DRIFT_RESULT " + json.dumps({
    "timings": timings,
    "jit_before": jit_before,
    "jit_after": jit_after,
    "steal_pct": round(100.0 * (s1 - s0) / (j1 - j0), 2) if j1 > j0 else None,
}))
spark.stop()
'''


def run_tree(runner: str, tree: str, sf_dir: str, salt: int) -> dict:
    proc = subprocess.run(
        [sys.executable, runner, tree, sf_dir, str(salt), json.dumps(QUERIES)],
        cwd=tree, capture_output=True, text=True, timeout=900,
        env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("DRIFT_RESULT "):
            return json.loads(line[len("DRIFT_RESULT "):])
    raise RuntimeError(
        f"runner failed on {tree}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--r12-tree", default="/tmp/r12-tree")
    ap.add_argument(
        "--tree", action="append", default=[],
        metavar="LABEL=PATH",
        help="extra arms (e.g. r13=/tmp/r13-tree); r12+head always run",
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset of the default six",
    )
    ap.add_argument(
        "--out", default="BENCH_DRIFT.json",
        help="artifact name (repo-root-relative)",
    )
    args = ap.parse_args()
    if args.queries:
        QUERIES[:] = [q for q in args.queries.split(",") if q]

    # one page-cache warm for both trees' runs (bench.py's rationale)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        files = (
            sorted(glob.glob(os.path.join(p, "*.parquet")))
            if os.path.isdir(p) else [p]
        )
        for q in files:
            with open(q, "rb") as f:
                while f.read(1 << 22):
                    pass

    runner = os.path.join(tempfile.mkdtemp(prefix="drift-"), "runner.py")
    with open(runner, "w") as f:
        f.write(_RUNNER)

    trees = {"r12": args.r12_tree}
    for spec in args.tree:
        label, _, path = spec.partition("=")
        trees[label] = path
    trees["head"] = ROOT
    labels = list(trees)
    raw: dict[str, list[dict]] = {label: [] for label in labels}
    t_start = time.time()
    for rnd in range(args.rounds):
        # ROTATE the within-round order (round 0: ABC, 1: BCA, 2: CAB,
        # ...): the first sitting's fixed A-then-B order ALIASED the
        # host's periodic steal phases onto one arm (head drew steal
        # 5.0/4.78 while r12 drew 0.03-0.3 in the same rounds) — with
        # rotation every arm visits every within-round time slot.
        order = labels[rnd % len(labels):] + labels[:rnd % len(labels)]
        for label in order:
            res = run_tree(runner, trees[label], sf_dir,
                           salt=10_000 * (rnd + 1))
            raw[label].append(res)
            print(f"[round {rnd}] {label}: {res['timings']} "
                  f"steal={res['steal_pct']} jit_after={res['jit_after']}",
                  flush=True)

    def _median_table(runs_by_label, keep):
        return {
            label: {
                q: round(statistics.median(r["timings"][q] for r in kept), 3)
                for q in QUERIES
            } if (kept := [r for r in runs if keep(r)]) else None
            for label, runs in runs_by_label.items()
        }

    # bench.py's own sentinel band; a run outside it is machine-noise-
    # contaminated and its timings say nothing about the code
    def _clean(r):
        return (r["steal_pct"] is None or r["steal_pct"] <= 0.5) and \
            r["jit_after"] <= 0.45

    medians = _median_table(raw, lambda r: True)
    clean_medians = _median_table(raw, _clean)
    clean_counts = {
        label: sum(1 for r in runs if _clean(r)) for label, runs in raw.items()
    }
    basis = clean_medians if all(
        v is not None and clean_counts[label] >= 2
        for label, v in clean_medians.items()
    ) else medians
    ratios = {
        q: round(basis["head"][q] / basis["r12"][q], 3) for q in QUERIES
    }
    worst = max(ratios.values())
    total_ratio = round(
        sum(basis["head"].values()) / sum(basis["r12"].values()), 3
    )
    verdict = (
        "noise: interleaved clean-run medians put HEAD within the 1.05x "
        "band of r12 on every drifted query - the r12->r14 artifact gap "
        "was machine phase, not code"
        if worst <= 1.05
        else f"code-implicated: HEAD is {worst}x r12 at worst "
        f"({max(ratios, key=ratios.get)}) under interleaved clean-run "
        "medians - bisect"
    )
    out = {
        "method": "rotating-order fresh-JVM subprocesses (round r starts "
                  "at arm r mod n), median-of-3 per query per run, median "
                  "across rounds; ratios use clean-run medians (steal<=0.5, "
                  "jit_after<=0.45) when every arm has >=2 clean runs",
        "r12_commit": "d7e2bdb",
        "arms": {label: trees[label] for label in labels},
        "rounds": args.rounds,
        "sf_dir": sf_dir,
        "wall_sec": round(time.time() - t_start, 1),
        "queries": QUERIES,
        "medians_all_runs": medians,
        "medians_clean_runs": clean_medians,
        "clean_run_counts": clean_counts,
        "ratio_basis": "clean" if basis is clean_medians else "all",
        "head_over_r12": ratios,
        "total_ratio": total_ratio,
        "verdict": verdict,
        "raw_runs": raw,
        "bench_r12_vs_r14_artifact_ratios": {
            "linear_classifier": 1.54, "knn_cosine": 1.30,
            "time_bucket_rollup": 1.29, "dedup_exact": 1.27,
        },
    }
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("medians_clean_runs", "clean_run_counts",
                       "head_over_r12", "total_ratio", "verdict")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
