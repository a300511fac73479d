"""sf100 stress decade for the two scale-critical text-dedup legs
(VERDICT r12 "Next round" #6): minhash SIGNATURES and the similarity-join
CANDIDATE stage, measured three decades above the driver's sf0.1 fixture
(5k docs -> 5M docs at the default sizes).

Why a dedicated STRESS corpus instead of gen_sf documents: the fixture
vocabulary is FIXED at 27 words, so its true near-duplicate pair count
grows ~quadratically with corpus size — at 5M docs the exact answer
itself is ~1e11 pairs, and any algorithm that must OUTPUT them is
"super-linear" by construction. That is a corpus property, not an
algorithm property. The stress corpus holds duplicate DENSITY fixed as n
grows (hash vocabulary scaling with n, plus planted near-duplicates at
1%: every 100th doc copies its predecessor with one word changed ->
3-shingle Jaccard ~0.85-0.95), so the measured growth is the operator's.

Timing policy: the base size runs best-of-3 (the repo standard); the big
size runs ONCE — a 1000x signature pass is tens of minutes, and a single
run three decades out distinguishes linear from super-linear with margin
(the question is 1000x vs 10000x, not 1000x vs 1100x). jit/steal
sentinels bracket the run like every other bench artifact.

Writes BENCH_SF100.json at the repo root.

Usage: python tools/bench_sf100.py [n_base] [n_big]
Defaults: 5_000 5_000_000
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS_BASE = 3
THRESHOLD = 0.8


def stress_docs(spark, n: int, out: str):
    """Deterministic growing-vocabulary corpus with 1% planted near-dups.

    Same generation discipline as tools/gen_sf.py (spark.range +
    xxhash64, no rand(), no driver loops). vocab ~ n/10 (floor 1000)
    tokens, 32-100 words per doc (floor 32, NOT the fixture's 8: a
    one-word edit on an L-word doc gives 3-shingle Jaccard (L-5)/(L+1),
    which crosses the 0.8 threshold only at L >= 29 — review r13); doc i
    with i % 100 == 99 re-derives its predecessor's words and changes
    only word 1, landing at Jaccard 0.84-0.95, so the candidate stage
    must carry exactly ~n/100 true pairs at every size."""
    from pyspark.sql import functions as F

    # bare isdir is not "generated": an interrupted multi-minute write
    # leaves partial part-files that would silently misreport n_big
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return spark.read.parquet(out)
    if os.path.isdir(out):
        import shutil

        shutil.rmtree(out)
    vocab_n = max(1000, n // 10)
    parts = max(32, int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ids = spark.range(0, n, 1, parts).withColumnRenamed("id", "i")
    i = F.col("i")
    planted = F.pmod(i, F.lit(100)) == 99
    base_id = F.when(planted, i - 1).otherwise(i)
    n_words = (
        F.pmod(F.xxhash64(base_id, F.lit("dlen"), F.lit(42)), F.lit(69)) + 32
    ).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(
                    # word 1 of a planted copy derives from its OWN id —
                    # the one-word edit that makes it a NEAR-dup, not a dup
                    F.when(planted & (j == 1), i).otherwise(base_id),
                    j,
                    F.lit(42),
                ),
                F.lit(vocab_n),
            ),
        ),
    )
    ids.select(
        i.alias("doc_id"), F.array_join(words, " ").alias("text")
    ).write.parquet(out)
    return spark.read.parquet(out)


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000

    from bench import gate_whole_run
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-bench-sf100")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    # whole-run sentinel gate (VERDICT r14 #7)
    final = gate_whole_run(jit_after_max_sec=None, run_fn=lambda attempt: _measure(spark, cpus, n_base, n_big, attempt)
    )
    with open(os.path.join(ROOT, "BENCH_SF100.json"), "w") as f:
        json.dump(final, f, indent=1)
    print(json.dumps(final))
    return 0


def _measure(spark, cpus: int, n_base: int, n_big: int, attempt: int) -> dict:
    from bench import _cpu_jiffies, _jit_probe, warmup
    from mortar_parquet_support_spark.operators.dedup import (
        minhash_signatures,
        similarity_join_candidates,
    )

    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 21_000 + 100_000 * attempt)
    jif0, steal0 = _cpu_jiffies()

    stress_dir = os.path.join(ROOT, "testdata_sf", "stress")
    corpora = {
        "base": stress_docs(spark, n_base, f"{stress_dir}/docs_{n_base}"),
        "big": stress_docs(spark, n_big, f"{stress_dir}/docs_{n_big}"),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {
        "n_base": n_base,
        "n_big": n_big,
        "data_ratio": round(n_big / n_base, 1),
        "threshold": THRESHOLD,
        "runs_base": RUNS_BASE,
        "runs_big": 1,
    }
    for name, docs in corpora.items():
        runs = RUNS_BASE if name == "base" else 1
        best_sig = None
        for _ in range(runs):
            t0 = time.perf_counter()
            noop(minhash_signatures(docs, id_col="doc_id", text_col="text"))
            dt = time.perf_counter() - t0
            best_sig = dt if best_sig is None else min(best_sig, dt)
        t0 = time.perf_counter()
        n_cand = similarity_join_candidates(
            docs, id_col="doc_id", text_col="text", threshold=THRESHOLD
        ).count()
        t_cand = time.perf_counter() - t0
        n = n_base if name == "base" else n_big
        out[name] = {
            "signatures_sec": round(best_sig, 3),
            "candidates_sec": round(t_cand, 3),
            "n_candidates": n_cand,
            "quadratic_space": n * (n - 1) // 2,
            "candidate_fraction": round(n_cand / (n * (n - 1) / 2), 9),
        }

    out["signature_time_ratio"] = round(
        out["big"]["signatures_sec"] / max(out["base"]["signatures_sec"], 1e-3), 1
    )
    out["candidate_time_ratio"] = round(
        out["big"]["candidates_sec"] / max(out["base"]["candidates_sec"], 1e-3), 1
    )
    out["candidate_count_ratio"] = round(
        out["big"]["n_candidates"] / max(out["base"]["n_candidates"], 1), 1
    )
    out["attribution"] = (
        "signatures: map-side shingle-hash + min-agg, shuffle carries "
        "num_perm longs/doc (num_perm is the linear knob); candidates: "
        "prefix-filter fan-out is bounded by prefix length "
        "ceil((1-t)*sz)+1 per doc (threshold is the knob) times token "
        "bucket sizes, which the growing vocabulary holds ~constant"
    )
    jit_after = _jit_probe(spark, 21_500 + 100_000 * attempt)
    jif1, steal1 = _cpu_jiffies()
    out["jit_sentinel_before_sec"] = jit_before
    out["jit_sentinel_after_sec"] = jit_after
    out["steal_pct"] = (
        round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2)
        if jif1 > jif0
        else None
    )
    return out


if __name__ == "__main__":
    raise SystemExit(main())
