"""Measured recall of correlated_pairs' sign-random-projection screen
(VERDICT r13 "Next round" #4: the top_correlated_partners docstring
over-claimed "the screen misses nothing above the bar"; by the module's
own E[Hamming] = n_bits*arccos(rho)/pi formula, per-pair recall at the
default n_bits=128 / band_bits=8 / threshold=0.9 is ~0.91 — this tool
replaces the formula-vs-prose tension with numbers, the
PROFILE_MINHASH pattern).

Corpus: ``--streams`` base streams of hash-derived standard normals
(xxhash64 -> Box-Muller — deterministic and distributed, no
row-position-dependent F.randn), each with exactly ONE planted sibling
(2*streams total) at a mixing coefficient a (sibling = a*x +
sqrt(1-a^2)*noise, so true rho ~= a); the coefficients cycle by stream
index through four values above the threshold (the recall population)
and two below it (those siblings ARE the distractors — pairs the
screen should drop). Ground truth is the EXACT
all-pairs battery (pairwise_correlation) filtered at the threshold —
the same exact Pearson core the screened operator runs on its
candidates, so every truth-pair the screened result lacks is a SCREEN
miss by construction.

Writes PROFILE_CORR.json at the repo root and prints one JSON line:
overall recall per n_bits in {128, 192, 256}, recall split by
corr-band (misses concentrate just above the bar, where arccos(rho)
is largest), the formula's predicted per-pair recall at each knob, and
wall seconds per screened run.

Usage: python tools/profile_corr.py [--streams N] [--buckets T]
       (defaults 400 base streams -> 800 total, 256 hourly buckets)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# siblings straddle the 0.9 threshold: four above (the recall
# population), one just under + one far under (distractors the screen
# SHOULD drop; they also stress precision, though precision is exact by
# construction — the Pearson core filters them)
MIX_ABOVE = (0.905, 0.93, 0.96, 0.99)
MIX_BELOW = (0.85, 0.60)
THRESHOLD = 0.9
N_BITS_SWEEP = (128, 192, 256)
BAND_BITS = 8


def predicted_recall(rho: float, n_bits: int, band_bits: int) -> float:
    """The module's own math: each bit flips independently with
    p = arccos(rho)/pi; a pair is caught if ANY band (band_bits
    consecutive bits of a 64-bit block) matches exactly."""
    p_flip = math.acos(rho) / math.pi
    p_band = (1.0 - p_flip) ** band_bits
    n_bands = n_bits // band_bits
    return 1.0 - (1.0 - p_band) ** n_bands


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=400)
    ap.add_argument("--buckets", type=int, default=256)
    args = ap.parse_args()

    import time

    from pyspark.sql import functions as F

    from bench import _cpu_jiffies, _jit_probe, warmup
    from mortar_parquet_support_spark.operators.timeseries import (
        correlated_pairs,
        pairwise_correlation,
    )
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-profile-corr")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 31_000)
    jif0, steal0 = _cpu_jiffies()

    S, T = args.streams, args.buckets

    def _unit(tag: str):
        # uniform in (0,1), deterministic in (tag, stream k, bucket t)
        h = F.xxhash64(F.lit(tag), F.col("k"), F.col("t"))
        return (F.pmod(h, F.lit(1 << 24)).cast("double") + 0.5) / float(1 << 24)

    def _normal(tag: str):
        u1, u2 = _unit(tag + "u1"), _unit(tag + "u2")
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

    grid = (
        spark.range(S)
        .withColumnRenamed("id", "k")
        .crossJoin(spark.range(T).withColumnRenamed("id", "t"))
        .repartition(32)
    )
    base = _normal("x")
    mixes = list(MIX_ABOVE) + list(MIX_BELOW)
    # sibling family cycles by stream index so every mix gets S/len(mixes)
    # planted pairs — enough above-threshold pairs for recall to be a
    # frequency, not an anecdote
    mix_col = F.element_at(
        F.array(*[F.lit(m) for m in mixes]),
        (F.col("k") % len(mixes) + 1).cast("int"),
    )
    sib = mix_col * base + F.sqrt(1.0 - mix_col * mix_col) * _normal("n")
    ts = F.timestamp_seconds(F.col("t") * 3600)
    df = grid.select(
        F.concat(F.lit("b"), F.col("k")).alias("uuid"),
        ts.alias("bucket"),
        base.alias("value"),
    ).unionByName(
        grid.select(
            F.concat(F.lit("s"), F.col("k")).alias("uuid"),
            ts.alias("bucket"),
            sib.alias("value"),
        )
    )
    df = df.persist()
    n_rows = df.count()

    # -- exact ground truth: the full all-pairs battery ------------------
    t0 = time.perf_counter()
    truth_rows = (
        pairwise_correlation(df, ts="bucket", key="uuid", value="value")
        .filter(F.col("corr") >= THRESHOLD)
        .select("key_a", "key_b", "corr")
        .collect()
    )
    t_truth = round(time.perf_counter() - t0, 3)
    truth = {(r.key_a, r.key_b): r.corr for r in truth_rows}

    def corr_band(c: float) -> str:
        if c < 0.92:
            return "0.90-0.92"
        if c < 0.95:
            return "0.92-0.95"
        if c < 0.98:
            return "0.95-0.98"
        return "0.98-1.00"

    band_totals: dict[str, int] = {}
    for c in truth.values():
        band_totals[corr_band(c)] = band_totals.get(corr_band(c), 0) + 1

    # Per-run sentinel gate (VERDICT r14 "What's wrong" #1: the r14
    # artifact's own timings were anti-monotone in n_bits — 53.1s@128 >
    # 34.0s@256 on MORE work — with steal 5.55%, 28x the bench band;
    # the recall counts were unaffected, but the timing columns invited
    # a false "more bits is faster" reading). Each screened run now
    # re-runs until ITS OWN steal lands inside bench.py's band; if no
    # attempt is clean, the timing ships as None with the annotation —
    # recall is an exact set comparison and is kept from any attempt.
    STEAL_MAX_PCT = 0.2
    MAX_ATTEMPTS = 3

    results = {}
    for n_bits in N_BITS_SWEEP:
        sec = run_steal = None
        found_rows = None
        for _attempt in range(MAX_ATTEMPTS):
            rj0, rs0 = _cpu_jiffies()
            t0 = time.perf_counter()
            found_rows = (
                correlated_pairs(
                    df, ts="bucket", key="uuid", value="value",
                    threshold=THRESHOLD, n_bits=n_bits, band_bits=BAND_BITS,
                )
                .select("key_a", "key_b")
                .collect()
            )
            dt = round(time.perf_counter() - t0, 3)
            rj1, rs1 = _cpu_jiffies()
            run_steal = (
                round(100.0 * (rs1 - rs0) / (rj1 - rj0), 2)
                if rj1 > rj0 else None
            )
            if run_steal is not None and run_steal <= STEAL_MAX_PCT:
                sec = dt
                break
        found = {(r.key_a, r.key_b) for r in found_rows}
        missed = {p: c for p, c in truth.items() if p not in found}
        band_miss: dict[str, int] = {}
        for c in missed.values():
            band_miss[corr_band(c)] = band_miss.get(corr_band(c), 0) + 1
        results[str(n_bits)] = {
            "recall": round(1.0 - len(missed) / len(truth), 4) if truth else None,
            "found_true": len(truth) - len(missed),
            "missed": len(missed),
            "recall_by_corr_band": {
                b: round(1.0 - band_miss.get(b, 0) / n, 4)
                for b, n in sorted(band_totals.items())
            },
            "predicted_per_pair_recall_at_0.90": round(
                predicted_recall(0.90, n_bits, BAND_BITS), 4
            ),
            "predicted_per_pair_recall_at_0.95": round(
                predicted_recall(0.95, n_bits, BAND_BITS), 4
            ),
            # None = every attempt was steal-contaminated; recall above
            # is still exact (set comparison, noise-immune)
            "screened_run_sec": sec,
            "screened_run_steal_pct": run_steal,
            "timing_clean": sec is not None,
        }

    jit_after = _jit_probe(spark, 31_500)
    jif1, steal1 = _cpu_jiffies()
    df.unpersist()
    out = {
        "streams": 2 * S,
        "buckets": T,
        "rows": n_rows,
        "threshold": THRESHOLD,
        "band_bits": BAND_BITS,
        "planted_mixes_above": MIX_ABOVE,
        "planted_mixes_below": MIX_BELOW,
        "true_pairs_above_threshold": len(truth),
        "true_pairs_by_corr_band": dict(sorted(band_totals.items())),
        "exact_all_pairs_truth_sec": t_truth,
        "timing_gate": {
            "band_steal_pct": 0.2,
            "retries": 3,
            "note": "screened_run_sec is per-run steal-gated; None means "
                    "no clean attempt (recall counts are exact set "
                    "comparisons and are valid regardless). "
                    "exact_all_pairs_truth_sec is ungated context, not a "
                    "comparison column.",
        },
        "by_n_bits": results,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2)
        if jif1 > jif0
        else None,
    }
    with open(os.path.join(ROOT, "PROFILE_CORR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
