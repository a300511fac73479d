"""similarity_join at corpus scale (VERDICT r9 ask #7): run the exact
prefix-filtered all-pairs join over the sf1 documents table and prove
the fan-out bound EMPIRICALLY — candidate-pair count vs the n*(n-1)/2
all-pairs space the prefix filter exists to avoid, plus wall time and
the surviving (verified) pair count.

Writes BENCH_SIMJOIN.json at the repo root:

  {"sf_dir": .., "n_docs": .., "threshold": ..,
   "all_pairs": .., "candidate_pairs": .., "candidate_fraction": ..,
   "verified_pairs": .., "precision_of_filter": ..,
   "join_wall_sec": .., "candidates_wall_sec": .., ...sentinels}

``candidate_fraction`` is the headline: the share of the quadratic
space the equi-join on prefix tokens actually materializes. The
property tests prove the filter LOSSLESS (no misses); this artifact
proves it SELECTIVE at corpus scale — together they are the operator's
scale story. (``verified_pairs`` can legitimately be 0: the sf1
generator injects no near-duplicates — checked: zero exact-duplicate
texts in the corpus — unlike the driver's sf0.01 fixture, whose
injected near-dups the oracle-checked entry finds. The filter's
selectivity number is unaffected.)

Usage: python tools/bench_simjoin.py [sf_dir] [threshold]
(defaults: testdata_sf/sf1, 0.8)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "testdata_sf/sf1"
    )
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8

    from bench import _cpu_jiffies, _jit_probe, warmup
    from mortar_parquet_support_spark.operators.dedup import (
        similarity_join,
        similarity_join_candidates,
    )
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-bench-simjoin")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 11_000)
    jif0, steal0 = _cpu_jiffies()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    all_pairs = n_docs * (n_docs - 1) // 2

    t0 = time.perf_counter()
    cand = similarity_join_candidates(
        docs, id_col="doc_id", text_col="text", threshold=threshold
    )
    n_cand = cand.count()
    cand_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    verified = similarity_join(
        docs, id_col="doc_id", text_col="text", threshold=threshold
    )
    n_verified = verified.count()
    join_sec = round(time.perf_counter() - t0, 3)

    jit_after = _jit_probe(spark, 11_500)
    jif1, steal1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (jif1 - jif0), 2)
        if jif1 > jif0
        else None
    )

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "threshold": threshold,
        "all_pairs": all_pairs,
        "candidate_pairs": n_cand,
        "candidate_fraction": round(n_cand / all_pairs, 10)
        if all_pairs
        else None,
        "verified_pairs": n_verified,
        "precision_of_filter": round(n_verified / n_cand, 6)
        if n_cand
        else None,
        "candidates_wall_sec": cand_sec,
        "join_wall_sec": join_sec,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": steal_pct,
    }
    path = os.path.join(ROOT, "BENCH_SIMJOIN.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
