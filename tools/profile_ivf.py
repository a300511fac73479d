"""Where do knn_ivf_build's seconds go? (VERDICT r11 "What's missing" #5
flagged it as the only timed entry with no noise discipline; bench.py
gave it median-of-3 in r12 — this attributes the median.)

Stage decomposition of ``IvfIndex.build(embeddings, n_list=8,
persist=True)`` — the exact ``ivf_index_rebuild`` call the bench times —
measured best-of-RUNS per stage with the build's own internal seams as
boundaries:

  1. ``fit_probe``   — the _centroids_fit_driver row probe (one tiny job)
  2. ``lloyd``       — seeding + Lloyd refinement to driver-resident
                       centroid rows (per-iteration Arrow corpus scan,
                       driver reduce; zero shuffles on the small path)
  3. ``assign``      — the zero-shuffle Arrow assignment scan of the
                       corpus against the closure-broadcast centroids
  4. ``persist``     — materializing the assigned corpus into the cache
                       (count over the persisted frame)

plus a ``full_build`` cross-check (stages should roughly sum to it) and
an ``n_list`` sweep (4/8/16) answering "is the cell count the knob" —
expected answer NO on the small path: Lloyd's matmul and the assignment
scan are O(n_docs * dim * n_list) with n_list tiny, so wall should track
the corpus scan, not the cell count.

Writes PROFILE_IVF.json at the repo root and prints one JSON line.

Usage: python tools/profile_ivf.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from bench import _cpu_jiffies, _jit_probe, best_of, warmup
    from mortar_parquet_support_spark.operators import similarity as sim
    from mortar_parquet_support_spark.operators.similarity import IvfIndex
    from mortar_parquet_support_spark.session import get_spark
    from mortar_parquet_support_spark.tables import load_table

    spark = get_spark("mortar-profile-ivf")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 5_000)
    jif0, steal0 = _cpu_jiffies()

    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    N_LIST = 8  # the entry's setting (entries/_registry.py ivf_index_for)

    stages: dict[str, float] = {}
    stages["fit_probe"] = best_of(
        lambda: sim._centroids_fit_driver(emb, "embedding", N_LIST)
    )
    lloyd_out: list = []

    def _lloyd():
        lloyd_out.append(
            sim._centroids_small_rows(
                emb, id_col="vec_id", vec_col="embedding", n_list=N_LIST,
                iters=1, seed=42,
            )
        )

    stages["lloyd"] = best_of(_lloyd)
    cent_rows = lloyd_out[-1]  # deterministic: every run returns the same
    vecs = emb.filter(F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    stages["assign"] = best_of(
        lambda: sim._assign_lists_arrow(vecs, cent_rows).foreach(lambda r: None)
    )

    def _persist_cycle():
        idx = IvfIndex.build(emb, n_list=N_LIST, persist=True)
        idx.unpersist()

    stages["full_build_persist"] = best_of(_persist_cycle)

    sweep: dict[str, float] = {}
    for n_list in (4, 8, 16):
        def _cycle(n=n_list):
            idx = IvfIndex.build(emb, n_list=n, persist=True)
            idx.unpersist()

        sweep[str(n_list)] = best_of(_cycle)

    jit_after = _jit_probe(spark, 6_000)
    jif1, steal1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(jif1 - jif0, 1), 2)
        if jif1 > jif0
        else 0.0
    )
    out = {
        "sf_dir": sf_dir,
        "n_vecs": n_vecs,
        "n_list": N_LIST,
        "stages": stages,
        "n_list_sweep_sec": sweep,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": jit_after,
        "steal_pct": steal_pct,
    }
    with open(os.path.join(ROOT, "PROFILE_IVF.json"), "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
