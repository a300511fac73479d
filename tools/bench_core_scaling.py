"""Data-bound core-scaling datapoint (VERDICT r16 item 6): time a small
set of data-heavy queries at ONE scale factor and ONE core count, so two
invocations (SPARK_GRAFT_CPUS=8 and =32) over a big-enough SF measure
whether the plans actually parallelize once fixed overhead stops
dominating — the question the sf0.1 headline bench cannot answer (at
sf0.1 every headline query is overhead-bound and 8 cores beats 32).

Queries: dedup_minhash (the heaviest headline), embedding_dedup in LSH
mode (n_planes=8 — the scale path; the oracle entry is exact mode), and
tpch_q3 (the relational join headline). Each is best-of-3 through the
noop sink after a warm pass, with the bench's steal/jit sentinels.

Usage:
  SPARK_GRAFT_CPUS=8  python tools/bench_core_scaling.py [sf_dir] out8.json
  SPARK_GRAFT_CPUS=32 python tools/bench_core_scaling.py [sf_dir] out32.json
Merge the two JSONs into BENCH_SCALING_CORES.json (ratio = sec_8 / sec_32).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import _cpu_jiffies, _jit_probe, best_of, warmup  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "testdata_sf/sf1"
    out_path = argv[1] if len(argv) > 1 else "/tmp/core_scaling.json"

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from mortar_parquet_support_spark.operators.dedup import embedding_dedup
    from mortar_parquet_support_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("core-scaling")
    warmup(spark, cpus)
    jit_before = _jit_probe(spark, 31_000 + cpus)
    qs = entrymod.queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()

    def lsh_mode():
        # the LSH scale path (n_planes=8): NOT the oracle entry (exact
        # mode); timed here because it is the shape that must parallelize
        noop(
            embedding_dedup(
                emb, id_col="vec_id", vec_col="embedding",
                threshold=0.4, n_planes=8,
            )
        )

    runs = {
        "dedup_minhash": lambda: noop(qs["dedup_minhash"](spark, sf_dir)),
        "embedding_dedup_lsh8": lsh_mode,
        "tpch_q3": lambda: noop(qs["tpch_q3"](spark, sf_dir)),
    }
    jif0, s0 = _cpu_jiffies()
    timings = {}
    for name, fn in runs.items():
        spark.sparkContext.setJobDescription(f"core-scaling {name}")
        fn()  # warm/compile
        timings[name] = best_of(fn, runs=3)
    jif1, s1 = _cpu_jiffies()
    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "timings": timings,
        "jit_sentinel_before_sec": jit_before,
        "jit_sentinel_after_sec": _jit_probe(spark, 32_000 + cpus),
        "steal_pct": round(100.0 * (s1 - s0) / (jif1 - jif0), 2)
        if jif1 > jif0 else None,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
