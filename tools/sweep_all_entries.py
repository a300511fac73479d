"""Measure-first sweep for the optimization rounds: time EVERY registry
entry once at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) through the noop sink
and print a JSON object sorted by wall seconds, so non-headline entries that
are unexpectedly expensive get found instead of assumed fine.

One run per entry (this is a triage scan, not a gated artifact — the
headline set keeps bench.py's median/sentinel discipline); plan construction
time is included, matching bench.py's timer contract. Entries that need
session indexes build them outside the timed region when they are the
memoized serving shape (knn_ivf's probe), inside it when the entry itself
owns the build.

Usage: python tools/sweep_all_entries.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    out_path = argv[0] if argv else "/tmp/sweep_entries.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("sweep-entries")
    import bench

    bench.warmup(spark, int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))

    qs = entrymod.queries()
    entrymod.ivf_index_for(spark, sf_dir)  # knn_ivf times the PROBE, as in bench

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {timings.get(name, 'ERR')}", flush=True)

    result = {
        "sf_dir": sf_dir,
        "total_sec": round(sum(timings.values()), 3),
        "timings_desc": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])
        ),
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"total_sec": result["total_sec"], "n": len(timings), "errors": len(errors)}))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
