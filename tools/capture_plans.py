"""Capture ``.explain("formatted")`` for every bench headline query (plus
any extra names given on the command line) into ``plans/<tag>/<name>_<suffix>.txt``.

Usage: python tools/capture_plans.py <tag> <suffix> [name ...]
e.g.   python tools/capture_plans.py r16 before

Plan-only (no execution) EXCEPT for entries whose callable eagerly
materializes intermediates (dedup_minhash's LSH barriers, knn_ivf's index
build) — those run their eager stages while the DataFrame is constructed,
exactly as the bench does, so the captured plan is the one the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    tag, suffix = argv[0], argv[1]
    extra = argv[2:]

    import bench
    import __spark_entry__ as entrymod
    from mortar_parquet_support_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    names = list(dict.fromkeys(list(bench.HEADLINE) + extra))
    for name in names:
        if name == "knn_ivf":
            entrymod.ivf_index_for(spark, sf_dir)  # probe plan needs the index
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
