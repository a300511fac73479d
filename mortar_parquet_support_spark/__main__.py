"""Operational CLI: ``python -m mortar_parquet_support_spark <cmd>``.

Interface parity with the reference's shell workflow so its users can
switch without rewriting their scripts:

- ``ingest``   == ``python transform.py collection csv destination
  [time_col]`` (reference transform.py:44-49) — and because the source
  here is distributed, one invocation on a DIRECTORY replaces the whole
  ``run-example.sh`` for-loop (run-example.sh:1-3: one driver process
  per CSV file) with a single job over every file.
- ``metadata`` == ``python make-metadata.py <parquet-directory>``
  (make-metadata.py:26-29).
- ``compact`` / ``upsert`` / ``zorder`` / ``recover`` have no reference
  equivalent (the reference lake is write-once); they expose the
  maintenance layer the streaming sink needs (sources/maintenance.py)
  and the crash-atomic publish protocol's recovery (sources/publish.py).

Every command prints one human-readable result line to stdout and exits
non-zero on rejection (bad path, non-UUID single file) — scriptable the
way the originals were.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m mortar_parquet_support_spark",
        description="Lake operations (ingest / metadata / compact / "
        "upsert / zorder / recover)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser(
        "ingest", help="CSV file or directory -> partitioned parquet lake"
    )
    ing.add_argument("collection")
    ing.add_argument("csv_path", help="one <uuid>.csv or a directory of them")
    ing.add_argument("destination")
    ing.add_argument("--time-col", default="datetime")
    ing.add_argument(
        "--partition-uuid",
        action="store_true",
        help="reference byte-parity layout collection=/uuid=/",
    )
    ing.add_argument(
        "--count",
        action="store_true",
        help="print the ingested row count (re-reads the sources: a "
        "second full scan — skip it for large backfills)",
    )

    md = sub.add_parser(
        "metadata", help="write _metadata/_common_metadata summary footers"
    )
    md.add_argument("root")

    def _bloom_args(sp):
        # one spelling for every rewrite subcommand: parquet options are
        # per-write, so a maintenance op that cannot re-state the lake's
        # blooms silently strips them (the r12 passthrough rationale)
        sp.add_argument(
            "--bloom-cols", default=None,
            help="comma-separated columns whose parquet Bloom filters the "
            "rewrite must re-state (per-write options — omitted = stripped)",
        )
        sp.add_argument("--bloom-ndv", type=int, default=None)

    def _lock_args(sp):
        sp.add_argument(
            "--break-lock-after", type=float, default=None, metavar="SECS",
            help="TTL takeover of a maintenance LOCK whose owner cannot be "
            "proven dead (foreign host / unreadable payload): break it when "
            "the lock file is older than SECS. Same-host dead owners are "
            "broken automatically; same-host LIVE owners never are.",
        )

    cp = sub.add_parser("compact", help="rewrite small files back to few")
    cp.add_argument("root")
    cp.add_argument(
        "--collections", default=None,
        help="comma-separated subset (default: all)",
    )
    cp.add_argument(
        "--max-files", type=int, default=None,
        help="auto mode: compact ONLY collections over this file budget",
    )
    cp.add_argument("--target-rows-per-file", type=int, default=None)
    _bloom_args(cp)
    _lock_args(cp)

    up = sub.add_parser(
        "upsert",
        help="merge a lake-schema parquet of updates into the lake "
        "(newest row per key wins; only touched collections rewrite)",
    )
    up.add_argument("root")
    up.add_argument("updates", help="parquet path with lake-schema rows")
    up.add_argument(
        "--keys", default="collection,uuid,time",
        help="comma-separated merge key (default: collection,uuid,time)",
    )
    _bloom_args(up)
    _lock_args(up)

    zo = sub.add_parser(
        "zorder",
        help="rewrite a parquet table clustered on a Z-order key",
    )
    zo.add_argument("src", help="parquet table to read")
    zo.add_argument("dest", help="destination directory (must not exist)")
    zo.add_argument(
        "--cols", required=True,
        help="comma-separated numeric/timestamp columns to interleave",
    )
    zo.add_argument("--bits", type=int, default=16)
    zo.add_argument("--files", type=int, default=None)
    _bloom_args(zo)

    rc = sub.add_parser(
        "recover",
        help="converge any crashed maintenance publish (write-audit-"
        "publish transactions under <root>/.maint) to a consistent lake",
    )
    rc.add_argument("root")
    _lock_args(rc)
    return p


def _bloom_tuple(args) -> tuple:
    return tuple(args.bloom_cols.split(",")) if args.bloom_cols else ()


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "metadata":
        # pure PyArrow footer work — paying a JVM + SparkSession spin-up
        # (tens of seconds) for it would be the CLI's own anti-pattern
        from mortar_parquet_support_spark.sources.lake import (
            write_metadata_summary,
        )

        info = write_metadata_summary(args.root)
        print(f"_metadata written: {info['fragments']} fragments, "
              f"{info['rows']} rows")
        return 0

    from mortar_parquet_support_spark.session import get_spark

    spark = get_spark("mortar-cli")

    if args.cmd == "ingest":
        from mortar_parquet_support_spark.sources.ingest import (
            ingest_csv,
            ingest_directory,
        )

        if os.path.isdir(args.csv_path):
            df = ingest_directory(
                spark, args.collection, args.csv_path, args.destination,
                time_col=args.time_col, partition_uuid=args.partition_uuid,
            )
        else:
            df = ingest_csv(
                spark, args.collection, args.csv_path, args.destination,
                time_col=args.time_col, partition_uuid=args.partition_uuid,
            )
            if df is None:  # same rejections as transform.py:11-23
                print(f"rejected {args.csv_path} (non-UUID name or missing "
                      f"{args.time_col!r} column)")
                return 1
        # counting means re-executing the parse lineage (a second full
        # source scan) — opt-in, never the default cost of an ingest
        suffix = f": {df.count()} rows" if args.count else ""
        print(f"ingested {args.csv_path}{suffix}")
        return 0

    if args.cmd == "compact":
        from mortar_parquet_support_spark.sources.maintenance import (
            compact_collections,
            compact_if_fragmented,
        )

        if args.max_files is not None and args.collections is not None:
            # refusing beats silently compacting collections the user
            # explicitly scoped out (auto mode scans the whole lake)
            print("--max-files (auto mode) and --collections are mutually "
                  "exclusive")
            return 2
        if args.max_files is not None:
            done = compact_if_fragmented(
                spark, args.root, max_files=args.max_files,
                target_rows_per_file=args.target_rows_per_file,
                bloom_cols=_bloom_tuple(args), bloom_ndv=args.bloom_ndv,
                stale_after_secs=args.break_lock_after,
            )
            print(f"compacted {len(done)} collection(s): "
                  f"{', '.join(done) if done else '(none over budget)'}")
            return 0
        colls = (
            args.collections.split(",") if args.collections else None
        )
        compact_collections(
            spark, args.root, collections=colls,
            target_rows_per_file=args.target_rows_per_file,
            bloom_cols=_bloom_tuple(args), bloom_ndv=args.bloom_ndv,
            stale_after_secs=args.break_lock_after,
        )
        print(f"compacted {args.root} "
              f"({'all collections' if colls is None else ', '.join(colls)})")
        return 0

    if args.cmd == "upsert":
        from mortar_parquet_support_spark.sources.maintenance import (
            upsert_lake,
        )

        keys = tuple(k for k in args.keys.split(",") if k)
        if not keys:
            print("--keys must name at least one column")
            return 2
        updates = spark.read.parquet(args.updates)
        n = updates.count()
        upsert_lake(
            spark, args.root, updates, keys=keys,
            bloom_cols=_bloom_tuple(args), bloom_ndv=args.bloom_ndv,
            stale_after_secs=args.break_lock_after,
        )
        print(f"upserted {n} update row(s) from {args.updates} into "
              f"{args.root} on ({args.keys})")
        return 0

    if args.cmd == "zorder":
        from mortar_parquet_support_spark.sources.maintenance import (
            write_zordered,
        )

        df = spark.read.parquet(args.src)
        write_zordered(
            df, args.dest, cols=args.cols.split(","), bits=args.bits,
            files=args.files,
            bloom_cols=_bloom_tuple(args), bloom_ndv=args.bloom_ndv,
        )
        print(f"z-ordered {args.src} -> {args.dest} on {args.cols}")
        return 0

    if args.cmd == "recover":
        from mortar_parquet_support_spark.sources.publish import recover_lake

        actions = recover_lake(
            spark, args.root, stale_after_secs=args.break_lock_after
        )
        if not actions:
            print(f"{args.root}: no pending maintenance transactions")
        for a in actions:
            print(f"{a['action']}: {a['txn']}")
        return 0

    raise AssertionError(f"unhandled command {args.cmd}")  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
