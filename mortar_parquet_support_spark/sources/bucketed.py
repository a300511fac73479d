"""Bucketed-table support: co-located joins with NO shuffle at query time.

At 100 TB the dominant cost of a fact-to-fact join (e.g. lineitem ⨝ orders
on orderkey, or a self-join of the event stream) is the shuffle of both
sides. Hive-style bucketing pre-shuffles ONCE at write time: both tables
are written with ``bucketBy(n, key)``, so a later equi-join on the bucket
key reads matching buckets pairwise and joins them in place — the physical
plan has SortMergeJoin/ShuffledHashJoin with ZERO Exchange operators
(asserted in tests/test_bucketed.py).

Sizing rule of thumb for 100 TB: pick ``n_buckets`` so one bucket of the
bigger table is ~128-512 MB compressed (e.g. ~50 TB side → 131072 buckets);
both join sides MUST use the same n_buckets for shuffle-free co-location.
A divisor count also works, but ONLY with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` (off by default in
vanilla Spark; session.py turns it on) and within
``coalesceBucketsInJoin.maxBucketRatio`` (default 4).

This is the "pre-partitioned lake" leg of the scale strategy; the Hive
partition-pruning leg lives in sources/lake.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "error",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets on the join key upgrades the later join to a
    sort-merge over pre-sorted runs (no Sort operator either) and keeps
    min/max row-group stats tight for point lookups on the key.

    ``mode`` defaults to 'error' like every other writer in this package —
    a pre-shuffled fact table is exactly the artifact one least wants
    silently destroyed. ``mode='overwrite'`` additionally recovers from an
    ORPHANED managed location (a crashed session or recreated metastore
    that lost the catalog entry but left the warehouse directory behind):
    saveAsTable refuses to reuse such a location even in overwrite mode,
    so the helper deletes the leftover directory through the Hadoop
    FileSystem first (works on any scheme, not just local disk). The
    cleanup ONLY runs when the catalog has no entry for the table — a
    LIVE table is overwritten by saveAsTable itself, which keeps its two
    protections: the old data survives a failed write, and overwriting a
    table the input is also reading from still fails instead of
    destroying the source. Database-qualified names skip the orphan
    cleanup — their location layout is metastore-specific.
    """
    spark = df.sparkSession
    if mode == "overwrite" and "." not in table and not spark.catalog.tableExists(table):
        jvm = spark.sparkContext._jvm
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
        fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    writer = df.write.mode(mode).format(format).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    *,
    on: list[str],
    how: str = "inner",
    prefer_merge: bool = True,
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    Declarative on purpose: Catalyst recognizes both sides' bucket spec and
    plans the join without any ShuffleExchange. ``prefer_merge`` (default)
    adds a merge-join hint — the honest model of the target workload, where
    BOTH sides are fact-scale and broadcasting is impossible; without it, a
    side small enough to broadcast makes the planner pick a broadcast join
    and mark the scans ``Bucketed: false (disabled by query planner)``.
    Callers should NOT repartition here — that would throw away the
    co-location.
    """
    left = spark.table(left_table)
    if prefer_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=on, how=how)
