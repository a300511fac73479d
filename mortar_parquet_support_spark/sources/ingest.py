"""Ingest per-stream sensor CSVs into the partitioned, time-sorted Parquet
lake.

Capability parity with ``/root/reference/transform.py:8-41`` (operators S1-S3,
P1-P4, P9, O1 in SURVEY.md §2), re-designed for Spark's execution model:

- The reference ingests ONE file per process invocation (driven by a bash
  loop, ``/root/reference/run-example.sh:1-3``). Here a whole directory is a
  single distributed job: every line of every CSV is read by ``spark.read
  .text`` with ``input_file_name()`` attached, headers are separated from
  data rows *inside* the plan, and the per-file stream label (the header's
  second column, ``transform.py:28``) is recovered with one broadcast join.
  No driver-side per-file loop, so 1M files ingest as one job.

- Partition layout at scale: the reference partitions by
  ``collection/uuid`` (``transform.py:39``), which at 100 TB and millions of
  streams is a small-file catastrophe (one leaf directory per stream).
  Default here: partition by ``collection`` only, range-repartition by
  ``(collection, uuid)`` and sort rows within files by ``(uuid, time)`` so
  Parquet row-group min/max stats on ``uuid`` recover stream pruning with
  far fewer files (SURVEY.md §7.1). ``partition_uuid=True`` reproduces the
  reference's exact two-level layout for byte-compatible parity.

- Time-sorted files (``transform.py:26``) are preserved via
  ``sortWithinPartitions`` so footer min/max stats stay tight and time-range
  scans skip row groups (``/root/reference/README.md:70``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# P9 (transform.py:11-16): filename must parse as a UUID, else the file is
# rejected. Hex-with-dashes form, case-insensitive.
UUID_RE = r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"

#: Lake schema — README.md:14-24; column order per transform.py:36 plus time.
LAKE_COLUMNS = ["collection", "uuid", "time", "value", "label", "uri"]


def _parse_stream_lines(
    spark: SparkSession,
    paths: list[str] | str,
    collection: str,
    time_col: str,
) -> DataFrame:
    """Read raw CSV lines from many single-stream files in one distributed
    scan and reassemble the lake schema (see :func:`_parse_lines`)."""
    lines = (
        spark.read.text(paths)
        .withColumnRenamed("value", "_line")
        .withColumn("_file", F.input_file_name())
    )
    return _parse_lines(lines, collection, time_col)


def _parse_lines(lines: DataFrame, collection: str, time_col: str) -> DataFrame:
    """Reassemble the lake schema from raw (``_line``, ``_file``) rows.

    Each input file is ``<uuid>.csv`` with header ``<time_col>,<label>``
    (FIXTURES.md F1). Header rows are filtered out of the data path and used
    (as a tiny one-row-per-file DataFrame) to recover each file's label via a
    broadcast join — the distributed replacement for pandas' per-file
    ``df.columns[0]`` (transform.py:28). Shared by the batch reader and the
    streaming foreachBatch path (each micro-batch carries whole files, so
    header/label recovery stays plain batch logic).

    Known cost, accepted deliberately: the input text is scanned TWICE —
    once to materialize the tiny header frame, once as the data side of
    the join. The alternatives are worse at scale: caching the raw lines
    trades the re-read for an equal-sized write+read of local storage,
    and propagating headers with a per-file window turns the broadcast
    join into a full shuffle of every data row. Distributed "read only
    each file's first line" needs a custom input format Spark doesn't
    ship.
    """
    lines = (
        lines
        .withColumn("_base", F.element_at(F.split(F.col("_file"), "/"), -1))
        # P9 anchored on the WHOLE basename: '<uuid>' plus AT MOST one
        # extension segment — the reference's splitext-stem check
        # (transform.py:11-16) accepts ANY extension (and none), while a
        # stray '<uuid>.backup.csv' (two segments, splitext stem not a
        # UUID) must still be rejected, not prefix-matched.
        .withColumn(
            "uuid",
            F.lower(
                F.regexp_extract(F.col("_base"), f"^({UUID_RE})(?:\\.[^.]+)?$", 1)
            ),
        )
    )
    # P9: files whose basename is not a UUID are rejected wholesale.
    lines = lines.filter(F.col("uuid") != "")

    # header/data discrimination and field positions are derived the way
    # the REFERENCE does (transform.py:20-28): the time column is located
    # by MEMBERSHIP (any position, not just first), and the value column is
    # the FIRST remaining column after popping it — so 'sensor,datetime'
    # ingests instead of being silently dropped, and a 3-column file takes
    # ONLY its value field (not 'the rest of the line' with commas).
    #
    # CSV quoting (review r14): the reference parses with pandas.read_csv,
    # where a quoted field keeps its embedded commas
    # ('datetime,"temp, indoor"' -> label 'temp, indoor'). A naive split
    # would truncate such labels, so lines containing a quote take the
    # quote-aware split (commas outside balanced quotes only) + unquote;
    # everything else keeps the cheap plain split — the hot path, since
    # data lines are unquoted '<ts>,<value>'.
    plain = F.split(F.col("_line"), ",")
    quoted = F.transform(
        F.split(F.col("_line"), r',(?=(?:[^"]*"[^"]*")*[^"]*$)'),
        lambda x: F.when(
            x.rlike('^".*"$'),
            F.regexp_replace(
                x.substr(F.lit(2), F.length(x) - 2), '""', '"'
            ),
        ).otherwise(x),
    )
    fields = F.when(F.col("_line").contains('"'), quoted).otherwise(plain)
    lines = lines.withColumn("_fields", fields)
    is_header = F.array_position(F.col("_fields"), time_col) > 0
    header = (
        lines.filter(is_header & (F.size("_fields") >= 2))
        # deterministic FIRST-candidate pick (review r14): a file with a
        # second header-like row (concatenated files, or a data field
        # literally equal to time_col) must always resolve to its actual
        # first header, the reference's line-1 semantics —
        # dropDuplicates would keep a partition-order-dependent one. The
        # monotonic id is assigned pre-shuffle on the text-scan lineage,
        # where per-partition order IS file order and split planning is
        # deterministic for fixed inputs.
        .select(
            F.col("uuid").alias("h_uuid"),
            F.col("_fields").alias("_hf"),
            F.monotonically_increasing_id().alias("__ord"),
        )
        .groupBy("h_uuid")
        .agg(F.min_by("_hf", "__ord").alias("_hf"))
        .withColumn(
            "_tpos", F.array_position(F.col("_hf"), time_col).cast("int")
        )
        # first column index that is not the time column (1-based) — the
        # reference's df.columns[0] after popping time_col
        .withColumn(
            "_vpos",
            F.when(F.col("_tpos") == 1, F.lit(2)).otherwise(F.lit(1)),
        )
        .select(
            "h_uuid",
            "_tpos",
            "_vpos",
            F.element_at(F.col("_hf"), F.col("_vpos")).alias("label"),
        )
    )

    # try_* parsing: one malformed line must null out, not abort a
    # 1M-file job (Spark 4 runs ANSI mode by default, where to_timestamp /
    # cast THROW on bad input). Rows without a parseable time are dropped —
    # a timeseries row is unaddressable without one; a null value is a
    # legitimate missing reading and is kept.
    data = lines.filter(~is_header).select("uuid", "_fields")

    # INNER join FIRST: the header carries each file's (time, value) field
    # positions, and a file with no valid header (no time_col field, or a
    # time_col-only header) has no row here, so its data rows are rejected
    # wholesale — the distributed form of the reference's missing-time-
    # column rejection (transform.py:20-23), which ingest_csv also
    # enforces driver-side.
    return (
        data.join(F.broadcast(header), data["uuid"] == header["h_uuid"], "inner")
        .select(
            "uuid",
            # try_element_at, not element_at: a truncated/blank data line
            # yields fewer fields than the header promised, and ANSI mode
            # (this engine's default) turns the out-of-range lookup into a
            # job-killing INVALID_ARRAY_INDEX error. NULL -> the
            # time-isNotNull filter drops the malformed row, matching the
            # try_* parsing contract.
            F.try_to_timestamp(
                F.try_element_at(F.col("_fields"), F.col("_tpos"))
            ).alias("time"),  # P2 (transform.py:25)
            F.try_element_at(F.col("_fields"), F.col("_vpos"))
            .try_cast("double")
            .alias("value"),
            "label",
        )
        .filter(F.col("time").isNotNull())
        .withColumn("collection", F.lit(collection))  # P3 (transform.py:31-35)
        .withColumn("uri", F.concat(F.lit(f"urn:{collection}/"), F.col("label")))
        .select(*LAKE_COLUMNS)  # P4 (transform.py:36)
    )


def ingest_directory(
    spark: SparkSession,
    collection: str,
    csv_dir: str,
    destination: str,
    *,
    time_col: str = "datetime",
    partition_uuid: bool = False,
    mode: str = "append",
) -> DataFrame:
    """Ingest every ``*.csv`` in ``csv_dir`` into the lake at ``destination``.

    Returns the DataFrame that was written (lazily re-readable). Replaces the
    reference's per-file CLI + bash loop (transform.py:44-50,
    run-example.sh:1-3) with one distributed job. A directory with no
    ``*.csv`` files is a NO-OP returning an empty frame (the bash loop
    would simply iterate zero times), not a PATH_NOT_FOUND failure.
    """
    try:
        df = _parse_stream_lines(spark, csv_dir + "/*.csv", collection, time_col)
    except Exception as exc:
        # Spark 3.4+ raises error-class PATH_NOT_FOUND; older builds say
        # "Path does not exist"; prefer the structured error class when the
        # exception exposes one (connect/classic AnalysisException both do).
        klass = None
        get_klass = getattr(exc, "getErrorClass", None)
        if callable(get_klass):
            try:
                klass = get_klass()
            except Exception:
                klass = None
        msg = str(exc)
        if klass != "PATH_NOT_FOUND" and "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        from mortar_parquet_support_spark.functions import tiny_frame

        return tiny_frame(
            spark,
            [],
            "collection string, uuid string, time timestamp, "
            "value double, label string, uri string",
        )
    write_lake(df, destination, partition_uuid=partition_uuid, mode=mode)
    return df


def ingest_csv(
    spark: SparkSession,
    collection: str,
    csv_path: str,
    destination: str,
    *,
    time_col: str = "datetime",
    partition_uuid: bool = False,
    mode: str = "append",
) -> DataFrame | None:
    """Single-file parity entry point (transform.py:8 signature).

    Returns ``None`` (and writes nothing) if the filename is not a UUID
    (transform.py:11-16) or the time column is absent (transform.py:20-23).
    """
    import os
    import re

    base = os.path.splitext(os.path.basename(csv_path))[0]
    if not re.fullmatch(UUID_RE, base):
        return None
    # time-column check by MEMBERSHIP, matching _parse_lines and the
    # reference (transform.py:20-23) — a first-column-only gate would
    # silently skip 'sensor,datetime' here while ingest_directory accepts
    # it, the same file ingesting or not by entry point (review r14)
    head = spark.read.text(csv_path).limit(1).collect()
    if not head:
        return None
    head_fields = head[0][0].split(",")
    if time_col not in head_fields or len(head_fields) < 2:
        return None
    df = _parse_stream_lines(spark, csv_path, collection, time_col)
    write_lake(df, destination, partition_uuid=partition_uuid, mode=mode)
    return df


def write_lake(
    df: DataFrame,
    destination: str,
    *,
    partition_uuid: bool = False,
    mode: str = "append",
    bloom_cols: "Sequence[str]" = (),
    bloom_ndv: int | None = None,
) -> None:
    """Write lake rows with the layout/sort discipline of SURVEY.md §4.

    - ``partition_uuid=True``: reference layout ``collection=/uuid=/``
      (transform.py:39), rows time-sorted within files (transform.py:26).
    - default: Hive-partition by ``collection`` only; range-repartition on
      ``(collection, uuid)`` so each stream's rows land contiguously in few
      files, then sort by ``(uuid, time)`` within files. Row-group stats on
      the sorted ``uuid``/``time`` columns prune stream + time predicates
      without one directory per stream.

    ``bloom_cols`` writes a parquet split-block Bloom filter per listed
    column (parquet-mr write options; ``bloom_ndv`` sizes it — pass the
    expected distinct count per ROW GROUP or the filter over- or
    under-allocates). Use it for point-lookup columns OUTSIDE the sort
    order (``label``, a secondary id): the sorted ``uuid``/``time``
    columns already prune via row-group min/max, but an unsorted column's
    stats span everything, and without a bloom a miss must decode the
    dictionary pages of every row group — at 100 TB that is the
    difference between a footer-only no and a full-scan no. Measured
    locally (4M rows, md5 keys, absent-key probe): ~3% file-size cost,
    point lookups ~20% faster even on SSD; the win grows with object-store
    latency since skipped row groups are never fetched. Spark's reader
    consumes the filters automatically (parquet-mr bloom read is on by
    default). Caveat (measured r12): parquet-mr SKIPS the bloom for a
    chunk it kept fully dictionary-encoded — low-cardinality or
    duplicate-heavy columns get no filter (nor need one: readers already
    answer point lookups exactly from the dictionary page). Presence is
    therefore a per-file fact; verify with
    :func:`~mortar_parquet_support_spark.sources.maintenance.parquet_bloom_columns`.
    """
    # the in-partition sort LEADS with the partition columns: Spark's V1
    # write path requires task rows ordered by the partition columns and
    # silently inserts a SECOND full local sort when the explicit one
    # doesn't satisfy that prefix — doubling ingest sort cost at scale
    # and leaving the documented intra-file order to the inserted sort's
    # stability (review r14). Within each written file the order is
    # unchanged: a file holds one partition value, so the tail of the
    # sort key is exactly the old (uuid, time) / (time) discipline.
    if partition_uuid:
        out = df.repartition("collection", "uuid").sortWithinPartitions(
            "collection", "uuid", "time"
        )
        partition_cols = ["collection", "uuid"]
    else:
        out = df.repartitionByRange("collection", "uuid").sortWithinPartitions(
            "collection", "uuid", "time"
        )
        partition_cols = ["collection"]
    _validate_bloom_options(df, bloom_cols, bloom_ndv, partition_cols)
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    writer = _apply_bloom_options(writer, bloom_cols, bloom_ndv)
    writer.parquet(destination)


def _validate_bloom_options(
    df: DataFrame, bloom_cols, bloom_ndv, partition_cols=()
) -> None:
    """Fail loudly BEFORE any job runs: parquet silently ignores write
    options for columns it never sees, so a typo'd bloom column would
    produce a filterless lake with no diagnostic (the exact failure
    parquet_bloom_columns exists to witness after the fact). Partition
    columns are the same silent no-op with a subtler cause — they ARE in
    ``df.columns`` but live in directory names, never in data files, so
    parquet-mr never sees them either (ADVICE r12)."""
    missing = [c for c in bloom_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bloom_cols not in frame: {missing}")
    parted = [c for c in bloom_cols if c in partition_cols]
    if parted:
        raise ValueError(
            f"bloom_cols {parted} are partition columns — they are written "
            "as directory names, not data pages, so the bloom option would "
            "be silently ignored (directory pruning already serves them)"
        )
    if bloom_ndv is not None and bloom_ndv <= 0:
        raise ValueError(f"bloom_ndv must be positive, got {bloom_ndv}")


def _apply_bloom_options(writer, bloom_cols, bloom_ndv):
    """The ONE place the per-column bloom write options are spelled —
    write_lake and write_zordered both write blooms, and two copies of
    this loop had already diverged in validation once (review r12)."""
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        if bloom_ndv is not None:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv)
            )
    return writer


def stream_ingest(
    spark: SparkSession,
    collection: str,
    csv_dir: str,
    destination: str,
    *,
    time_col: str = "datetime",
    checkpoint_dir: str | None = None,
    partition_uuid: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
    compact_max_files: int = 32,
):
    """Continuously ingest ``<uuid>.csv`` files arriving in ``csv_dir``
    into the lake — the reference's batch CLI workflow (transform.py:44-50)
    as a Structured Streaming file source.

    ``compact_every=N`` runs
    :func:`~mortar_parquet_support_spark.sources.maintenance.compact_if_fragmented`
    inside ``foreachBatch`` every N micro-batches (budget
    ``compact_max_files``): the file sink otherwise appends one file per
    collection per batch WITHOUT BOUND, and scan cost follows file count
    once files are small. The ``batch_id % N`` cadence survives restarts
    (batch ids are checkpoint-monotonic), and a crash BETWEEN compaction
    and the checkpoint commit merely replays a compaction of an
    already-compact lake (a listing probe + no-op).

    Durability (r13): the rewrite publishes through the crash-atomic
    write-audit-publish protocol in ``sources/publish.py`` — the rewrite
    is staged under a hidden ``.maint/`` transaction, audited, journaled,
    then swapped in by per-FILE renames, and a crash at ANY point
    converges via ``recover_lake`` (run automatically at the start of
    the next publish, so a crashed auto-compaction self-heals on its
    next cadence tick) with the old history intact until every staged
    partition is live. The protocol's assumptions (publish.py header):
    one maintenance writer per lake — foreachBatch serializes this
    stream's ticks, and since r14 the ``.maint/LOCK`` rejects any OTHER
    writer loudly — and rename-atomic storage (POSIX/HDFS; object-store
    copy+delete renames are witnessed safe-but-slower, prefer a
    transactional table format there).

    The file source tracks seen files in the checkpoint, so a completed
    batch's files are never re-ingested and a dropped-in file is picked up
    by the next trigger with no driver-side bookkeeping. Delivery is
    exactly-once per file in normal operation but AT-LEAST-ONCE across a
    crash inside a micro-batch: if the driver dies after the parquet
    append commits but before the checkpoint records the batch, the batch
    replays on restart and its rows duplicate (the standard
    foreachBatch-to-append caveat — a transactional sink or a
    batchId-keyed idempotent write like :func:`upsert_lake` upgrades it).
    Because the source delivers WHOLE files per micro-batch, the
    header/label recovery stays the same batch logic as
    :func:`_parse_lines` inside ``foreachBatch``, and the sink reuses
    :func:`write_lake`'s layout/sort discipline.

    ``available_now=True`` drains everything currently in the directory and
    stops (ideal for tests and catch-up runs); ``False`` keeps a live
    micro-batch query running. ``max_files_per_trigger`` bounds per-batch
    work for backfills over huge directories.

    Returns the started StreamingQuery (callers ``awaitTermination()``).
    """
    reader = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.csv")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(csv_dir).select(
        F.col("value").alias("_line"),
        F.col("_metadata.file_path").alias("_file"),
    )

    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")
    if compact_every is not None and compact_max_files < 1:
        # validate BOTH knobs before start(): an invalid budget would
        # otherwise only explode inside foreachBatch at batch N-1,
        # killing a stream that already committed data
        raise ValueError(f"compact_max_files must be >= 1, got {compact_max_files}")

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = _parse_lines(batch_df, collection, time_col)
        write_lake(parsed, destination, partition_uuid=partition_uuid, mode="append")
        if compact_every and batch_id % compact_every == compact_every - 1:
            import warnings

            from mortar_parquet_support_spark.sources.maintenance import (
                compact_if_fragmented,
            )
            from mortar_parquet_support_spark.sources.publish import (
                ConcurrentMaintenanceError,
            )

            try:
                compact_if_fragmented(
                    batch_df.sparkSession, destination,
                    max_files=compact_max_files,
                )
            except ConcurrentMaintenanceError as e:
                # another maintenance writer holds the lake's LOCK (e.g.
                # an operator-run CLI compaction) — for this best-effort
                # housekeeping tick the right move is skip-and-warn, not
                # killing a stream that already committed its batch; the
                # next cadence tick retries, and a genuinely stuck
                # foreign lock keeps warning every tick instead of
                # silently never compacting
                warnings.warn(
                    f"auto-compaction tick skipped (batch {batch_id}): {e}",
                    stacklevel=2,
                )

    writer = (
        raw.writeStream.foreachBatch(_write_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or destination.rstrip("/") + "/_ingest_checkpoint",
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
