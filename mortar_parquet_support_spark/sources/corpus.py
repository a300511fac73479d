"""Corpus interchange formats — JSONL in/out for document tables.

Web-scale text corpora ship as JSONL (one JSON object per line:
id / text / metadata), not parquet — this is the ingest/egress leg the
LLM-pipeline operators need in front of them. Not in the reference
(its only text input is per-stream CSV — SURVEY §2.1 S1); extends the
north-star scope the same way the dedup/search families do.

Design rules, each load-bearing at 100 TB:

- **Schema is REQUIRED on read.** Spark's JSON schema inference is a
  full extra pass over the data before the real one — a silent 2x read
  of a 100 TB corpus. Callers state what they expect; mismatching
  records land in the quarantine column instead of silently shifting
  types.
- **Corrupt records quarantine, never vanish.** PERMISSIVE mode with an
  explicit corrupt-record column, split into (good, bad) frames by
  :func:`split_corrupt` — a feed with 0.1% truncated lines should lose
  0.1% of rows to a quarantine you can audit, not fail the job
  (FAILFAST) or silently NULL fields (default DROPMALFORMED-ish
  reads).
- **Compression note:** ``.gz`` inputs read transparently but gzip is
  NOT splittable — one task per file, so a corpus of few huge .gz
  files serializes. Prefer many files (the layout crawls produce
  anyway) or zstd/bzip2 when you control the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: the quarantine column read_jsonl adds (Spark's conventional name)
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: "StructType | str",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read a JSONL corpus (one object per line; ``.gz`` transparent)
    with an EXPLICIT schema and corrupt-line quarantine: malformed
    lines come back as rows with every schema field NULL and the raw
    line in ``corrupt_col``; well-formed lines have ``corrupt_col``
    NULL. Split with :func:`split_corrupt`.

    The declared fields are the projection — extra JSON keys are
    ignored (schema-on-read column pruning: the parser never
    materializes them), missing keys read as NULL. Multi-line JSON
    arrays are NOT handled (that is ``multiLine``, a different and
    non-splittable format).

    Physical shape — deliberately TEXT scan + ``from_json`` expression,
    NOT ``spark.read.json`` with a corrupt-record column: Spark
    disallows any plan whose raw-JSON scan references only the corrupt
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    column pruning reduces innocent-looking downstream plans — a
    ``count()`` after dropping the quarantine column, a corrupt-only
    quarantine write — to exactly that, failing at action time. Parsing
    as an expression sidesteps the restricted scan entirely while using
    the same JVM Jackson parser, keeps both split legs fully lazy, and
    still prunes unreferenced fields (OptimizeJsonExprs). Corruptness
    matches ``spark.read.json``'s PERMISSIVE contract exactly: the
    quarantine column records any parse DEVIATION — an unparseable
    line, a non-object line, or a type-mismatched field (whose other
    fields still parse in this frame; :func:`split_corrupt`'s strict
    quarantine routes the whole raw line to the audit side, where it
    can be reprocessed rather than silently half-read). A bare ``null``
    line quarantines (it carries no fields)."""
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if corrupt_col in [f.name for f in schema.fields]:
        raise ValueError(
            f"schema already contains the quarantine column {corrupt_col!r}"
        )
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
    )
    lines = spark.read.text(path)
    parsed = lines.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__j"),
        "value",
    )
    # the parser populates corrupt_col itself; the coalesce covers the
    # one case it returns a NULL struct instead (e.g. an empty line)
    return parsed.select(
        *[F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields],
        F.coalesce(
            F.col(f"__j.{corrupt_col}"),
            F.when(F.col("__j").isNull(), F.col("value")),
        ).alias(corrupt_col),
    )


def split_corrupt(
    df: DataFrame, *, corrupt_col: str = CORRUPT_COL
) -> "tuple[DataFrame, DataFrame]":
    """(good, quarantined) from a :func:`read_jsonl` frame: good rows
    with the quarantine column dropped (lazy), bad rows as
    (``corrupt_col``,) — the raw lines, ready to write to a quarantine
    path for audit.

    Both legs stay LAZY: read_jsonl parses via a text scan +
    ``from_json`` expression precisely so the corrupt-record-scan
    restriction (see its docstring) cannot fire on either projection,
    no matter how far pruning reduces them."""
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    compression: "str | None" = None,
) -> None:
    """Write a corpus frame as JSONL (one object per line, one file per
    partition — the many-files layout that keeps reads splittable).
    ``compression``: None / 'gzip' / 'bzip2' / others Spark supports;
    remember gzip parts are unsplittable on the way back in. NULL-valued
    fields are omitted per line (Spark's JSON writer convention —
    readers treat absent and NULL alike, which :func:`read_jsonl`
    does)."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)
