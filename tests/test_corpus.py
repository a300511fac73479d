"""JSONL corpus interchange (sources/corpus.py): explicit-schema read
with corrupt-line quarantine, lazy split legs, and write/read
round-trips including gzip."""

import os

from pyspark.sql import functions as F

from mortar_parquet_support_spark.sources.corpus import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

SCHEMA = "doc_id long, text string, meta struct<lang: string>"


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_jsonl_quarantines_and_projects(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_lines(os.path.join(src, "a.jsonl"), [
        '{"doc_id": 1, "text": "hello", "meta": {"lang": "en"}}',
        '{"doc_id": 2, "text": "uni\\u00e7ode \\ud83d\\ude00"}',
        "this is not json",
        '{"doc_id": 3, "text": null, "extra_key": 42}',  # extras ignored
        '[1, 2, 3]',  # an array is not an object record
    ])
    df = read_jsonl(spark, src, schema=SCHEMA)
    good, bad = split_corrupt(df)
    rows = {r.doc_id: (r.text, r.meta) for r in good.collect()}
    assert rows[1] == ("hello", ("en",))
    assert rows[2][0] == "uniçode 😀"
    assert rows[3] == (None, None)
    assert sorted(r[0] for r in bad.collect()) == [
        "[1, 2, 3]", "this is not json",
    ]
    # the restriction regression (r11): corrupt-only and good-only
    # aggregations must work — pruning once reduced these to a
    # disallowed corrupt-only raw-JSON scan
    assert good.count() == 3 and bad.count() == 2
    import pytest

    with pytest.raises(ValueError, match="quarantine column"):
        read_jsonl(spark, src, schema="_corrupt_record string")


def test_jsonl_roundtrip_and_gzip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a b", ("en",)), (2, None, None), (3, 'quo"te\nline', ("de",))],
        SCHEMA,
    )
    out = str(tmp_path / "out")
    write_jsonl(src, out)
    good, bad = split_corrupt(read_jsonl(spark, out, schema=SCHEMA))
    assert bad.count() == 0
    assert {tuple(r) for r in good.collect()} == {
        tuple(r) for r in src.collect()
    }
    gz = str(tmp_path / "gz")
    write_jsonl(src, gz, compression="gzip")
    parts = [f for f in os.listdir(gz) if f.endswith(".gz")]
    assert parts  # actually compressed
    g2, b2 = split_corrupt(read_jsonl(spark, gz, schema=SCHEMA))
    assert b2.count() == 0 and g2.count() == 3


def test_jsonl_type_mismatch_quarantines_raw_line(spark, tmp_path):
    """spark.read.json's PERMISSIVE contract, pinned: a type-mismatched
    field counts as a parse deviation — the pre-split frame still
    carries the fields that DID parse, and split_corrupt's strict
    quarantine routes the whole raw line to the audit side (where it
    can be reprocessed) rather than half-reading it silently."""
    src = str(tmp_path / "in")
    line = '{"doc_id": "not-a-number", "text": "kept"}'
    _write_lines(os.path.join(src, "a.jsonl"), [line])
    df = read_jsonl(spark, src, schema=SCHEMA)
    pre = df.collect()[0]
    assert pre.doc_id is None and pre.text == "kept"  # partial parse
    assert pre._corrupt_record == line                # ...but flagged
    good, bad = split_corrupt(df)
    assert good.count() == 0
    assert [r[0] for r in bad.collect()] == [line]


def test_jsonl_scan_entry_plan_and_quarantine(spark):
    """The r12 jsonl_scan entry: ONE text scan feeds the whole rollup —
    including the quarantine witness, which rides the same aggregate
    under the '__quarantined__' key (review r12 killed the separate
    bad.count() second parse) — and the three planted corrupt lines
    (unparseable / type-mismatch / bare null) appear there with NULL
    chars while the per-source rows match the source parquet exactly."""
    from mortar_parquet_support_spark.entries.rowsonly import _jsonl_scan
    from mortar_parquet_support_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    out = _jsonl_scan(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one text-file scan, no JSON schema-inference scan, no extra pass
    assert plan.count("Scan text") == 1
    assert "Scan json" not in plan
    got = {(r.source, r.n_docs, r.n_chars) for r in out.collect()}
    exp = {
        (r.source, r.n_docs, r.n_chars)
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .collect()
    }
    exp.add(("__quarantined__", 3, None))
    assert got == exp and len(got) > 1
