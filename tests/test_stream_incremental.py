"""stream_incremental_dedup: cross-batch AND cross-run dedup through the
persisted DigestIndex, driven file-by-file with availableNow.

Invariants (robust to how the source groups files into micro-batches):
- across all batches of a run, every unseen digest surfaces exactly once;
- digests the index already held never surface;
- the index ends up holding everything it has ever emitted;
- a SECOND run over the same data emits nothing (the forever-state the
  watermarked streaming dedup cannot provide).
"""

import os

from pyspark.sql import functions as F

from mortar_parquet_support_spark.operators.incremental import DigestIndex
from mortar_parquet_support_spark.streaming.rollup import (
    stream_incremental_dedup,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def _run(spark, src, idx, chk):
    emitted = []

    def sink(df, batch_id):
        emitted.append(
            {r.d for r in df.select(F.md5("text").alias("d")).collect()}
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_incremental_dedup(
            stream, idx, digest=F.md5("text"), sink=sink
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def test_cross_batch_and_cross_run(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_docs(
        spark,
        os.path.join(src, "f1"),
        [(i, f"dup{i}") for i in range(5)] + [(5 + i, f"n{i}") for i in range(5)],
    )
    _write_docs(
        spark,
        os.path.join(src, "f2"),
        [(10 + i, f"n{i}") for i in range(5)]
        + [(15 + i, f"fresh{i}") for i in range(5)],
    )
    # the glob src/*/part*.parquet: each subdir's single file is one
    # maxFilesPerTrigger=1 micro-batch
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=4)
    idx.add(
        F.md5("text"),
        spark.createDataFrame(
            [(i, f"dup{i}") for i in range(5)], "doc_id long, text string"
        ),
    )

    emitted = _run(spark, src + "/*", idx, str(tmp_path / "chk1"))
    all_emitted = set().union(*emitted) if emitted else set()

    want = {
        r.d
        for r in spark.createDataFrame(
            [(0, f"n{i}") for i in range(5)]
            + [(0, f"fresh{i}") for i in range(5)],
            "x long, text string",
        )
        .select(F.md5("text").alias("d"))
        .collect()
    }
    assert all_emitted == want
    # exactly once across batches: no digest in two different batches
    assert sum(len(s) for s in emitted) == len(all_emitted)
    assert idx.stats()["n_digests"] == 15  # 5 seeded + 10 emitted

    # cross-run: a fresh checkpoint over the same files emits nothing
    emitted2 = _run(spark, src + "/*", idx, str(tmp_path / "chk2"))
    assert not emitted2 or set().union(*emitted2) == set()


def test_null_digests_survive_within_batch_collapse(spark, tmp_path):
    """Two NULL-text docs in ONE micro-batch: the in-batch collapse must
    not treat their NULL digests as equal (regression — dropDuplicates
    considers NULLs duplicates of each other)."""
    src = str(tmp_path / "src")
    _write_docs(
        spark, os.path.join(src, "f1"), [(1, None), (2, None), (3, "x")]
    )
    idx = DigestIndex.create(spark, str(tmp_path / "idx"), n_shards=2)
    got = []

    def sink(df, batch_id):
        got.extend(r.doc_id for r in df.select("doc_id").collect())

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src + "/*"
    )
    q = (
        stream_incremental_dedup(stream, idx, digest=F.md5("text"), sink=sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [1, 2, 3]
    assert idx.stats()["n_digests"] == 1  # only md5('x') is indexable


def test_stream_neardedup_cross_batch(spark, tmp_path):
    """Fuzzy streaming dedup: a later micro-batch's near-duplicate of an
    earlier batch's survivor is dropped; novel text survives; a second
    run over the same files emits nothing."""
    from mortar_parquet_support_spark.operators.incremental import MinHashIndex
    from mortar_parquet_support_spark.streaming.rollup import stream_neardedup

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill tonight"
    )
    near = base.replace("jumps", "leaps")
    other = (
        "entirely different text about shuffle partitions and adaptive "
        "query execution on large clusters today"
    )
    src = str(tmp_path / "src")
    _write_docs(spark, os.path.join(src, "f1"), [(1, base)])
    _write_docs(spark, os.path.join(src, "f2"), [(2, near), (3, other)])
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), num_perm=64, bands=16)

    def run(chk):
        got = []

        def sink(df, batch_id):
            got.extend(r.doc_id for r in df.select("doc_id").collect())

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            stream_neardedup(
                stream, idx, id_col="doc_id", text_col="text", sink=sink,
                threshold=0.6,
            )
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    first = run(str(tmp_path / "chk1"))
    # 1 survives (fresh index); 2 is a near-dup of 1 ONLY if f1 processed
    # first — with both files in one batch, in-batch pairs pass (contract)
    assert first in ([1, 3], [1, 2, 3])
    if first == [1, 3]:
        assert run(str(tmp_path / "chk2")) == []


def test_stream_heavy_hitters_cross_batch_merge(spark, tmp_path):
    """stream_heavy_hitters: two files driven one per micro-batch must
    merge into the same summary the batch operator computes over the
    union — exactly equal in the exact regime (k >= distinct), and
    within the MG bound (undercount <= n/(k+1), heavy items present) in
    the lossy regime."""
    from mortar_parquet_support_spark.operators.sketches import heavy_hitters
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_heavy_hitters,
    )

    rows1 = [(i, f"w{i % 7:02d}") for i in range(140)]
    rows2 = [(i, f"w{i % 4:02d}") for i in range(80)]  # skews w00..w03
    src = str(tmp_path / "src")
    _write_docs(spark, os.path.join(src, "f1"), rows1)
    _write_docs(spark, os.path.join(src, "f2"), rows2)
    batch_all = spark.createDataFrame(
        rows1 + rows2, "doc_id long, text string"
    )

    def run(k, state_dir, ckpt_dir):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            stream_heavy_hitters(
                stream, item="text", keys=[], k=k,
                state_path=str(tmp_path / state_dir),
            )
            .option("checkpointLocation", str(tmp_path / ckpt_dir))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.item: r.cnt
            for r in spark.read.parquet(str(tmp_path / state_dir)).collect()
        }

    exact = {
        r.text: r.cnt
        for r in batch_all.groupBy("text").agg(F.count("*").alias("cnt")).collect()
    }
    # exact regime: k >= 7 distinct -> state equals plain counts
    assert run(16, "state16", "ckpt16") == exact
    # lossy regime: MG bound holds after the cross-batch merge
    k = 3
    got = run(k, "state3", "ckpt3")
    n = len(rows1) + len(rows2)
    thr = n / (k + 1)
    assert len(got) <= k
    for it, f_true in exact.items():
        if f_true > thr:
            assert it in got, (it, f_true, thr)
    for it, est in got.items():
        assert exact[it] - thr <= est <= exact[it], (it, exact[it], est)
    # the streamed lossy summary equals the batch operator's on the union
    batch_mg = {
        r.item: r.cnt
        for r in heavy_hitters(batch_all, item="text", k=k).collect()
    }
    assert set(got) <= set(exact) and set(batch_mg) <= set(exact)


def test_stream_heavy_hitters_corrupt_state_fails_loudly(spark, tmp_path):
    """Regression (ADVICE r9): only a MISSING state path means 'first
    batch'. An empty/partially-written state dir also raises
    AnalysisException (unable to infer schema) — swallowing it would
    silently reset every counter to zero; it must fail the batch."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_heavy_hitters,
    )

    rows = [(i, f"w{i % 3}") for i in range(30)]
    src = str(tmp_path / "src")
    _write_docs(spark, os.path.join(src, "f1"), rows)
    state = tmp_path / "state"
    state.mkdir()  # exists but holds no parquet: NOT first-batch
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src + "/*")
    )
    q = (
        stream_heavy_hitters(
            stream, item="text", keys=[], k=8, state_path=str(state)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pt
    from pyspark.errors import StreamingQueryException

    with _pt.raises(StreamingQueryException):
        q.awaitTermination(120)


def test_stream_drift_monitor_per_batch_psi(spark, tmp_path):
    """stream_drift_monitor: each micro-batch's PSI against a FROZEN
    reference grid equals the batch psi_drift on the same rows; a batch
    matching the reference reads ~0, a shifted batch reads high."""
    import math

    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_monitor,
    )

    # reference: uniform over [0, 2) in 2 bins -> props (0.5, 0.5)
    # batch f1 mirrors it; batch f2 is all-low (hard drift)
    rows1 = [(i, 0.5) for i in range(50)] + [(i, 1.5) for i in range(50, 100)]
    rows2 = [(i, 0.1) for i in range(100, 160)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, "doc_id long, v double").coalesce(1)\
        .write.parquet(os.path.join(src, "f1"))
    spark.createDataFrame(rows2, "doc_id long, v double").coalesce(1)\
        .write.parquet(os.path.join(src, "f2"))
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_drift_monitor(
            stream, value="v", ref_lo=0.0, ref_hi=2.0,
            ref_props=[0.5, 0.5], out_path=out,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.batch_id: (r.psi, r.n) for r in spark.read.parquet(out).collect()}
    assert len(got) == 2
    psis = sorted((p, n) for p, n in got.values())
    # the mirroring batch: PSI == 0 exactly (q == p after rounding)
    assert psis[0] == (0.0, 100)
    # the all-low batch: q = (1.0, 0.0) vs p = (0.5, 0.5)
    expect = round(
        (0.5 - 1.0) * math.log(0.5 / 1.0)
        + (0.5 - 1e-4) * math.log(0.5 / 1e-4), 6
    )
    assert psis[1] == (expect, 60)
    import pytest as _pt

    # a CONSTANT reference (hi == lo) is a legal single-bin grid, same
    # as batch psi_drift and the per-key monitor (review r14 aligned this
    # leg — rejecting it crashed monitors at wiring time); non-finite
    # bounds still reject loudly
    assert stream_drift_monitor(
        stream, value="v", ref_lo=1.0, ref_hi=1.0,
        ref_props=[1.0], out_path=str(tmp_path / "const_out"),
    ) is not None
    with _pt.raises(ValueError, match="finite"):
        stream_drift_monitor(
            stream, value="v", ref_lo=0.0, ref_hi=float("inf"),
            ref_props=[1.0], out_path=out,
        )


def test_stream_drift_monitor_tiny_ref_prop_no_crash(spark, tmp_path):
    """Regression (r10 self-review): a reference proportion that is
    nonzero but rounds to 0.0 at 6 dp must take epsilon, not crash
    math.log(0) inside foreachBatch."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_monitor,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, 0.5) for i in range(10)], "doc_id long, v double"
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, v double").parquet(
        src + "/*"
    )
    q = (
        stream_drift_monitor(
            stream, value="v", ref_lo=0.0, ref_hi=2.0,
            ref_props=[1.0 - 4e-7, 4e-7],  # bin 1 rounds to 0.0 at 6 dp
            out_path=out,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].n == 10
    assert rows[0].psi is not None and rows[0].psi >= 0.0


def test_round_half_up_matches_spark_f_round(spark):
    """Regression (r11 ADVICE): the streaming drift monitor's driver-side
    rounding must match Spark's F.round (HALF_UP on the shortest decimal
    repr), not Python round()'s banker's half-even — a proportion landing
    exactly on a half at the (round_to+1)th decimal would otherwise break
    the pinned stream==batch PSI equivalence."""
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.streaming.rollup import _round_half_up

    cases = [0.0000005, 0.0000015, 0.0000025, 0.5, 1.5, 2.5, -0.0000005,
             0.1234565, 0.1234575, 1.0 / 3.0, 4e-7]
    df = spark.createDataFrame([(x,) for x in cases], "v double")
    spark_rounded = [
        r.r for r in df.select(F.round("v", 6).alias("r")).collect()
    ]
    ours = [_round_half_up(x, 6) for x in cases]
    assert ours == spark_rounded
    # the specific divergence: banker's rounding disagrees on these
    assert _round_half_up(0.0000005, 6) == 1e-6  # round() gives 0.0
    assert _round_half_up(0.0000015, 6) == 2e-6


def test_stream_drift_monitor_by_matches_batch_psi_drift_by(spark, tmp_path):
    """stream_drift_monitor_by == psi_drift_by per micro-batch for every
    group PRESENT in the batch (absent groups emit nothing — the per-key
    analogue of the global monitor's NULL-for-empty rule), on each
    group's own frozen grid."""
    from mortar_parquet_support_spark.operators.profile import psi_drift_by
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_monitor_by,
    )

    # reference: group a uniform over [0, 2); group b uniform over [10, 14)
    ref_rows = (
        [("a", 0.5)] * 25 + [("a", 1.5)] * 25
        + [("b", 10.5)] * 10 + [("b", 13.5)] * 30
    )
    ref = spark.createDataFrame(ref_rows, "g string, v double")
    # frozen grids from the reference (2 bins each), raw proportions
    grids = {"a": (0.5, 1.5, [0.5, 0.5]), "b": (10.5, 13.5, [0.25, 0.75])}
    # batch f1: both groups, a mirrors, b shifted low; f2: only group a
    f1 = [("a", 0.6, 1)] * 10 + [("a", 1.4, 1)] * 10 + [("b", 10.6, 1)] * 8
    f2 = [("a", 0.1, 2)] * 12
    src = str(tmp_path / "src")
    spark.createDataFrame(f1, "g string, v double, f long").coalesce(1)\
        .write.parquet(os.path.join(src, "f1"))
    spark.createDataFrame(f2, "g string, v double, f long").coalesce(1)\
        .write.parquet(os.path.join(src, "f2"))
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("g string, v double, f long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_drift_monitor_by(
            stream, key="g", value="v", ref_grids=grids, out_path=out,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.batch_id, r.g): (r.psi, r.n)
        for r in spark.read.parquet(out).collect()
    }
    # one batch saw both groups, the other only 'a' — 3 rows total
    assert len(got) == 3
    # batch == psi_drift_by on the same (ref, batch-as-cur) for present
    # groups, using a reference frame whose per-group bounds equal the
    # frozen grids
    by_file = {
        1: spark.createDataFrame(
            [(g, v) for g, v, _ in f1], "g string, v double"
        ),
        2: spark.createDataFrame(
            [(g, v) for g, v, _ in f2], "g string, v double"
        ),
    }
    # map file -> batch_id via row counts (batch order is not guaranteed)
    n_by_batch = {}
    for (bid, g), (_psi, n) in got.items():
        n_by_batch[bid] = n_by_batch.get(bid, 0) + n
    file_of_batch = {
        bid: (1 if total == 28 else 2) for bid, total in n_by_batch.items()
    }
    assert sorted(file_of_batch.values()) == [1, 2]
    for bid, fno in file_of_batch.items():
        batch_psi = {
            r.g: (r.psi, r.n_cur)
            for r in psi_drift_by(
                ref, by_file[fno], value="v", keys=["g"], bins=2
            ).collect()
        }
        for g in ("a", "b"):
            if (bid, g) in got:
                assert got[(bid, g)] == batch_psi[g], (bid, g)
    # absent group emits nothing: the f2 batch has no 'b' row
    f2_bid = [b for b, f in file_of_batch.items() if f == 2][0]
    assert (f2_bid, "b") not in got
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one group"):
        stream_drift_monitor_by(
            stream, key="g", value="v", ref_grids={}, out_path=out
        )


def test_stream_validate_gate_matches_batch(spark, tmp_path):
    """stream_validate_gate == validate_expectations per micro-batch
    (same rules, same counts), empty batches still report all rules at
    0, and wiring-time validation fails before any batch runs."""
    from mortar_parquet_support_spark.operators.validate import (
        validate_expectations,
    )
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_validate_gate,
    )

    rules = [
        {"name": "id_not_null", "type": "not_null", "column": "id"},
        {"name": "v_in_range", "type": "range", "column": "v",
         "min": 0.0, "max": 1.0},
    ]
    f1 = [(1, 0.5), (None, 0.2), (3, 2.0)]   # 1 null id, 1 out of range
    f2 = [(4, 0.1), (5, 0.9)]                # clean
    src = str(tmp_path / "src")
    spark.createDataFrame(f1, "id long, v double").coalesce(1)\
        .write.parquet(os.path.join(src, "f1"))
    spark.createDataFrame(f2, "id long, v double").coalesce(1)\
        .write.parquet(os.path.join(src, "f2"))
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_validate_gate(stream, rules=rules, out_path=out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.batch_id, r.rule): r.n_violations
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 4  # 2 batches x 2 rules
    # identify batches by total violations (order not guaranteed)
    batch_ids = sorted({b for b, _ in got})
    totals = {b: got[(b, "id_not_null")] + got[(b, "v_in_range")]
              for b in batch_ids}
    dirty = [b for b, t in totals.items() if t == 2]
    clean = [b for b, t in totals.items() if t == 0]
    assert len(dirty) == 1 and len(clean) == 1
    batch_report = {
        r.rule: r.n_violations
        for r in validate_expectations(
            spark.createDataFrame(f1, "id long, v double"), rules
        ).collect()
    }
    assert got[(dirty[0], "id_not_null")] == batch_report["id_not_null"] == 1
    assert got[(dirty[0], "v_in_range")] == batch_report["v_in_range"] == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one rule"):
        stream_validate_gate(stream, rules=[], out_path=out)
    with _pt.raises(ValueError, match="duplicate rule names"):
        stream_validate_gate(
            stream, rules=[rules[0], rules[0]], out_path=out
        )


def test_stream_drift_monitor_by_constant_reference_group(spark, tmp_path):
    """Regression (r11 review): a constant-valued reference group
    (hi == lo) must wire and run — everything bins to 0 on both sides,
    psi_drift_by's documented single-bin behavior — not crash at
    wiring time. A batch mirroring the constant reports PSI 0; one
    that moved off the constant still reports 0 here (single usable
    bin — pair with a range expectation to enforce constancy, as the
    batch docstring says). Infinite props are rejected loudly."""
    from mortar_parquet_support_spark.streaming.rollup import (
        stream_drift_monitor_by,
    )

    grids = {"c": (5.0, 5.0, [1.0] + [0.0] * 9)}  # constant ref, 10 bins
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("c", 5.0)] * 7 + [("c", 9.0)] * 3, "g string, v double"
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("g string, v double").parquet(src + "/*")
    q = (
        stream_drift_monitor_by(
            stream, key="g", value="v", ref_grids=grids, out_path=out,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0].psi == 0.0 and rows[0].n == 10
    import pytest as _pt

    with _pt.raises(ValueError, match="finite and non-negative"):
        stream_drift_monitor_by(
            stream, key="g", value="v",
            ref_grids={"c": (0.0, 1.0, [float("inf"), 0.0])},
            out_path=out,
        )
