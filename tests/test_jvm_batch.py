"""JVM-side batch file-move executor (sources/jvm_batch.py +
java/MaintBatchOps.java — VERDICT r14 "Next round" #2) and the r15
local-lock/partial-copy hardening in sources/publish.py.

The batch path's unit semantics are pinned directly against
_rename_into's contract (skip missing src, equal-size both-ends dedupe,
mismatch loud-stop vs disposable self-heal); the whole-protocol
behavior is pinned by running the SAME crash scenario through the JVM
path (the default — every test in test_publish_atomic.py exercises it)
and through the forced Python fallback, asserting identical outcomes.
The O_EXCL local lock is raced across real PROCESSES.
"""

import glob
import multiprocessing
import os

import pytest
from pyspark.sql import functions as F

from mortar_parquet_support_spark.sources.ingest import write_lake
from mortar_parquet_support_spark.sources.jvm_batch import batch_ops
from mortar_parquet_support_spark.sources.publish import (
    InjectedCrash,
    _fs,
    _local_create_exclusive,
    publish_rewrite,
    recover_lake,
)


@pytest.fixture()
def ops(spark):
    o = batch_ops(spark)
    # this sandbox ships a JDK (javax.tools present in the Spark JVM,
    # javac 17 on PATH) — a None here is a packaging regression, not an
    # environment to skip around
    assert o is not None
    return o


@pytest.fixture()
def hfs(spark, tmp_path):
    _jvm, fs, _P = _fs(spark, str(tmp_path))
    return fs


def _write(path: str, content: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


# ---------------------------------------------------------------------------
# unit semantics of the batched renameInto
# ---------------------------------------------------------------------------

def test_move_batch_moves_and_creates_parents(ops, hfs, tmp_path):
    src_a = str(tmp_path / "src/a.parquet")
    src_b = str(tmp_path / "src/nested/b.parquet")
    _write(src_a, b"aaaa")
    _write(src_b, b"bbbb")
    dst_a = str(tmp_path / "dst/deep/er/a.parquet")
    dst_b = str(tmp_path / "dst/b.parquet")
    n = ops.move_batch(hfs, [(src_a, dst_a), (src_b, dst_b)])
    assert n == 2
    assert open(dst_a, "rb").read() == b"aaaa"
    assert open(dst_b, "rb").read() == b"bbbb"
    assert not os.path.exists(src_a) and not os.path.exists(src_b)


def test_move_batch_skips_missing_src(ops, hfs, tmp_path):
    dst = str(tmp_path / "dst/x.parquet")
    assert ops.move_batch(hfs, [(str(tmp_path / "gone.parquet"), dst)]) == 1
    assert not os.path.exists(dst)  # skipped, not created


def test_move_batch_equal_size_both_ends_dedupes(ops, hfs, tmp_path):
    # the object-store crashed copy+delete signature: same immutable file
    # at both ends — the move's effect is achieved, src is deleted
    src = str(tmp_path / "live/f.parquet")
    dst = str(tmp_path / "backup/f.parquet")
    _write(src, b"same-bytes")
    _write(dst, b"same-bytes")
    ops.move_batch(hfs, [(src, dst)])
    assert not os.path.exists(src)
    assert open(dst, "rb").read() == b"same-bytes"


def test_move_batch_size_mismatch_loud_stops_nothing_deleted(
    ops, hfs, tmp_path
):
    src = str(tmp_path / "stage/f.parquet")
    dst = str(tmp_path / "live/f.parquet")
    _write(src, b"full-new-bytes")
    _write(dst, b"half")  # a mid-copy crash's partial dst
    with pytest.raises(RuntimeError, match="DIFFERENT size"):
        ops.move_batch(hfs, [(src, dst)])
    assert open(src, "rb").read() == b"full-new-bytes"  # nothing deleted
    assert open(dst, "rb").read() == b"half"


def test_move_batch_disposable_dst_self_heals(ops, hfs, tmp_path):
    # park contract: a partial file at a non-live end is deleted and the
    # move redone
    src = str(tmp_path / "live/f.parquet")
    dst = str(tmp_path / "backup/f.parquet")
    _write(src, b"full-old-bytes")
    _write(dst, b"half")
    ops.move_batch(hfs, [(src, dst)], dst_disposable=True)
    assert not os.path.exists(src)
    assert open(dst, "rb").read() == b"full-old-bytes"


def test_python_rename_into_matches_java_contract(spark, tmp_path):
    """The fallback loop and the JVM batch must enforce the SAME
    mismatch contract — loud stop on live dst, self-heal on disposable."""
    from mortar_parquet_support_spark.sources.publish import _rename_into

    _jvm, fs, P = _fs(spark, str(tmp_path))
    src = str(tmp_path / "a/src.parquet")
    dst = str(tmp_path / "b/dst.parquet")
    _write(src, b"full-bytes")
    _write(dst, b"part")
    with pytest.raises(RuntimeError, match="DIFFERENT size"):
        _rename_into(fs, P, src, dst)
    _rename_into(fs, P, src, dst, dst_disposable=True)
    assert open(dst, "rb").read() == b"full-bytes"
    assert not os.path.exists(src)


def test_list_visible_many(ops, hfs, tmp_path):
    d1 = tmp_path / "p1"
    (d1 / "uuid=x").mkdir(parents=True)
    _write(str(d1 / "b.parquet"), b"b")
    _write(str(d1 / "uuid=x/a.parquet"), b"a")   # recursion
    _write(str(d1 / ".hidden"), b"h")            # dot-hidden
    _write(str(d1 / "_SUCCESS"), b"")            # underscore-hidden
    d2 = tmp_path / "p2-empty"
    d2.mkdir()
    d3 = tmp_path / "p3-missing"                 # never created
    got = ops.list_visible_many(hfs, [str(d1), str(d2), str(d3)])
    assert got == [["b.parquet", "uuid=x/a.parquet"], [], []]


# ---------------------------------------------------------------------------
# whole-protocol parity: forced Python fallback == JVM batch default
# ---------------------------------------------------------------------------

def _mini_lake(spark, tmp_path):
    rows = [
        (coll, f"{i:08x}-0000-0000-0000-00000000000{c}",
         f"2024-01-01 00:00:{i:02d}", float(i + c), f"l{i}", f"u:{i}")
        for c, coll in enumerate(["bldgA", "bldgB"])
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, ["collection", "uuid", "time", "value", "label", "uri"]
    ).withColumn("time", F.col("time").cast("timestamp"))
    root = str(tmp_path / "lake")
    write_lake(df, root)
    return root


def _snap(spark, root):
    return {
        (r.collection, r.uuid, str(r.time), r.value)
        for r in spark.read.parquet(root).collect()
    }


def test_publish_python_fallback_parity(spark, tmp_path, monkeypatch):
    """_USE_JVM_BATCH=False drives the original pooled Python loop
    through a post-journal crash + recovery; the converged lake must be
    exactly what the (default, JVM-batched) suite pins elsewhere."""
    import mortar_parquet_support_spark.sources.publish as pub

    monkeypatch.setattr(pub, "_USE_JVM_BATCH", False)
    root = _mini_lake(spark, tmp_path)
    old = _snap(spark, root)
    frame = (
        spark.read.parquet(root)
        .withColumn("value", F.col("value") * 2)
        .select("collection", "uuid", "time", "value", "label", "uri")
    )
    with pytest.raises(InjectedCrash):
        publish_rewrite(frame, root, _fail_point="after_swap_one")
    actions = recover_lake(spark, root)
    assert [a["action"] for a in actions] == ["rolled_forward"]
    assert _snap(spark, root) == {(c, u, t, v * 2) for (c, u, t, v) in old}
    assert glob.glob(f"{root}/.maint/txn-*") == []


def test_jvm_batch_publish_roundtrip_matches_python(spark, tmp_path):
    """Same rewrite through both paths on two identical lakes — final
    states must be identical (belt to the fallback-parity suspenders)."""
    import mortar_parquet_support_spark.sources.publish as pub

    finals = {}
    for mode in (True, False):
        sub = tmp_path / f"mode-{mode}"
        sub.mkdir()
        root = _mini_lake(spark, sub)
        frame = (
            spark.read.parquet(root)
            .withColumn("value", F.col("value") * 2)
            .select("collection", "uuid", "time", "value", "label", "uri")
        )
        prev = pub._USE_JVM_BATCH
        pub._USE_JVM_BATCH = mode
        try:
            publish_rewrite(frame, root)
        finally:
            pub._USE_JVM_BATCH = prev
        finals[mode] = _snap(spark, root)
    assert finals[True] == finals[False]


# ---------------------------------------------------------------------------
# O_EXCL local lock: exactly one of N racing PROCESSES wins
# ---------------------------------------------------------------------------

def _lock_race_worker(path, barrier, results, idx):
    barrier.wait()  # maximize same-instant contention
    won = _local_create_exclusive(path, b'{"owner": "race"}')
    results[idx] = 1 if won else 0


def test_local_lock_race_exactly_one_process_wins(tmp_path):
    """The module-header guarantee the r15 lock change makes (VERDICT
    r14 "Next round" #3): on a file:// lake the create-exclusive is the
    kernel's O_CREAT|O_EXCL, so N concurrent acquirers — separate
    PROCESSES, not threads — produce exactly one winner. Five trials,
    eight processes each, all released at a barrier."""
    ctx = multiprocessing.get_context("fork")
    n = 8
    for trial in range(5):
        path = str(tmp_path / f"maint-{trial}" / "LOCK")
        barrier = ctx.Barrier(n)
        results = ctx.Array("i", [0] * n)
        procs = [
            ctx.Process(
                target=_lock_race_worker, args=(path, barrier, results, i)
            )
            for i in range(n)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=30)
            assert p.exitcode == 0
        assert sum(results) == 1, list(results)
        assert open(path, "rb").read() == b'{"owner": "race"}'


def test_maintenance_lock_routes_through_o_excl_on_local(
    spark, tmp_path, monkeypatch
):
    """A file:// lake's lock acquisition must take the syscall path, not
    Hadoop's check-then-create."""
    import mortar_parquet_support_spark.sources.publish as pub

    calls = []
    real = pub._local_create_exclusive

    def spy(path, payload):
        calls.append(path)
        return real(path, payload)

    monkeypatch.setattr(pub, "_local_create_exclusive", spy)
    root = str(tmp_path / "lake")
    os.makedirs(root)
    with pub.maintenance_lock(spark, root):
        assert calls and calls[0].endswith(".maint/LOCK")
        assert os.path.exists(f"{root}/.maint/LOCK")
    assert not os.path.exists(f"{root}/.maint/LOCK")  # released


# ---------------------------------------------------------------------------
# review-r15 regression pins
# ---------------------------------------------------------------------------

def test_local_fs_path_handles_every_file_uri_spelling(spark, tmp_path):
    """file://<authority> URIs must resolve to the SAME absolute path the
    Hadoop leg uses, or be refused (None -> Hadoop leg): the naive prefix
    strip turned file://localhost/x into the CWD-relative localhost/x,
    splitting the lock between the two legs (review r15)."""
    from mortar_parquet_support_spark.sources.publish import (
        _fs,
        _local_fs_path,
    )

    _jvm, fs, P = _fs(spark, str(tmp_path))
    assert _local_fs_path(fs, P, "/data/lake/.maint/LOCK") == "/data/lake/.maint/LOCK"
    assert _local_fs_path(fs, P, "file:/data/lake") == "/data/lake"
    assert _local_fs_path(fs, P, "file:///data/lake") == "/data/lake"
    assert _local_fs_path(fs, P, "file://localhost/data/lake") == "/data/lake"
    # foreign authority: not provably this machine -> Hadoop leg
    assert _local_fs_path(fs, P, "file://otherhost/data/lake") is None
    assert _local_fs_path(fs, P, "file://otherhost") is None
    # RELATIVE bare path (review r16): resolved through Hadoop's own
    # makeQualified (the JVM's user.dir rule), NOT the Python CWD, so an
    # os.chdir cannot split the lock between legs - and the O_EXCL leg
    # is kept (None here would demote to the racy check-then-create leg)
    jvm_cwd = fs.getWorkingDirectory().toUri().getPath()
    got = _local_fs_path(fs, P, "data/lake/.maint/LOCK")
    assert got == jvm_cwd + "/data/lake/.maint/LOCK", (got, jvm_cwd)
    import os as _os
    prev = _os.getcwd()
    _os.chdir("/tmp")
    try:  # chdir must NOT move the resolved lock path
        assert _local_fs_path(fs, P, "data/lake/.maint/LOCK") == got
    finally:
        _os.chdir(prev)


def test_batch_encoding_rejects_separator_bearing_names(ops, hfs, tmp_path):
    """ext4 permits U+0001/U+0002 in names; the batch encoding must
    loudly refuse them on BOTH directions instead of silently
    mis-splitting one real file into phantom rels (review r15)."""
    evil = str(tmp_path / "p1") + "/a\x01b.parquet"
    _write(evil, b"x")
    # Python -> JVM direction: encoding inputs are validated
    with pytest.raises(ValueError, match="control characters"):
        ops.move_batch(hfs, [(evil, str(tmp_path / "dst/a.parquet"))])
    with pytest.raises(ValueError, match="control characters"):
        ops.list_visible_many(hfs, [str(tmp_path / "d\x02ir")])
    with pytest.raises(ValueError, match="control characters"):
        ops.swap_batch(hfs, "r", "s", "b", [("collection=c\x01", [])])
    with pytest.raises(ValueError, match="control characters"):
        ops.converge_batch(hfs, "t", "r", [("c", ["re\x02l"])])
    # JVM -> Python direction: a listing that WOULD carry a separator
    # is a loud stop naming the file, not a corrupted journal
    with pytest.raises(RuntimeError, match="control characters"):
        ops.list_visible_many(hfs, [str(tmp_path / "p1")])


def test_simhash_content_free_contract_is_version_stable(spark):
    """simhash fingerprints are PERSISTED (banded across lake versions),
    so the r14 contract is pinned against tokenization-spelling changes
    (review r15): content-free text (empty or all-whitespace) -> fp 0,
    NULL text -> fp 0 (NULL tokens through the vote combiner), and
    boundary whitespace must not shift a real document's fingerprint
    (the r8 phantom-token fix, kept by the r15 ws_tokens spelling)."""
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "   \t\n "), ("c", ""),
         ("d", None), ("e", "\thello world ")],
        "id string, text string",
    )
    fp = {r.id: r.fp for r in
          df.select("id", simhash(F.col("text")).alias("fp")).collect()}
    assert fp["b"] == 0 and fp["c"] == 0
    assert fp["d"] == 0
    assert fp["a"] == fp["e"] != 0


def test_simhash_dedup_exploded_fingerprints_match_column_spelling(spark):
    """simhash_dedup computes fingerprints via the r16 exploded codegen
    formulation (distinct tokens exploded, one 64-way ±1 vote aggregate)
    instead of the interpreted simhash() Column — this pins the two
    spellings bit-equal over the edge battery (multi-token, repeated
    tokens where array_distinct matters, single token, tab/newline
    boundaries, mixed case) so the persisted-fingerprint contract can
    never drift between the projection and the banding paths."""
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.operators.dedup import (
        simhash,
        simhash_dedup,
    )

    rows = [
        ("a", "hello world"),
        ("b", "Hello HELLO world world world"),  # casefold + distinct
        ("c", "one"),
        ("d", "\tone two\nthree  four "),
        ("e", "z y x w v u t s r q p"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    want = {
        r.id: r.fp
        for r in df.select("id", simhash(F.col("text")).alias("fp")).collect()
    }
    # pair every doc with itself via a duplicate id-space so each id's
    # fingerprint appears in the output regardless of banding luck
    dup = df.select(F.concat(F.lit("dup_"), "id").alias("id"), "text")
    pairs = simhash_dedup(
        df.unionByName(dup), id_col="id", text_col="text"
    ).collect()
    got = {}
    for r in pairs:
        got[r.id_a] = r.simhash_a
        got[r.id_b] = r.simhash_b
    # every original doc has an identical dup_ twin, so all ids appear
    for key, fp in want.items():
        assert got[key] == fp, key
        assert got["dup_" + key] == fp, key


def test_fingerprint_band_pairs_skip_barrier_identical(spark):
    """skip_barrier=True (r16: skip the internal barrier when the
    caller already cut the lineage) must change the plan only, never the
    candidate set."""
    from pyspark.sql import functions as F

    from mortar_parquet_support_spark.functions import materialize
    from mortar_parquet_support_spark.operators.dedup import (
        fingerprint_band_pairs,
    )

    df = spark.createDataFrame(
        [(i, (i % 7) * 0x0101_0101_0101_0101) for i in range(40)],
        "id long, fp long",
    )
    base = fingerprint_band_pairs(df, id_col="id", fp_col="fp")
    fast = fingerprint_band_pairs(
        materialize(df), id_col="id", fp_col="fp", skip_barrier=True
    )
    # collected compare, not exceptAll: both frames share the source df's
    # attribute ids, which trips Spark's exceptAll attribute dedup
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, fast.collect()))
    assert base.count() > 0  # the fixture must actually produce pairs


def test_pooled_batch_failure_propagates_and_loud_stops(ops, hfs, tmp_path):
    """r16 executor semantics: with the bounded pool's width genuinely
    BINDING (100 units at width 4, so ~96 units sit queued when the
    poison unit throws and MUST take the short-circuit path — review
    r16: at width >= unit count every unit is in flight before the
    failure and the queued-unit gate goes untested), a failing unit's
    root-cause message surfaces as the same RuntimeError the serial
    walk produced, the offending pair is untouched (loud stop, nothing
    deleted), and no OTHER unit is corrupted — every non-failing move
    either completed or was skipped cleanly (src intact XOR moved,
    never lost, never partial)."""
    n = 100
    moves = []
    for i in range(n):
        src = str(tmp_path / f"stage/f{i:02d}.parquet")
        _write(src, b"new-bytes-%02d" % i)
        moves.append((src, str(tmp_path / f"live/f{i:02d}.parquet")))
    # poison ONE early unit: live dst exists with a different size
    bad_src, bad_dst = moves[3]
    _write(bad_dst, b"half")
    import mortar_parquet_support_spark.sources.publish as pub

    prev_width = pub._JVM_BATCH_THREADS  # the configured truth, not a
    ops.set_parallelism(4)               # hardcoded 32 (review r16)
    try:
        with pytest.raises(RuntimeError, match="DIFFERENT size"):
            ops.move_batch(hfs, moves)
    finally:  # process-wide JVM static — never leak a narrowed width
        ops.set_parallelism(prev_width)
    assert open(bad_src, "rb").read() == b"new-bytes-03"  # nothing deleted
    assert open(bad_dst, "rb").read() == b"half"
    statuses = set()
    for i, (src, dst) in enumerate(moves):
        if i == 3:
            continue
        moved = os.path.exists(dst)
        skipped = os.path.exists(src)
        assert moved != skipped, (i, moved, skipped)  # exactly one end
        statuses.add("moved" if moved else "skipped")
        data = open(dst if moved else src, "rb").read()
        assert data == b"new-bytes-%02d" % i  # never partial
    # the short-circuit actually fired: at least one queued unit was
    # skipped (width 4, poison in the first wave — ~96 units queued).
    # NOT statuses == {"moved","skipped"}: on a contended box the other
    # first-wave workers can observe the flag before moving anything,
    # making ALL non-poison units skipped — correct behavior, and the
    # strict-equality spelling would flake on it (review r16)
    assert "skipped" in statuses, statuses
    # retry after operator remediation converges the rest idempotently —
    # every move COMPLETES: dst carries the bytes and src is consumed
    # (content-only asserts would pass a rename degraded to copy)
    os.remove(bad_dst)
    ops.move_batch(hfs, moves)
    for i, (src, dst) in enumerate(moves):
        assert open(dst, "rb").read() == b"new-bytes-%02d" % i
        assert not os.path.exists(src), src
