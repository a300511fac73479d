"""Runtime-compiled JVM batch executor for publish/recovery file moves.

Why this exists (VERDICT r14 "Next round" #2): the publish protocol's
swap and converge phases are per-file metadata work — driven from
Python, every rename/exists/mkdirs is a py4j round trip.
BENCH_RECOVERY measured 24 ms/partition serial with the thread pool
capped at ~1.3x by the GIL, which at a 100k-partition rewrite is ~40
minutes of driver RPC in the publish swap and again in any recovery.
The fix is architectural, not incremental: execute the whole move list
in ONE py4j call, with the loop living JVM-side
(java/MaintBatchOps.java) against the SAME Hadoop FileSystem object —
so scheme semantics, object-store mimics, and crash injection all
still apply verbatim.

The class is compiled once per process at first use:

- preferred: ``javax.tools.ToolProvider.getSystemJavaCompiler()``
  reached over py4j — compiles INSIDE the running Spark JVM, against
  that JVM's own classpath (Hadoop included), no external toolchain;
- fallback: a ``javac`` subprocess against pyspark's bundled
  ``hadoop-client-api`` jar (the tests/test_objstore_publish.py
  recipe, proven in this sandbox since r14);
- neither available (JRE-only deployment): :func:`batch_ops` returns
  None and publish.py keeps its original Python pooled loop — the
  batch path is an accelerator, never a requirement.

The compiled class is loaded through a ``URLClassLoader`` and driven as
an instance: py4j resolves methods reflectively on the object's runtime
class, so nothing needs to be on the system classpath at JVM launch
(unlike custom FileSystem impls, which Hadoop's conf instantiates by
name and therefore DO need launch-time classpath — the reason
tests/test_objstore_publish.py runs a subprocess session).

Batch encoding: one string per call, groups separated by U+0001 and
fields by U+0002. Spark never writes names containing those control
characters, but ext4/HDFS PERMIT them, so both directions enforce the
precondition loudly instead of assuming it (:func:`_check_encodable`
on everything Python encodes; MaintBatchOps.collectVisible on every
listing the JVM returns) — a violating name is a clear error naming
the file, never a silent mis-split. A ``String[]`` return would cost
one py4j round trip per ELEMENT to read back; a single string crosses
the bridge once in each direction.
"""

from __future__ import annotations

import glob
import os
import subprocess
import tempfile
import threading
import warnings

_GROUP = "\x01"
_FIELD = "\x02"
_CLASS_NAME = "MaintBatchOps"
_JAVA_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "java",
    f"{_CLASS_NAME}.java",
)

# (class_dir | None) once compiled; ONE (gateway, BatchOps) slot for the
# live Spark JVM. Holding the gateway object (not its id()) makes the
# ADVICE-r15 aliasing failure structurally unreachable — a recycled
# id() after a session stop could otherwise hand back a BatchOps bound
# to a dead JVM — and a single slot (not a dict) means a host that
# cycles sessions overwrites the dead entry instead of accumulating one
# pinned gateway per cycle (review r16). The lock serializes first-use
# compilation across threads (streaming ticks and CLI maintenance can
# race into the first publish).
_lock = threading.Lock()
_class_dir: str | None | bool = False  # False = not yet attempted
_instance: "tuple[object, BatchOps | None] | None" = None


def _root_message(exc) -> str:
    """The deepest Java cause's message — so a batch-path failure reads
    like the Python loop's RuntimeError did ('publish: rename failed:
    ...'), not like a py4j stack trace."""
    je = getattr(exc, "java_exception", None)
    if je is None:
        return str(exc)
    try:
        while je.getCause() is not None:
            je = je.getCause()
        return je.getMessage() or str(exc)
    except Exception:
        return str(exc)


def _compile_class(spark) -> str | None:
    """Compile MaintBatchOps.java into a per-process temp dir; returns
    the class dir or None when no compiler exists anywhere."""
    out_dir = tempfile.mkdtemp(prefix="maint-batch-ops-")
    # in-JVM compiler first: compiles against the running JVM's own
    # classpath, so Hadoop symbols resolve wherever Spark itself runs
    try:
        jvm = spark._jvm
        compiler = jvm.javax.tools.ToolProvider.getSystemJavaCompiler()
        if compiler is not None:
            cp = jvm.java.lang.System.getProperty("java.class.path")
            rc = compiler.run(
                None, None, None, "-cp", cp, "-d", out_dir, _JAVA_SRC
            )
            if rc == 0:
                return out_dir
    except Exception:
        pass
    # javac subprocess against pyspark's bundled hadoop-client-api jar
    # (the objstore-mimic test's recipe)
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        hadoop_api = glob.glob(os.path.join(jars, "hadoop-client-api-*.jar"))
        if not hadoop_api:
            return None
        subprocess.run(
            ["javac", "-cp", hadoop_api[0], "-d", out_dir, _JAVA_SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out_dir
    except Exception:
        return None


def _load_instance(spark, class_dir: str):
    """URLClassLoader over the compiled dir, parented to the context
    classloader so Hadoop types resolve; an INSTANCE comes back so py4j
    can dispatch methods reflectively on its runtime class."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    url = jvm.java.io.File(class_dir).toURI().toURL()
    urls = gw.new_array(jvm.java.net.URL, 1)
    urls[0] = url
    loader = jvm.java.net.URLClassLoader(
        urls, jvm.java.lang.Thread.currentThread().getContextClassLoader()
    )
    clazz = jvm.java.lang.Class.forName(_CLASS_NAME, True, loader)
    # py4j cannot express zero-arg VARARGS calls (getDeclaredConstructor()
    # -> "Method getDeclaredConstructor([]) does not exist"); pass the
    # empty Class[]/Object[] explicitly
    ctor = clazz.getDeclaredConstructor(gw.new_array(jvm.java.lang.Class, 0))
    return ctor.newInstance(gw.new_array(jvm.java.lang.Object, 0))


def _check_encodable(*strings: str) -> None:
    """The batch encoding's one precondition, enforced loudly: no path
    may contain the U+0001/U+0002 separators. Spark never writes such
    names, but ext4/HDFS permit them, and a silent mis-split would turn
    one real file into two phantom rels the swap then skips as
    already-moved (review r15). The JVM side enforces the same check on
    listings it RETURNS (MaintBatchOps.collectVisible)."""
    for s in strings:
        if _GROUP in s or _FIELD in s:
            raise ValueError(
                "path contains batch-encoding control characters "
                f"(U+0001/U+0002): {s!r} — rename it, or run this lake "
                "through the Python fallback (_USE_JVM_BATCH = False)"
            )


class BatchOps:
    """Typed front for one JVM-side MaintBatchOps instance. Every method
    is ONE py4j call regardless of batch size; Java-side failures
    re-raise as RuntimeError carrying the root-cause message so callers
    (and the crash-injection suites) see the same loud-stop text the
    Python loop produced."""

    def __init__(self, inst):
        self._inst = inst
        self._parallelism: int | None = None  # last value pushed JVM-side

    def set_parallelism(self, n: int) -> None:
        """Fan-out width for batch units (partitions; standalone moves)
        inside the JVM executor — see MaintBatchOps.parallelism for the
        sizing rationale (32 default covers object-store RPC latency;
        1 restores the serial walk, which crash-injection suites use for
        determinism). Cached Python-side so repeated publishes with an
        unchanged width cost zero extra py4j trips."""
        n = max(1, int(n))
        if n != self._parallelism:
            self._call("setParallelism", n)
            self._parallelism = n

    def _call(self, name: str, *args):
        try:
            return getattr(self._inst, name)(*args)
        except Exception as exc:
            if type(exc).__name__ == "Py4JJavaError":
                raise RuntimeError(_root_message(exc)) from None
            raise

    def move_batch(
        self, fs, moves: list[tuple[str, str]], *, dst_disposable: bool = False
    ) -> int:
        """_rename_into over a (src, dst) list; count of non-empty
        groups. ``dst_disposable`` carries _rename_into's park/promote
        mismatch contract (see its docstring)."""
        if not moves:
            return 0
        _check_encodable(*(x for pair in moves for x in pair))
        enc = _GROUP.join(f"{s}{_FIELD}{d}" for s, d in moves)
        return self._call("moveBatch", fs, enc, dst_disposable)

    def list_visible_many(self, fs, dirs: list[str]) -> list[list[str]]:
        """_list_visible_files for every dir, input order, one call."""
        if not dirs:
            return []
        _check_encodable(*dirs)
        out = self._call("listVisibleFilesMany", fs, _GROUP.join(dirs))
        return [g.split(_FIELD) if g else [] for g in out.split(_GROUP)]

    def promote_stage(self, fs, stage_dir: str, live_dir: str) -> int:
        """Promote one staged partition into live; files promoted."""
        return self._call("promoteStage", fs, stage_dir, live_dir)

    def swap_batch(
        self, fs, root: str, stage_root: str, backup_root: str,
        parts: list[tuple[str, list[str]]],
    ) -> None:
        """Publish swap (park + promote + stage cleanup) for a batch of
        (partition name, superseded rels), one call."""
        if not parts:
            return
        _check_encodable(*(x for n, rels in parts for x in (n, *rels)))
        enc = _GROUP.join(_FIELD.join([n, *rels]) for n, rels in parts)
        self._call("swapBatch", fs, root, stage_root, backup_root, enc)

    def converge_batch(
        self, fs, txn: str, root: str, parts: list[tuple[str, list[str]]]
    ) -> int:
        """Recovery converge for a whole journal, one call; returns the
        rolled-forward partition count."""
        if not parts:
            return 0
        _check_encodable(*(x for n, rels in parts for x in (n, *rels)))
        enc = _GROUP.join(_FIELD.join([n, *rels]) for n, rels in parts)
        return self._call("convergeBatch", fs, txn, root, enc)


def batch_ops(spark) -> BatchOps | None:
    """The process-wide BatchOps for this Spark JVM, or None when no
    Java compiler is available (callers keep their Python loop). Never
    raises: any compile/load failure warns ONCE and degrades."""
    global _class_dir, _instance
    gateway = spark.sparkContext._gateway
    hit = _instance
    if hit is not None and hit[0] is gateway:
        return hit[1]
    with _lock:
        hit = _instance
        if hit is not None and hit[0] is gateway:
            return hit[1]
        if _class_dir is False:
            _class_dir = _compile_class(spark)
            if _class_dir is None:
                warnings.warn(
                    "no Java compiler available (javax.tools absent and "
                    "javac not on PATH) — publish/recovery file moves "
                    "fall back to the Python pooled loop (~24 ms per "
                    "partition of driver RPC at journal scale)",
                    stacklevel=2,
                )
        ops = None
        if _class_dir is not None:
            try:
                ops = BatchOps(_load_instance(spark, _class_dir))
            except Exception as exc:  # loader failure: degrade, once
                warnings.warn(
                    f"MaintBatchOps load failed ({exc}); publish/recovery "
                    "file moves fall back to the Python pooled loop",
                    stacklevel=2,
                )
                ops = None
        _instance = (gateway, ops)
        return ops
