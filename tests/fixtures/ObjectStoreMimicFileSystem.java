import java.io.IOException;
import java.net.URI;
import java.util.concurrent.atomic.AtomicInteger;

import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileUtil;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * A Hadoop FileSystem with OBJECT-STORE rename semantics over local disk,
 * for witnessing the publish protocol (sources/publish.py) on the one
 * filesystem class its docstring could previously only reason about in
 * prose: stores where "rename" is COPY-then-DELETE and a crash between
 * the two leaves the same file at both ends (S3 without a committer,
 * GCS connector fallback paths, etc).
 *
 * The real S3AFileSystem cannot run in this sandbox (no hadoop-aws jars,
 * no network to Maven Central - exhausted in rounds 9/10), so this class
 * reproduces exactly the semantic difference that matters to the
 * protocol: rename(src, dst) copies bytes, optionally throws an injected
 * IOException between the copy and the delete (simulating the process
 * dying mid-"rename"), then deletes the source. Everything else is plain
 * local-disk behavior, so Spark's parquet writer runs unmodified against
 * the mock:// scheme.
 *
 * Crash injection: set fs.objstore.fail.rename.substr in the Hadoop conf
 * to a path fragment; the FIRST rename whose destination contains it
 * performs the copy, then throws instead of deleting. One-shot per JVM
 * (the static latch), so the retried operation proceeds - clear the conf
 * and call resetInjection() between scenarios.
 *
 * A second injection point, fs.objstore.fail.rename.midcopy.substr,
 * crashes MID-copy instead (r15, VERDICT r14 "Next round" #4): the
 * first file rename whose destination contains the fragment writes
 * only HALF the source bytes to dst, then throws - leaving a PARTIAL
 * file at dst and the intact source at src, the one object-store
 * crash signature _rename_into's equal-size dedupe cannot converge on
 * its own (sizes differ). Also one-shot, also cleared by
 * resetInjection().
 *
 * A third injection point, fs.objstore.latency.rename.ms (r16, VERDICT
 * r15 "Next round" #1), sleeps that many milliseconds at the START of
 * every rename - the per-object network RPC cost a real store charges
 * for its copy+delete. Not a crash: it exists so bench_recovery can
 * witness that MaintBatchOps' bounded executor overlaps store RPCs
 * near-linearly where the serial walk pays them end-to-end.
 */
public class ObjectStoreMimicFileSystem extends RawLocalFileSystem {

    public static final AtomicInteger RENAMES = new AtomicInteger();
    private static final AtomicInteger FIRED = new AtomicInteger();
    private static final AtomicInteger MID_FIRED = new AtomicInteger();

    public static void resetInjection() {
        FIRED.set(0);
        MID_FIRED.set(0);
        RENAMES.set(0);
    }

    @Override
    public String getScheme() {
        return "mock";
    }

    @Override
    public URI getUri() {
        return URI.create("mock:///");
    }

    /**
     * RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions
     * LAZILY via {@code new java.io.File(path.toUri())}, which rejects any
     * non-"file" scheme. Object stores fake permissions anyway (S3A returns
     * a constant), so statuses are materialized eagerly with defaults -
     * which also makes getPermission() scheme-safe for FileSystem.listFiles.
     */
    private FileStatus materialize(FileStatus s) {
        return new FileStatus(
            s.getLen(), s.isDirectory(), s.getReplication(),
            s.getBlockSize(), s.getModificationTime(), s.getAccessTime(),
            s.isDirectory()
                ? FsPermission.getDirDefault()
                : FsPermission.getFileDefault(),
            "objstore", "objstore", s.getPath());
    }

    @Override
    public FileStatus getFileStatus(Path f) throws IOException {
        return materialize(super.getFileStatus(f));
    }

    @Override
    public FileStatus[] listStatus(Path f) throws IOException {
        FileStatus[] out = super.listStatus(f);
        for (int i = 0; i < out.length; i++) {
            out[i] = materialize(out[i]);
        }
        return out;
    }

    @Override
    public boolean rename(Path src, Path dst) throws IOException {
        if (!exists(src)) {
            return false;
        }
        if (exists(dst)) {
            // object stores have no atomic "fail if exists" rename either;
            // returning false matches S3A's contract for an existing target
            return false;
        }
        RENAMES.incrementAndGet();
        long lat = getConf().getLong("fs.objstore.latency.rename.ms", 0);
        if (lat > 0) {
            try {
                Thread.sleep(lat);
            } catch (InterruptedException e) {
                Thread.currentThread().interrupt();
                throw new IOException("interrupted in injected latency", e);
            }
        }
        // mid-copy crash (file moves only): write HALF the bytes to dst,
        // then die - the partial-dst state a prefix-at-a-time object
        // store leaves when the process is killed inside one object's
        // multipart copy
        String mid = getConf().get(
            "fs.objstore.fail.rename.midcopy.substr", "");
        if (!mid.isEmpty()
                && dst.toString().contains(mid)
                && !getFileStatus(src).isDirectory()
                && MID_FIRED.compareAndSet(0, 1)) {
            long len = getFileStatus(src).getLen();
            byte[] half = new byte[(int) Math.max(0, len / 2)];
            try (org.apache.hadoop.fs.FSDataInputStream in = open(src)) {
                in.readFully(0, half);
            }
            Path parent = dst.getParent();
            if (parent != null) {
                mkdirs(parent);
            }
            try (org.apache.hadoop.fs.FSDataOutputStream out =
                    create(dst, false)) {
                out.write(half);
            }
            throw new IOException(
                "injected object-store crash MID-COPY (partial dst): "
                + src + " -> " + dst);
        }
        // copy phase (recursive for directories - an object store "renames"
        // a prefix one object at a time; a crash strands a partial copy)
        if (!FileUtil.copy(this, src, this, dst, false, getConf())) {
            return false;
        }
        String needle = getConf().get("fs.objstore.fail.rename.substr", "");
        if (!needle.isEmpty()
                && dst.toString().contains(needle)
                && FIRED.compareAndSet(0, 1)) {
            throw new IOException(
                "injected object-store crash between copy and delete: "
                + src + " -> " + dst);
        }
        // delete phase
        return delete(src, true);
    }
}
