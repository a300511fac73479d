"""ONE recipe for compiling ObjectStoreMimicFileSystem and launching a
Spark session with it on the driver classpath — shared by
tests/objstore_publish_drive.py and tools/recovery_latency_drive.py
(review r16: the ~20-line compile+launch block had been duplicated
verbatim, the same silent-divergence risk the r15 note on the shared
_cpu_jiffies parser closed for the steal gates).

The mimic class must be on the classpath AT JVM LAUNCH (Hadoop's conf
instantiates FileSystem impls by name), which is why callers run in a
subprocess rather than the shared test session.
"""

from __future__ import annotations

import glob
import os
import subprocess
import tempfile

_FIXTURES = os.path.dirname(os.path.abspath(__file__))


def compile_mimic() -> str:
    """javac the mimic against pyspark's bundled hadoop-client-api jar;
    returns the classes dir."""
    import pyspark

    java_src = os.path.join(_FIXTURES, "ObjectStoreMimicFileSystem.java")
    classes = tempfile.mkdtemp(prefix="objstore-classes-")
    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hadoop_api = glob.glob(os.path.join(jars, "hadoop-client-api-*.jar"))[0]
    subprocess.run(
        ["javac", "-cp", hadoop_api, "-d", classes, java_src], check=True
    )
    return classes


def launch_mimic_session(app_name: str, *, cores: int = 4,
                         shuffle_partitions: int | None = None):
    """Compile the mimic and start a local session with mock:// wired to
    it. ``shuffle_partitions`` defaults to ``cores``."""
    classes = compile_mimic()
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.driver.extraClassPath", classes)
        .config("spark.executor.extraClassPath", classes)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None
                else cores),
        )
        .config("spark.hadoop.fs.mock.impl", "ObjectStoreMimicFileSystem")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
