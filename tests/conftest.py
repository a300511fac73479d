import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mortar_parquet_support_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("mortar-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def make_stream_csv(dirpath, uuid, label, rows):
    """FIXTURES.md F1: single-stream CSV whose filename is the uuid."""
    path = os.path.join(dirpath, f"{uuid}.csv")
    with open(path, "w") as fh:
        fh.write(f"datetime,{label}\n")
        for ts, value in rows:
            fh.write(f"{ts},{value}\n")
    return path
