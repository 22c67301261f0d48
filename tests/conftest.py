import os
import shutil
import tempfile

import pytest

from polardbx_tools_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="polardbx-tools-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh-")},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_path(tmp_path):
    p = str(tmp_path / "transcripts")
    yield p
    shutil.rmtree(p, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
