from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_tools_spark.session import get_session  # noqa: E402
from lakehouse_tools_spark.sources.tables import load_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_session(
        app_name="lakehouse_tools_spark_tests",
        extra_confs={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="lts_warehouse_"),
        },
    )


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)
