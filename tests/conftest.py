from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocoindex_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cocoindex-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_state():
    d = tempfile.mkdtemp(prefix="coco_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_SMOKE = "/root/testdata/sf0.001"
