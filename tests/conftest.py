from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


def plan_of(df) -> str:
    """Formatted physical plan as a string (shared by plan-contract tests)."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="session")
def spark():
    from flatterer_spark.session import get_spark

    s = get_spark("flatterer-spark-tests", cpus=os.environ["SPARK_GRAFT_CPUS"])
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
