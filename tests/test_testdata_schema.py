"""Schema-drift guard for driver-generated testdata.

Round 2's only regression was the events loader assuming ``events.ts`` was
parquet TIMESTAMP(NANOS) after the driver regenerated it as TIMESTAMP(MICROS)
-- every events consumer then failed at analysis time.  These tests read the
REAL testdata parquet (footer only, no Spark job) so any future drift in the
tables' physical types fails loudly here instead of at driver time, and they
assert the ``T()`` loader normalizes ``ts`` for whatever it finds.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from flatterer_spark.queries import T

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.isdir(d)]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_events_ts_physical_type_is_known(sf):
    t = pq.read_schema(f"{sf}/events.parquet").field("ts").type
    # The loader handles exactly these two shapes; anything else is drift.
    # A raw int64 would be ambiguous (T() would assume nanos and silently
    # shift every timestamp), so it must FAIL here, not pass.
    assert str(t) in ("timestamp[us]", "timestamp[ns]"), (
        f"events.ts drifted to {t}; update flatterer_spark.queries.T()"
    )


@pytest.mark.parametrize("sf", SF_DIRS)
def test_T_normalizes_events_ts(spark, sf):
    df = T(spark, sf, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    # Analysis + one row materialize: the loader must survive the real file.
    row = df.select("ts").limit(1).collect()
    assert len(row) == 1 and row[0][0] is not None


def test_all_tables_readable(spark):
    sf = "/root/testdata/sf0.001"
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        assert T(spark, sf, name).limit(1).count() >= 0
