"""Timestamp-encoding robustness (the round-3 lesson, pinned).

The fixture generator has already shipped events.ts as parquet
TIMESTAMP(NANOS) (read as bigint under nanosAsLong) and as
timestamp[us] with isAdjustedToUTC=false (read as TIMESTAMP_NTZ); a
future regeneration could plausibly ship the UTC-adjusted micro form.
load_table/normalize_ts must produce identical TIMESTAMP values for
all three — these tests build each encoding with pyarrow directly and
assert the normalized values agree, so the next encoding flip breaks a
unit test instead of the bench harness."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from labs_stream_processing_examples_scala_spark.sources.batch import load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 3, 5, 13, 45, 6, 250000),
    dt.datetime(2025, 12, 31, 23, 59, 59, 999000),
]
IDS = list(range(len(TS)))


def _write(dirpath, arr_type, values):
    table = pa.table({"event_id": pa.array(IDS, pa.int64()), "ts": pa.array(values, arr_type)})
    pq.write_table(table, str(dirpath / "events.parquet"))


@pytest.mark.parametrize(
    "name,arr_type,values",
    [
        ("nanos", pa.timestamp("ns"), TS),
        ("micros_ntz", pa.timestamp("us"), TS),
        ("micros_utc", pa.timestamp("us", tz="UTC"), [t.replace(tzinfo=dt.timezone.utc) for t in TS]),
    ],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, name, arr_type, values):
    d = tmp_path / name
    d.mkdir()
    _write(d, arr_type, values)
    got = load_table(spark, str(d), "events").orderBy("event_id").collect()
    assert [str(r.ts.__class__.__name__) for r in got] == ["datetime"] * len(TS)
    assert dict(got[0].asDict())["ts"] == TS[0]
    assert [r.ts for r in got] == TS, name
    # dtype must be TIMESTAMP (not NTZ): unix_micros consumers reject NTZ
    dtypes = dict(load_table(spark, str(d), "events").dtypes)
    assert dtypes["ts"] == "timestamp", dtypes
