"""Round-12 ADVICE regressions: restore-footprint dir spelling for
partition values Spark leaves literal (space, '+', parens), and the
asof_join reserved-name guard covering _asof_row."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

import labs_stream_processing_examples_scala_spark.operators.cow_table as CT
import labs_stream_processing_examples_scala_spark.operators.merge as MG
import labs_stream_processing_examples_scala_spark.operators.mor_table as MT
from labs_stream_processing_examples_scala_spark.operators import temporal as T


def test_restore_footprint_matches_spark_dir_spelling(spark, tmp_path):
    """quote(safe='') escapes chars Spark's escapePathName leaves
    literal (space, '+', parens), so the vector-only restore footprint
    named a nonexistent dir for such partition values and the OCC
    conflict check went blind — the exact hole _delta_changed_partitions
    exists to close (round-11 ADVICE, medium). The footprint must use
    the on-disk dir spelling."""
    path = str(tmp_path / "t")
    parts = ("plain", "has space", "a+b (x)")
    rows = [(k, parts[k % len(parts)], float(k)) for k in range(24)]
    df = spark.createDataFrame(rows, "k long, p string, val double")
    CT.cow_init(MG.scd2_init(df), path, "p")
    s = MT.mor_delete(spark, path, F.col("p") == "has space", "p")
    v_del = s["version"]
    r = CT.restore_cow(path, v_del - 1)
    log = CT._read_root_log(path, r["version"])
    # the real dir name for the value, straight from the listing
    gen = CT._gen_dir(path, r["version"])
    from urllib.parse import unquote

    real = [
        e
        for e in os.listdir(gen)
        if "=" in e and unquote(e.split("=", 1)[1]) == "has space"
    ]
    assert real, sorted(os.listdir(gen))
    assert real[0] in log["written"], (real, log["written"])
    # no synthesized spelling that matches nothing on disk
    on_disk = set(os.listdir(gen))
    assert all(w in on_disk for w in log["written"]), (
        log["written"],
        sorted(on_disk),
    )


def test_delta_changed_partitions_direct_spelling(spark, tmp_path):
    """_delta_changed_partitions itself returns on-disk names for a
    vector diff over a value quote() would mangle."""
    path = str(tmp_path / "t")
    rows = [(k, "v (1)+x" if k % 2 else "plain", float(k)) for k in range(12)]
    df = spark.createDataFrame(rows, "k long, p string, val double")
    CT.cow_init(MG.scd2_init(df), path, "p")
    s = MT.mor_delete(spark, path, F.col("p") == "v (1)+x", "p")
    got = CT._delta_changed_partitions(path, s["version"] - 1, s["version"])
    gen = CT._gen_dir(path, s["version"])
    on_disk = set(os.listdir(gen))
    assert got and all(g in on_disk for g in got), (got, sorted(on_disk))


def test_asof_join_rejects_asof_row_reserved_name(spark):
    """The guard checked _side/_rrow but not _asof_row, so a left frame
    already carrying _asof_row died later with an ambiguous-reference
    AnalysisException instead of the intended ValueError (round-11
    ADVICE, low)."""
    ts = datetime.datetime
    left = spark.createDataFrame(
        [(1, ts(2020, 1, 1), 0)], "k long, ts timestamp, _asof_row long"
    )
    right = spark.createDataFrame(
        [(1, ts(2020, 1, 1), 1)], "k long, rts timestamp, v long"
    )
    with pytest.raises(ValueError, match="_asof_row"):
        T.asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["v"]
        )
