"""Regression guard for the round-1 gating bug: every events-backed
query must work on a PLAIN SparkSession (no engine confs) — the exact
environment of an external correctness harness. events.parquet is
TIMESTAMP(NANOS); the loader must self-arm the legacy conf at read time
(sources/batch.py ensure_nanos_readable), not inherit it from
session.py's builder.

Runs in a subprocess because the in-process test session already
carries the engine confs — a plain session can't be created next to it.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("plain-session-guard")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
assert spark.conf.get("spark.sql.session.timeZone") != "UTC" or True  # plain: no engine confs asserted

import __spark_entry__ as E
qs = E.queries()
# one query per events-consuming family: loader, flagship pipeline,
# streaming-equivalent batch window, as-of join
for name in ("q3_scalar_json", "p3_enrich_full", "q17_hourly", "q18_asof_join"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, (name, n)
    print("ok", name, n)
spark.stop()
"""


def test_events_queries_on_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    for name in ("q3_scalar_json", "p3_enrich_full", "q17_hourly", "q18_asof_join"):
        assert f"ok {name}" in proc.stdout
