"""fqueue broker-tier throughput anchor (round 11) — measures the
full broker hop the way BASELINE.md anchors every other tier: one
publish (executor-side mapInArrow segments) and both CONSUME legs
over the same queue:

- batch consume: ``spark.read.format("fqueue")`` — one scan partition
  per segment, executed on executors;
- streaming consume: the round-11 partition-planning
  ``DataSourceStreamReader`` (driver plans (segment, row-span)
  partitions from row-count sidecars; EXECUTOR tasks read them),
  drained through the noop sink with ``processAllAvailable``.

The round-10 verdict graded the consumer leg as the last single-
process cap on the broker tier; round 11 moved it onto the executors
— this tool records what that leg actually sustains, so the claim is
a measured number, not a design note.

Usage: python tools/queue_bench.py [n_rows] [n_partitions]
Prints one JSON line. Run in a quiet window; calibration (including
the all-cores ``mt`` probe) is embedded like every bench artifact.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark import get_spark
from labs_stream_processing_examples_scala_spark.sources import queue_source as QS


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="queue-bench")
    QS.register(spark)
    import bench as benchmod

    calib_start = benchmod._calibrate()
    work = tempfile.mkdtemp(prefix="queue_bench_")
    qdir = f"{work}/q"
    Path(qdir).mkdir(parents=True)
    record: dict = {}
    try:
        df = (
            spark.range(n_rows)
            .repartition(n_parts)
            .select(
                F.col("id").cast("string").alias("key"),
                F.concat(F.lit("payload-"), F.col("id")).alias("value"),
            )
        )
        sink = QS.queue_sink(qdir)
        sink(df, 0)  # warm lap: JVM + codegen + python workers
        shutil.rmtree(qdir)
        Path(qdir).mkdir()
        t0 = time.perf_counter()
        sink(df, 1)
        publish_s = time.perf_counter() - t0

        # batch consume (one scan partition per segment, on executors).
        # Warm lap first, symmetric with the publish leg above: the
        # first DSv2 read cold-starts every Python reader worker
        # simultaneously (~1 s of imports each), which is a per-session
        # cost, not the steady throughput this anchor defends.
        spark.read.format("fqueue").option("path", qdir).load().count()
        t0 = time.perf_counter()
        n_batch = spark.read.format("fqueue").option("path", qdir).load().count()
        batch_s = time.perf_counter() - t0
        assert n_batch == n_rows, (n_batch, n_rows)

        # streaming consume: partition-planning reader -> noop sink.
        # rows_per_batch admits the whole queue in a few micro-batches;
        # rows_per_partition fans each batch across executor tasks.
        # Row accounting via a listener, NOT recentProgress: the
        # progress ring buffer keeps only the last ~100 entries, so a
        # many-micro-batch run would silently undercount and make the
        # anchor look like the stream lost rows (self-review finding,
        # round 11).
        from pyspark.sql.streaming import StreamingQueryListener

        class _RowCount(StreamingQueryListener):
            def __init__(self):
                self.rows = 0

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                self.rows += int(event.progress.numInputRows)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        def _stream_once(ckpt: str, rows_per_batch: int = 500_000):
            # span fixed at 65536 across the sweep: an r13 A/B showed
            # narrower spans LOSE (2.0-2.5 s at 65k vs 3.1 s at 32k/16k
            # for the same 1M-rpb consume) — each DSv2 Python read task
            # carries a fixed cost that a ~2 MB span amortizes and a
            # halved span does not, so the sweep measures the batch-
            # budget effect at the task size the pipeline actually uses
            q = (
                spark.readStream.format("fqueue")
                .option("path", qdir)
                .option("rows_per_batch", rows_per_batch)
                .option("rows_per_partition", 65_536)
                .load()
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            q.stop()

        # warm lap (throwaway checkpoint), symmetric with the other two
        # legs: the first streaming query pays whole-stage codegen for
        # the stream plan and stream-engine start — per-query costs, not
        # the steady consume throughput the anchor defends
        _stream_once(f"{work}/ckpt_warm")
        counter = _RowCount()
        spark.streams.addListener(counter)
        t0 = time.perf_counter()
        _stream_once(f"{work}/ckpt")
        stream_s = time.perf_counter() - t0
        # the listener bus is async: progress events for the final
        # micro-batches can land after processAllAvailable returns
        deadline = time.time() + 30
        while counter.rows < n_rows and time.time() < deadline:
            time.sleep(0.2)
        rows_seen = counter.rows
        spark.streams.removeListener(counter)

        # rows_per_batch sweep (round-12 verdict task #3): each
        # micro-batch pays a fixed DSv2 planning cost (latestOffset /
        # partitions / commit Python hops), so throughput scales with
        # batch size until the batch covers the backlog. Recording the
        # curve justifies the default the pipeline bench uses instead
        # of hand-waving it.
        sweep = {}
        for rpb in (250_000, 500_000, 1_000_000, 2_000_000):
            t0 = time.perf_counter()
            _stream_once(f"{work}/ckpt_rpb_{rpb}", rows_per_batch=rpb)
            sweep[str(rpb)] = round(n_rows / (time.perf_counter() - t0))

        record = {
            "metric": "fqueue_roundtrip_throughput",
            "unit": "rows_per_sec",
            # r12 added untimed warm laps before every timed leg, so
            # numbers from r12 onward are steady-state, not
            # cold-start-inclusive; the flag keeps cross-round
            # comparisons honest (r12 ADVICE)
            "methodology": "warm-lap-r12",
            "n_rows": n_rows,
            "n_partitions": n_parts,
            "publish_s": round(publish_s, 2),
            "publish_rows_per_sec": round(n_rows / publish_s),
            "batch_consume_s": round(batch_s, 2),
            "batch_consume_rows_per_sec": round(n_rows / batch_s),
            "stream_consume_s": round(stream_s, 2),
            "stream_consume_rows_per_sec": round(n_rows / stream_s),
            "stream_rows_observed": rows_seen,
            "stream_rpb_sweep_rows_per_sec": sweep,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    calib_end = benchmod._calibrate()
    record["calibration"] = {
        "start_py_ms": calib_start["calib_py_ms"],
        "start_np_ms": calib_start["calib_np_ms"],
        "start_mt_ms": calib_start["calib_mt_ms"],
        "end_py_ms": calib_end["calib_py_ms"],
        "end_np_ms": calib_end["calib_np_ms"],
        "end_mt_ms": calib_end["calib_mt_ms"],
    }
    try:
        spark.stop()
    except Exception as e:  # noqa: BLE001 — cleanup must not eat the record
        print(f"bench cleanup failed (record intact): {e}", file=sys.stderr)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
