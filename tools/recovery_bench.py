"""Kill-and-restart recovery benchmark (VERDICT r2 #8).

Measures what the reference's "auto recovery + never lose a message"
contract (README.md:11-20) costs under Structured Streaming: a
multi-batch run over the enrichment pipeline is killed mid-stream
(query stopped after the first batch commits, with most input files
still unprocessed), then restarted from the same checkpoint. Reported:
time-to-drain after restart, rows replayed, and the exactly-the-right-
rows check — zero lost, zero duplicated — against the batch oracle.

Mechanics under test:
- offsets commit AFTER foreachBatch completes → the in-flight batch at
  kill time is replayed on restart (at-least-once);
- the sink writes per-batchId directories → the replay overwrites the
  same directory instead of appending duplicates (idempotence);
- unprocessed source files are picked up by the restarted query.

Usage: python tools/recovery_bench.py [sf_dir] [n_files]
Prints ONE JSON line {"metric": "recovery_drain_sec", ...}.
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
from labs_stream_processing_examples_scala_spark.plans.enrichment import enrichment_with_errors
from labs_stream_processing_examples_scala_spark.sources.batch import load_table
from labs_stream_processing_examples_scala_spark.streaming.pipeline import StreamingEnrichmentPipeline
from labs_stream_processing_examples_scala_spark.streaming.sources import synth_payload


def message_view(df):
    return df.select(
        F.col("event_id").alias("id"), synth_payload("event_id").alias("value")
    )


def run(spark, sf_dir: str, n_files: int, work: str, batches_before_kill: int = 1) -> dict:
    # source: events split into n_files so the stream sees many batches
    src = f"{work}/src"
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    ev.repartition(n_files).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def stream_msgs():
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max(n_files // 8, 1))
            .parquet(src)
        )
        return message_view(raw)

    pipe = StreamingEnrichmentPipeline(
        output_path=f"{work}/out",
        dlq_path=f"{work}/dlq",
        checkpoint_path=f"{work}/ckpt",
        chaos=True,
    )

    # phase 1: run until `batches_before_kill` batches committed, then
    # kill mid-stream (files remain unprocessed)
    q = pipe.start(stream_msgs())
    deadline = time.perf_counter() + 300
    while time.perf_counter() < deadline:
        committed = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        if committed >= batches_before_kill:
            break
        time.sleep(0.2)
    q.stop()  # hard stop: no drain, offsets of in-flight batch uncommitted
    q.awaitTermination(60)
    rows_before = pipe.output(spark).count() + pipe.dlq(spark).count()

    # phase 2: restart from the same checkpoint, drain everything
    t0 = time.perf_counter()
    pipe.run_bounded(stream_msgs(), timeout=600.0)
    drain = time.perf_counter() - t0

    # validation vs the batch oracle: zero lost, zero duplicated
    want = enrichment_with_errors(message_view(ev), chaos=True)
    want_main = want.filter(F.col("err").isNull()).count()
    want_dlq = want.filter(F.col("err").isNotNull()).count()
    got_main_df = pipe.output(spark)
    got_main = got_main_df.count()
    got_dlq = pipe.dlq(spark).count()
    dup_main = got_main - got_main_df.select("id").distinct().count()
    return {
        "metric": "recovery_drain_sec",
        "value": round(drain, 2),
        "unit": "sec",
        "rows_committed_before_kill": rows_before,
        "rows_replayed_or_new": got_main + got_dlq - rows_before,
        "main_rows": got_main,
        "dlq_rows": got_dlq,
        "expected_main": want_main,
        "expected_dlq": want_dlq,
        "duplicate_main_ids": dup_main,
        "lost_rows": (want_main + want_dlq) - (got_main + got_dlq),
        "sf_dir": sf_dir,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="recovery-bench")
    work = tempfile.mkdtemp(prefix="recovery_bench_")
    try:
        rec = run(spark, sf_dir, n_files, work)
        print(json.dumps(rec))
        if rec["duplicate_main_ids"] or rec["lost_rows"]:
            raise SystemExit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
