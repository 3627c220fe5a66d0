"""Streaming throughput measurement — the reliable enrichment pipeline
end-to-end (file-fed source → 3 enrichments + errors-as-data → main/DLQ
parquet sinks with checkpointing), reported as rows/sec.

The reference's own source rates are demo pacing (1 msg/s Rx, 0.5 msg/s
Akka — BASELINE.md); this measures what the same semantic pipeline
sustains under Structured Streaming when fed as fast as storage allows.

Usage: python tools/stream_bench.py [sf_dir]   (default sf0.1)
Prints one JSON line {"metric": "stream_pipeline_rows_per_sec", ...}.
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
from labs_stream_processing_examples_scala_spark.streaming.pipeline import StreamingEnrichmentPipeline
from labs_stream_processing_examples_scala_spark.streaming.sources import events_message_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stream-bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        msgs = events_message_stream(spark, sf_dir)
        pipe = StreamingEnrichmentPipeline(
            output_path=f"{work}/out",
            dlq_path=f"{work}/dlq",
            checkpoint_path=f"{work}/ckpt",
            chaos=True,  # the honest pipeline: error split + DLQ live
        )
        t0 = time.perf_counter()
        pipe.run_bounded(msgs, timeout=600.0)
        wall = time.perf_counter() - t0
        n_main = pipe.output(spark).count()
        n_dlq = pipe.dlq(spark).count()
        total = n_main + n_dlq
        print(
            json.dumps(
                {
                    "metric": "stream_pipeline_rows_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "rows/sec",
                    "rows_main": n_main,
                    "rows_dlq": n_dlq,
                    "wall_sec": round(wall, 2),
                    "sf_dir": sf_dir,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
