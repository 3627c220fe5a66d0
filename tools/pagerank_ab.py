"""A/B the PageRank lineage-truncation cadence at a given SF (round-10
verdict task #7): checkpoint every iteration (k=1, the accepted sf0.1
floor) vs every second iteration (k=2, half the materialization jobs,
~2x logical-plan growth between checkpoints). Prints one JSON line per
arm; values are asserted identical before timing.

Usage: python tools/pagerank_ab.py [sf_dir] [n_trials]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from labs_stream_processing_examples_scala_spark import get_spark
from labs_stream_processing_examples_scala_spark.operators import graph as GR


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="pagerank-ab")

    # warm the shared pair/banded caches ONCE so both arms ride the
    # same input (exactly how bench.py's ordering amortizes it)
    t0 = time.perf_counter()
    GR._edges(spark, sf_dir).count()
    warm = round(time.perf_counter() - t0, 2)

    # value identity first (cheap at any SF: 6-decimal rounded ranks)
    a = {r.doc_id: (r.rank, r.n_neighbors) for r in GR.pagerank(spark, sf_dir).collect()}
    b = {
        r.doc_id: (r.rank, r.n_neighbors)
        for r in GR.pagerank(spark, sf_dir, checkpoint_every=2).collect()
    }
    assert a == b, "checkpoint cadence changed values — abort"

    results = {}
    for k in (1, 2):
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            GR.pagerank(spark, sf_dir, checkpoint_every=k).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
        results[f"k{k}"] = times
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "edges_warm_s": warm,
                "trials": results,
                "values_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
