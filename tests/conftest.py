from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from labs_stream_processing_examples_scala_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield s
    # teardown hygiene: drop the managed operator caches, then sweep
    # localCheckpoint leftovers, and fail loudly if storage remains
    from labs_stream_processing_examples_scala_spark import release_persisted_rdds
    from labs_stream_processing_examples_scala_spark.operators import dedup

    dedup.invalidate_cache()
    release_persisted_rdds(s)
    leaked = [
        (i.id(), i.name())
        for i in s.sparkContext._jsc.sc().getRDDStorageInfo()
        if i.isCached()
    ]
    s.stop()
    assert not leaked, f"persisted RDDs leaked past teardown: {leaked}"


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def assert_df_equals_oracle(sdf, con, sql):
    """Order-insensitive compare of a Spark DataFrame vs a DuckDB query
    (the driver's hash-compare, materialized)."""
    import math

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        rows = []
        for row in df.itertuples(index=False):
            out = []
            for v in row:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    out.append("∅")
                elif isinstance(v, bool):
                    out.append(str(bool(v)))
                elif isinstance(v, float):
                    # + 0.0 folds -0.0 into +0.0 (round-13 fuzz: Spark
                    # normalizes the distinct representative, DuckDB
                    # keeps -0.0 — numerically equal, must compare equal)
                    out.append(f"{round(v, 6) + 0.0:.6f}")
                elif hasattr(v, "item"):
                    iv = v.item()
                    out.append(f"{round(iv, 6) + 0.0:.6f}" if isinstance(iv, float) else str(iv))
                else:
                    out.append(str(v))
            rows.append(tuple(out))
        return sorted(df.columns), sorted(rows)

    scols, srows = canon(sdf.toPandas())
    dcols, drows = canon(con.execute(sql).fetchdf())
    assert scols == dcols, f"columns {scols} != {dcols}"
    assert srows == drows
