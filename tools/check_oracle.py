"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet (default sf0.01), then
compares row count, column names, and an order-insensitive canonical
value representation (floats rounded to 6 decimals, FIXTURES.md §5).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonical(df: pd.DataFrame) -> tuple[int, list[str], list[tuple]]:
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
                out.append(f"{round(v, 6):.6f}")
            elif hasattr(v, "item"):  # numpy scalar
                iv = v.item()
                if isinstance(iv, float):
                    out.append(f"{round(iv, 6):.6f}")
                elif isinstance(iv, bool):
                    out.append(str(bool(iv)))
                else:
                    out.append(str(iv))
            else:
                out.append(str(v))
        rows.append(tuple(out))
    rows.sort()
    return len(rows), sorted(df.columns), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from labs_stream_processing_examples_scala_spark import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if sql is None:
            print(f"rows-only  {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        sn, scols, srows = canonical(sdf)
        dn, dcols, drows = canonical(ddf)
        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duckdb={dcols}")
        elif sn != dn:
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={sn} duckdb={dn}")
        elif srows != drows:
            failures.append(name)
            diff = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL  {name}: values differ, first at sorted-row {diff}:")
            print(f"      spark : {srows[diff]}")
            print(f"      duckdb: {drows[diff]}")
        else:
            print(f"OK    {name}: {sn} rows")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
