"""User extension surface — SURVEY §2.10 (P6).

The reference's extension points are the ``Transformer`` template-method
trait (Services.scala:40-45) and the per-actor ``process`` hook
(AkkaPipelineActors.scala:33). The engine's equivalents, in preference
order:

1. **Column-expression transform** (the default): a Python function
   ``Column -> Column`` built from ``pyspark.sql.functions`` — JVM-side,
   codegen'd, zero serialization. Registered in ``TRANSFORMS``
   (functions/transforms.py).
2. **pandas UDF** (the vectorized slow path): Arrow-batched, for logic
   built-ins can't express (external libs, bespoke byte math).
3. **Python UDTF**: one row in, many rows out, for generator-shaped
   transforms.

Row-at-a-time ``F.udf`` is deliberately NOT offered a helper: at 100 TB
the per-row pickle tax dominates; if you really need it, Spark still has
it, but nothing in this engine uses it.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions.transforms import register_transform


def make_crc32_checksum():
    """Example tier-2 transform: CRC32 of the UTF-8 payload — byte-level
    logic Catalyst has no built-in for, vectorized over Arrow batches.
    (A factory because pandas_udf construction needs a live session.)"""

    @F.pandas_udf("long")
    def crc32_checksum(s: pd.Series) -> pd.Series:
        return s.map(lambda v: zlib.crc32(v.encode("utf-8")) if v is not None else None)

    return crc32_checksum


@F.udtf(returnType="pos int, word string")
class ExplodeWords:
    """Example tier-3 UDTF: one message row → one row per word.
    (The engine's own operators use explode(split()) — built-in and
    faster; this demonstrates the user extension shape.)"""

    def eval(self, value: str):  # noqa: D102
        if value is None:
            return
        for pos, word in enumerate(value.split(" ")):
            if word:
                yield pos, word


def register_all(spark: SparkSession) -> None:
    """Make the extension examples available on both API surfaces:
    the transform registry (DataFrame pipelines) and the SQL catalog."""
    crc32_checksum = make_crc32_checksum()
    register_transform("crc32", lambda c: crc32_checksum(F.col(c) if isinstance(c, str) else c))
    spark.udf.register("crc32_checksum", crc32_checksum)
    spark.udtf.register("explode_words", ExplodeWords)
