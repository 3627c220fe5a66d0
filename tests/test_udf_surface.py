"""P6 extension surface: registry, pandas UDF, UDTF — SURVEY §2.10."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions import udf_surface
from labs_stream_processing_examples_scala_spark.functions.transforms import TRANSFORMS


def test_pandas_udf_transform(spark):
    udf_surface.register_all(spark)
    df = spark.createDataFrame([("Input Data: 7",), (None,)], ["v"])
    rows = df.select(TRANSFORMS["crc32"]("v").alias("c")).collect()
    assert rows[0].c == zlib.crc32(b"Input Data: 7")
    assert rows[1].c is None


def test_udtf_explode_words(spark):
    udf_surface.register_all(spark)
    rows = spark.sql(
        "SELECT * FROM explode_words('key agg row')"
    ).collect()
    assert [(r.pos, r.word) for r in rows] == [(0, "key"), (1, "agg"), (2, "row")]


def test_sql_registered_udf(spark):
    udf_surface.register_all(spark)
    df = spark.createDataFrame([("abc",)], ["v"])
    df.createOrReplaceTempView("udf_smoke")
    got = spark.sql("SELECT crc32_checksum(v) AS c FROM udf_smoke").head().c
    assert got == zlib.crc32(b"abc")


def test_registry_is_extension_point(spark):
    from labs_stream_processing_examples_scala_spark.functions.transforms import register_transform

    register_transform("shout", lambda c: F.concat(F.upper(c), F.lit("!")))
    df = spark.createDataFrame([("hi",)], ["v"])
    assert df.select(TRANSFORMS["shout"](F.col("v")).alias("r")).head().r == "HI!"
