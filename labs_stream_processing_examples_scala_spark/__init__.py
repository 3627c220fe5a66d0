"""PySpark-native analytics engine with the capabilities of
blinkboxbooks/labs.stream-processing-examples.scala.

The reference (/root/reference) is a Scala lab comparing RxJava / Akka /
Futures styles for one reliable message-enrichment pipeline. This engine
re-expresses its semantics Spark-first (DataFrame / Catalyst / Structured
Streaming) and extends them with a relational surface and large-scale
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns). See SURVEY.md for the full capability map.
"""

from labs_stream_processing_examples_scala_spark.session import get_spark, release_persisted_rdds

__all__ = ["get_spark", "release_persisted_rdds"]
