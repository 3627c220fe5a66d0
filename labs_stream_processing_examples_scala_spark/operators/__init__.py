from labs_stream_processing_examples_scala_spark.operators import relational

__all__ = ["relational"]
