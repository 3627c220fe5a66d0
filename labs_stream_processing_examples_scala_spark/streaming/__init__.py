from labs_stream_processing_examples_scala_spark.streaming.retry import RetryExhausted, is_temporary_exception, with_retry
from labs_stream_processing_examples_scala_spark.streaming.sources import file_stream, rate_messages
from labs_stream_processing_examples_scala_spark.streaming.pipeline import StreamingEnrichmentPipeline

__all__ = [
    "RetryExhausted",
    "StreamingEnrichmentPipeline",
    "file_stream",
    "is_temporary_exception",
    "rate_messages",
    "with_retry",
]
