from labs_stream_processing_examples_scala_spark.multimodal import codecs
from labs_stream_processing_examples_scala_spark.multimodal.columns import (
    FEATURE_DIM,
    binary_documents,
    extract_features,
    multimodal_meta,
    resize_images,
    sample_frames,
    synthesize_mixed,
)

__all__ = [
    "FEATURE_DIM",
    "binary_documents",
    "codecs",
    "extract_features",
    "multimodal_meta",
    "resize_images",
    "sample_frames",
    "synthesize_mixed",
]
