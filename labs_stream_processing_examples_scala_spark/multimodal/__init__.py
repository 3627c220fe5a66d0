from labs_stream_processing_examples_scala_spark.multimodal.columns import (
    FEATURE_DIM,
    binary_documents,
    extract_features,
    multimodal_meta,
    resize_images,
    sample_frames,
)

__all__ = [
    "FEATURE_DIM",
    "binary_documents",
    "extract_features",
    "multimodal_meta",
    "resize_images",
    "sample_frames",
]
