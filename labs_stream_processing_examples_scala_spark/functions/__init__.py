from labs_stream_processing_examples_scala_spark.functions.transforms import (
    TRANSFORMS,
    char_sort,
    enrich,
    register_transform,
    reverse_value,
    synth_payload,
    transform_additional,
    upper_value,
)

__all__ = [
    "TRANSFORMS",
    "char_sort",
    "enrich",
    "register_transform",
    "reverse_value",
    "synth_payload",
    "transform_additional",
    "upper_value",
]
