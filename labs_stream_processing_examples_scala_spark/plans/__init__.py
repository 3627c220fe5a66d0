from labs_stream_processing_examples_scala_spark.plans.enrichment import (
    enrichment_output,
    enrichment_pipeline,
    enrichment_with_errors,
    gather_groupby_form,
)

__all__ = [
    "enrichment_output",
    "enrichment_pipeline",
    "enrichment_with_errors",
    "gather_groupby_form",
]
