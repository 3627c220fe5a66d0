from labs_stream_processing_examples_scala_spark.sources.batch import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
