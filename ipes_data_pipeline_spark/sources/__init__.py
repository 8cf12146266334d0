from ipes_data_pipeline_spark.sources import binary_sink, metrics, rest  # noqa: F401
