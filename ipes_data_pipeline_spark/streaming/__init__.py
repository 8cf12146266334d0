from ipes_data_pipeline_spark.streaming import medallion, windows  # noqa: F401
