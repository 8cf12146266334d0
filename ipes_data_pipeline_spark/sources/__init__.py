from ipes_data_pipeline_spark.sources import (  # noqa: F401
    binary_sink,
    io,
    metrics,
    rest,
)
