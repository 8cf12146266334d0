from ipes_data_pipeline_spark.streaming import (  # noqa: F401
    medallion,
    scheduler,
    stateful,
    windows,
)
