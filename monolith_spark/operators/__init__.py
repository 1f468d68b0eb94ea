from monolith_spark.operators.timeseries import (
    downsample,
    latest,
    time_trim,
    to_timeseries,
    valid_points,
)

__all__ = ["downsample", "latest", "time_trim", "to_timeseries", "valid_points"]
