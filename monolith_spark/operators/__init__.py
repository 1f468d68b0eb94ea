from monolith_spark.operators.timeseries import (
    asof_join,
    downsample,
    latest,
    range_join,
    sessionize,
    time_trim,
    to_timeseries,
    valid_points,
)

__all__ = [
    "asof_join",
    "downsample",
    "latest",
    "range_join",
    "sessionize",
    "time_trim",
    "to_timeseries",
    "valid_points",
]
