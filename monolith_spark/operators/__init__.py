from monolith_spark.operators.timeseries import (
    asof_join,
    downsample,
    latest,
    moving_avg,
    range_join,
    resample_ffill,
    series_quantiles,
    sessionize,
    time_trim,
    to_timeseries,
    valid_points,
)

__all__ = [
    "asof_join",
    "downsample",
    "latest",
    "moving_avg",
    "range_join",
    "resample_ffill",
    "series_quantiles",
    "sessionize",
    "time_trim",
    "to_timeseries",
    "valid_points",
]
