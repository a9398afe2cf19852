from .datetime_fns import day_bucket, time_of_day_seconds  # noqa: F401
