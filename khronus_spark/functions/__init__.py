from khronus_spark.functions.summary import (  # noqa: F401
    ALL_COUNTER_FUNCTIONS,
    ALL_HISTOGRAM_FUNCTIONS,
    ALL_PERCENTILES,
    PERCENTILE_FRACTIONS,
)
