from khronus_spark.plans.criteria import QueryValidationError, build_criteria  # noqa: F401
from khronus_spark.plans.executor import InfluxSeriesResult, QueryExecutor  # noqa: F401
