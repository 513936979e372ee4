from khronus_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    measurements_from_events,
    metric_catalog,
)
