from khronus_spark.parser.ast import (  # noqa: F401
    AllField,
    Field,
    GroupBy,
    InfluxCriteria,
    Number,
    Operation,
    ParsedQuery,
    Source,
    StringFilter,
    Table,
    TimeFilter,
)
from khronus_spark.parser.parser import InfluxQueryParser, QueryParseError  # noqa: F401
