from hermod_spark.plans.schema import (  # noqa: F401
    Schema,
    TableSchema,
    merge,
    validate_identifier,
    validate_record,
)
from hermod_spark.plans.routes import Route, RoutePlanner, passthrough_record  # noqa: F401
