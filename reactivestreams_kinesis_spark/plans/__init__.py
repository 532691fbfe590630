"""Physical-plan inspection: the enforcement arm of the scale design."""

from reactivestreams_kinesis_spark.plans.inspect import (
    count_exchanges,
    explain_string,
    has_operator,
    pushed_filters,
)

__all__ = ["explain_string", "pushed_filters", "has_operator", "count_exchanges"]
