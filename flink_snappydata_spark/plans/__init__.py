"""Physical-plan introspection: the engine's scale-discipline gauges."""

from flink_snappydata_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    formatted_plan,
    partition_filters,
    pushed_filters,
    read_schema_columns,
)
