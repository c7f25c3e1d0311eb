from example_beam_spark.plans.inspect import (
    explain_formatted,
    has_broadcast_join,
    has_pushed_filter,
    num_exchanges,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_formatted",
    "has_broadcast_join",
    "has_pushed_filter",
    "num_exchanges",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
