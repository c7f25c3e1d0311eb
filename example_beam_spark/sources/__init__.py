from example_beam_spark.sources.parquet import (
    load_table,
    load_all,
    register_views,
    spread_small_input,
)
from example_beam_spark.sources.memory import range_records

__all__ = [
    "load_table",
    "load_all",
    "register_views",
    "range_records",
    "spread_small_input",
]
