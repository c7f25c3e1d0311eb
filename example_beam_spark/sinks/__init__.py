from example_beam_spark.sinks.files import (
    CreateDisposition,
    WriteDisposition,
    write_file_loads,
)
from example_beam_spark.sinks.streaming import foreach_batch_with_retry

__all__ = [
    "CreateDisposition",
    "WriteDisposition",
    "write_file_loads",
    "foreach_batch_with_retry",
]
