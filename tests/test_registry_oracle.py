"""One parametrized test per registered query: Spark result must match the
DuckDB oracle at sf0.001 (the driver repeats this at sf0.01). Queries
without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from example_beam_spark.registry import drain_cleanups, load_registry
from tests.oracle import assert_matches_oracle

REG = load_registry()


@pytest.mark.parametrize("name", sorted(REG))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REG[name]
    try:
        df = q.fn(spark, sf_dir)
        if q.oracle is None:
            assert df.count() >= 0  # rows-only smoke (non-SQL-expressible op)
        else:
            assert_matches_oracle(df, q.oracle, sf_dir, name=name)
    finally:
        drain_cleanups()  # release per-query persisted intermediates
