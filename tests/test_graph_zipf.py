"""Graph entries on a Heaps-law zipfian corpus — CI pin of the lane.

The fixture's 31-term vocabulary makes the term co-occurrence graph a
near-clique; tools/graph_lane.py measured the graph entries at 6.8k
and 31k nodes and value-checked them at the 5k-doc size. This suite
pins a fast version of that check in CI: a 1,000-doc zipfian corpus
(~2.8k-term Heaps vocabulary) where degrees, triangles, communities,
and cosine neighborhoods are all non-degenerate, each entry verified
against its registered DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.graph_lane import lane_dir


# Slow lane (zipf-corpus graph oracles: ~10-45 s each) —
# skipped unless EBS_RUN_SLOW=1 so the external verify pytest run
# completes; see pytest.ini / conftest.py.
pytestmark = pytest.mark.slow

ENTRIES = [
    "pagerank_term_graph",
    "label_propagation_terms",
    "triangle_count_terms",
    "tf_cosine_topk",
    "link_prediction_jaccard",
    "bigram_collocations_pmi",
]


@pytest.fixture(scope="module")
def zipf_dir():
    return lane_dir(tempfile.mkdtemp(prefix="graph_zipf_"), 1000)


@pytest.mark.parametrize("name", ENTRIES)
def test_graph_entry_oracle_on_zipf_corpus(spark, zipf_dir, name):
    from example_beam_spark.registry import drain_cleanups, load_registry
    from tests.oracle import assert_matches_oracle

    reg = load_registry()
    try:
        assert_matches_oracle(
            reg[name].fn(spark, zipf_dir), reg[name].oracle, zipf_dir, name
        )
    finally:
        drain_cleanups()


def test_zipf_graph_is_nondegenerate(spark, zipf_dir):
    """The pin is only meaningful if the graph is not a clique: degrees
    must vary and the clustering coefficients must not all be 1."""
    from example_beam_spark.registry import drain_cleanups, load_registry

    reg = load_registry()
    rows = reg["triangle_count_terms"].fn(spark, zipf_dir).collect()
    drain_cleanups()
    degs = {r["deg"] for r in rows}
    assert len(rows) > 100, len(rows)
    assert len(degs) > 10, "degree distribution is degenerate"
    assert any(r["clustering"] is not None and r["clustering"] < 0.999 for r in rows)
