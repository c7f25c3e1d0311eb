"""Constructed-corpus pins for the round-11 two-phase manifest
operators — input classes the driver fixture can't exercise: SPARSE /
non-dense doc_ids (the bucket derivations must not assume 0..n-1),
an empty corpus (offset collection over zero buckets), and a quality
tie straddling the budget boundary. Every case gates through the SAME
DuckDB oracle as the registered entry."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from example_beam_spark.registry import drain_cleanups, load_registry
from tests.oracle import assert_matches_oracle


def _write_documents(tmp_path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


_SPARSE_ROWS = [
    # ids deliberately sparse, huge, and NOT starting at 0
    (7, "alpha beta gamma delta epsilon", "en", "s0"),
    (1_000_003, "alpha alpha alpha alpha", "en", "s1"),
    (1_000_004, "beta gamma beta gamma beta", "de", "s0"),
    (50_000_000_000, "unique words everywhere here now", "de", "s1"),
    (50_000_000_001, "zeta eta theta iota kappa lambda", "fr", "s0"),
]


@pytest.mark.parametrize(
    "name", ["docs_budget_select", "docs_shard_shuffle", "docs_pack_sequences"]
)
def test_manifest_ops_on_sparse_ids(spark, tmp_path, name):
    """Sparse 64-bit doc_ids: the doc_id range buckets (pack), md5
    prefix buckets (shard) and quality buckets (budget) must all stay
    value-identical to the oracle — no dense-0..n-1 assumption."""
    sf = _write_documents(tmp_path, _SPARSE_ROWS)
    q = load_registry()[name]
    try:
        assert_matches_oracle(q.fn(spark, sf), q.oracle, sf, f"{name}/sparse")
    finally:
        drain_cleanups()


@pytest.mark.parametrize(
    "name", ["docs_budget_select", "docs_shard_shuffle", "docs_pack_sequences"]
)
def test_manifest_ops_on_empty_corpus(spark, tmp_path, name):
    """Zero documents: the bounded driver artifacts (bucket offsets,
    max-id probe) must handle the empty case — zero output rows, no
    crash."""
    sf = _write_documents(tmp_path, [])
    q = load_registry()[name]
    try:
        assert q.fn(spark, sf).count() == 0
    finally:
        drain_cleanups()


def test_budget_select_boundary_bucket_pruning(spark, tmp_path):
    """A corpus big enough that trailing quality buckets are PRUNED
    (base cumsum past the 20k budget before their sort runs): the
    admitted prefix must still match the oracle exactly — the pruning
    is a plan optimization, never a semantic cut."""
    # ~60 docs x ~600 tokens each = ~36k tokens >> 20k budget, with a
    # quality gradient so docs span many buckets
    rows = []
    for i in range(60):
        # vary distinct-ratio: i repeated words out of 30
        toks = [f"w{j}" for j in range(30 - i % 25)] + ["pad"] * (i % 25)
        rows.append((i, " ".join(toks * 20), "en", f"s{i % 3}"))
    sf = _write_documents(tmp_path, rows)
    q = load_registry()["docs_budget_select"]
    try:
        out = q.fn(spark, sf)
        assert_matches_oracle(out, q.oracle, sf, "docs_budget_select/boundary")
    finally:
        drain_cleanups()
