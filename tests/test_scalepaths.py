"""Gates for the round-13 scale-path entries (operators/scalepaths.py):
the IVF,PQ+SQ8 composition's recall + compressed-rerank byte claim, and
the fixture-shape contract of the rows-only entry."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from example_beam_spark.registry import drain_cleanups, load_registry
from tests.conftest import SF_DIR as SF
from tools.planted import planted_corpus


def _du(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def test_ivfpq_sq8_recall_and_compressed_rerank_bytes(spark, tmp_path):
    """On the planted corpus: recall@10 >= 0.9 vs the exact twin (same
    floor as the float-rerank cellpart sibling), and the rerank-side
    codes table is materially smaller than the float corpus — the
    bytes the shortlist fetch scans instead of embeddings.parquet."""
    from example_beam_spark.operators.scalepaths import sq8_codes_table

    d = planted_corpus(str(tmp_path / "sq8_planted"), n=20000)
    reg = load_registry()
    exact: dict[int, set[int]] = {}
    for r in reg["ann_topk_bruteforce"].fn(spark, d).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    drain_cleanups()
    got: dict[int, set[int]] = {}
    for r in reg["ann_topk_ivfpq_sq8"].fn(spark, d).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    drain_cleanups()
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    recall = sum(recalls) / len(recalls)

    codes_dir, _, _ = sq8_codes_table(spark, d)
    sq8_bytes = _du(codes_dir)
    float_bytes = os.path.getsize(os.path.join(d, "embeddings.parquet"))
    print(
        f"ivfpq+sq8 planted: recall@10={recall:.3f} "
        f"rerank bytes {sq8_bytes} vs float {float_bytes} "
        f"({sq8_bytes / float_bytes:.2f}x)"
    )
    assert recall >= 0.9, (recall, recalls)
    # float32 gaussians are incompressible (~4 bytes/dim); uint8 codes
    # are ~1 byte/dim — demand at least a 2x on-disk win (parquet
    # framing overhead absorbed)
    assert sq8_bytes * 2 < float_bytes, (sq8_bytes, float_bytes)


def test_ivfpq_sq8_runs_on_driver_fixture(spark):
    """Rows-only contract on the real fixture: one block of <= TOP_K
    rows per query, ranks contiguous from 1, cosines sane."""
    from example_beam_spark.operators.similarity import N_QUERIES, TOP_K

    reg = load_registry()
    rows = reg["ann_topk_ivfpq_sq8"].fn(spark, SF).collect()
    drain_cleanups()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rk)
        assert -1.001 <= r.cosine <= 1.001
    assert set(per_q) == set(range(N_QUERIES))
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOP_K


def test_ivfpq_sq8_rerank_plan_reads_codes_via_broadcast(spark):
    """The rerank-side plan shape: the Q×R shortlist rides into the
    SQ8 codes scan as a BROADCAST (never a shuffle of the codes
    table), and the scan the join probes is the persisted
    ebs_sq8_codes parquet — the d-bytes/row read the byte claim is
    about. No SortMergeJoin anywhere in the entry."""
    from example_beam_spark.plans import explain_formatted

    reg = load_registry()
    df = reg["ann_topk_ivfpq_sq8"].fn(spark, SF)
    plan = explain_formatted(df)
    drain_cleanups()
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "ebs_sq8_codes" in plan, plan[:3000]


def test_capped_substring_plan_never_broadcasts_gram_keys(spark):
    """The capped gram path's two joins (light-key filter, pair
    self-join) are big-big joins over corpus-sized key sets — the
    merge hints must hold them in SortMergeJoin (at the 200k lane
    Catalyst's post-aggregate estimate tried to broadcast ~1 GB of
    keys and exceeded driver maxResultSize)."""
    from example_beam_spark.plans import explain_formatted

    reg = load_registry()
    df = reg["dedup_exact_substring_capped"].fn(spark, SF)
    plan = explain_formatted(df)
    assert "SortMergeJoin" in plan, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
