"""Gates for the distributed full-corpus k-means trainer
(ivf.train_coarse_centers_distributed) and its registered IVF entry:

- partitioning invariance — the fixed-point int64 reduction makes the
  fit BIT-identical for any partitioning of the same rows (the property
  the sampled trainers cannot offer: see train_coarse_centers'
  determinism contract note);
- monotone objective — spherical k-means' assignment and mean-direction
  update each improve the mean best-cosine, and because every sum is an
  exact fixed-point integer the history is deterministic enough to
  assert it;
- planted recall/scan — the same production-quality gate as the
  sampled trained rung (tests/test_ann_trained.py), replacing the value
  oracle for the rows-only ``ann_topk_ivf_dkmeans`` entry.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from example_beam_spark.registry import drain_cleanups, load_registry
from tools.planted import planted_corpus

RECALL_FLOOR = 0.8
SCAN_CEIL = 0.05


def test_dkmeans_partitioning_invariant_and_objective_monotone(spark, tmp_path):
    from example_beam_spark.operators.ivf import train_coarse_centers_distributed
    from example_beam_spark.sources import load_table

    sf_dir = planted_corpus(str(tmp_path), n=1200, n_clusters=24)
    emb = load_table(spark, sf_dir, "embeddings")

    C2, h2 = train_coarse_centers_distributed(emb.repartition(2), 16, n_total=1200)
    C7, h7 = train_coarse_centers_distributed(emb.repartition(7), 16, n_total=1200)
    drain_cleanups()

    assert np.array_equal(C2, C7)  # bit-identical, not merely close
    assert h2 == h7
    # mean best-cosine never degrades (fixed-point floor can shave
    # <= 2^-24 per element off an exactly-tied step — allow that slack)
    for a, b in zip(h2, h2[1:]):
        assert b >= a - 1e-6, h2
    # sane objective scale: planted in-cluster cosine ~ 0.89
    assert 0.5 < h2[-1] <= 1.0, h2


def test_dkmeans_ivf_recall_and_scan_fraction(spark, tmp_path):
    import math

    from example_beam_spark.operators.ivf import (
        ivf_trained_frames,
        nprobe_for,
        train_coarse_centers_distributed,
    )
    from example_beam_spark.operators.similarity import N_QUERIES, TOP_K
    from example_beam_spark.sources import load_table

    N, N_CLUSTERS = 4000, 100
    sf_dir = planted_corpus(str(tmp_path), n=N, n_clusters=N_CLUSTERS)

    truth: dict[int, set[int]] = {}
    brute = load_registry()["ann_topk_bruteforce"]
    for r in brute.fn(spark, sf_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(truth) == N_QUERIES and all(len(t) == TOP_K for t in truth.values())

    emb = load_table(spark, sf_dir, "embeddings")
    k = math.isqrt(N - 1) + 1
    C, _ = train_coarse_centers_distributed(emb, k, n_total=N)
    topk, cands = ivf_trained_frames(emb, centers=C, nprobe=nprobe_for(len(C)))
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    scanned = cands.count() / (N_QUERIES * (N - 1))
    drain_cleanups()

    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    recall = sum(recalls) / len(recalls)
    print(f"dkmeans planted recall@10={recall:.3f} scanned={scanned:.4f}")
    assert recall >= RECALL_FLOOR, (recall, recalls)
    assert scanned <= SCAN_CEIL, scanned


def test_dkmeans_entry_runs_on_driver_fixture(spark, sf_dir):
    """Registered rows-only entry: sane top-k shape on the real fixture
    (deterministic row count — the trainer is partitioning-invariant,
    so the driver's rows-only repeat check cannot flap)."""
    q = load_registry()["ann_topk_ivf_dkmeans"]
    rows = q.fn(spark, sf_dir).collect()
    drain_cleanups()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
        assert -1.0 <= r.cosine <= 1.0
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(1 <= n <= 10 for n in per_q.values())
