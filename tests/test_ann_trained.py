"""Recall gate for the trained-centroid IVF: on a planted-neighborhood
corpus (the realistic embedding-geometry case — see tools/planted.py)
the trained coarse quantizer must reach production-quality recall at a
small scanned fraction. This is the quality contract replacing the value
oracle for the oracle-less ``ann_topk_ivf_trained`` entry."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.planted import planted_corpus

RECALL_FLOOR = 0.8
SCAN_CEIL = 0.05
# smaller than the stress lane's 20k corpus to keep pytest quick, but the
# same cell geometry (k=64, nprobe=3 → 4.7% at balanced cells)
N, N_CLUSTERS = 4000, 100


def test_trained_ivf_recall_and_scan_fraction(spark, tmp_path):
    from example_beam_spark.operators.ivf import ivf_trained_frames
    from example_beam_spark.operators.similarity import N_QUERIES, TOP_K
    from example_beam_spark.registry import load_registry
    from example_beam_spark.sources import load_table

    sf_dir = planted_corpus(str(tmp_path), n=N, n_clusters=N_CLUSTERS)

    truth: dict[int, set[int]] = {}
    brute = load_registry()["ann_topk_bruteforce"]
    for r in brute.fn(spark, sf_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(truth) == N_QUERIES and all(len(t) == TOP_K for t in truth.values())

    emb = load_table(spark, sf_dir, "embeddings")
    topk, cands = ivf_trained_frames(emb)
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    recall = sum(recalls) / len(recalls)
    scanned = cands.count() / (N_QUERIES * (N - 1))
    print(f"planted recall@10={recall:.3f} scanned={scanned:.4f}")
    assert recall >= RECALL_FLOOR, (recall, recalls)
    assert scanned <= SCAN_CEIL, scanned


def test_trained_ivf_runs_on_driver_fixture(spark, sf_dir):
    """The registered rows-only entry must run on the real fixture and
    produce a sane top-k shape (deterministic row count: the driver's
    rows-only gate repeats the count)."""
    from example_beam_spark.registry import load_registry

    q = load_registry()["ann_topk_ivf_trained"]
    rows = q.fn(spark, sf_dir).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
        assert -1.0 <= r.cosine <= 1.0
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(1 <= n <= 10 for n in per_q.values())


def test_trained_ivf_sample_is_deterministic(spark, tmp_path):
    """With the corpus LARGER than the training-sample cap (the regime
    where `limit` could flap between runs under partition scheduling),
    two trainings in one session must produce identical top-k frames —
    the hash-threshold sample makes centroids a pure function of the
    data."""
    from example_beam_spark.operators.ivf import ivf_trained_frames
    from example_beam_spark.sources import load_table

    sf_dir = planted_corpus(str(tmp_path), n=1200, n_clusters=24)
    emb = load_table(spark, sf_dir, "embeddings")

    def run():
        topk, _ = ivf_trained_frames(
            emb.repartition(7), k=16, nprobe=2, sample_cap=300
        )
        return sorted(
            (r.query_id, r.rk, r.neighbor_id, round(r.cosine, 9))
            for r in topk.collect()
        )

    first, second = run(), run()
    assert first and first == second


def test_two_level_quantizer_lifts_flat_clamp(spark, tmp_path):
    """Round-13 verdict #2: past the single-level training clamp the
    coarse quantizer goes TWO-LEVEL (coarse_plan_for -> 'two_level';
    k1 level-1 cells x proportional sub-quantizers), and the trained-IVF
    path keeps planted recall at a small scanned fraction. Forcing the
    regime here with a tiny sample_cap (flat clamp = 16 cells) proves
    the shape on a pytest-sized corpus; the 20M-row real-regime point
    lives in tools/stress_lane.py --lane ann20m."""
    import numpy as np

    from example_beam_spark.operators.ivf import (
        coarse_plan_for,
        ivf_trained_frames,
        train_two_level_centers,
    )
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.registry import load_registry
    from example_beam_spark.sources import load_table

    sf_dir = planted_corpus(str(tmp_path), n=N, n_clusters=N_CLUSTERS)
    small_cap = 512  # flat clamp = 512 // 32 = 16 cells < ceil(sqrt(4000)) = 64

    mode, k_target = coarse_plan_for(N, small_cap)
    assert mode == "two_level" and k_target == 64

    emb = load_table(spark, sf_dir, "embeddings")
    C1, C2, off = train_two_level_centers(emb, k_target, N)
    assert C2.shape[0] > 16  # effective cells exceed the flat clamp
    assert off[0] == 0 and off[-1] == C2.shape[0]
    assert np.all(np.diff(off) >= 1)
    assert np.allclose(np.linalg.norm(C2, axis=1), 1.0, atol=1e-9)

    truth: dict[int, set[int]] = {}
    for r in load_registry()["ann_topk_bruteforce"].fn(spark, sf_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    topk, cands = ivf_trained_frames(emb, sample_cap=small_cap)
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    recall = sum(recalls) / len(recalls)
    scanned = cands.count() / (N_QUERIES * (N - 1))
    print(f"two-level planted recall@10={recall:.3f} scanned={scanned:.4f} "
          f"k_eff={C2.shape[0]}")
    assert recall >= RECALL_FLOOR, (recall, recalls)
    assert scanned <= 0.1, scanned
