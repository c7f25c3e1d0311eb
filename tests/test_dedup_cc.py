"""Connected-components implementations (dedup_cluster_canonical's
engine): label agreement between 'star' and 'propagation' on adversarial
shapes, and the round-count separation that motivates large-star/
small-star — a chain-shaped duplicate cluster (crawl mirrors of mirrors)
converges in O(log n) star rounds vs O(n) propagation rounds."""

from __future__ import annotations

import pytest

import random

from example_beam_spark.operators.dedup import connected_components

CHAIN_N = 64


def _labels(df):
    return {r["doc_id"]: r["label"] for r in df.collect()}


@pytest.mark.slow  # 28 s CC round-count comparison; EBS_RUN_SLOW=1 runs it
def test_chain_round_count_star_vs_propagation(spark):
    """64-node path graph: min-label propagation moves the minimum one
    hop per round (>= n/2 rounds); star contraction halves the
    remaining height per round (<= ~log2 n + c rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], "doc_a long, doc_b long"
    )
    star_labels, star_rounds = connected_components(pairs, impl="star")
    prop_labels, prop_rounds = connected_components(pairs, impl="propagation")

    expect = {i: 0 for i in range(CHAIN_N)}
    assert _labels(star_labels) == expect
    assert _labels(prop_labels) == expect
    assert prop_rounds >= CHAIN_N // 2, prop_rounds
    assert star_rounds <= 10, star_rounds  # ~log2(64)=6 plus settle rounds


def test_random_graph_label_agreement(spark):
    """Random multi-component graph (fixed seed): both implementations
    produce identical component-minimum labels."""
    rng = random.Random(20260814)
    # 3 islands of ids with random internal edges; ids deliberately
    # interleaved so component minima are not contiguous
    comps = [list(range(0, 90, 3)), list(range(1, 60, 3)), list(range(2, 30, 3))]
    edges = []
    for comp in comps:
        shuffled = comp[:]
        rng.shuffle(shuffled)
        # spanning path + extra chords
        edges += list(zip(shuffled, shuffled[1:]))
        edges += [
            (rng.choice(comp), rng.choice(comp)) for _ in range(len(comp) // 2)
        ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")

    star_labels, _ = connected_components(pairs, impl="star")
    prop_labels, _ = connected_components(pairs, impl="propagation")
    s, p = _labels(star_labels), _labels(prop_labels)
    assert s == p
    for comp in comps:
        present = [n for n in comp if n in s]
        assert {s[n] for n in present} == {min(present)}


def test_cluster_canonical_both_impls_match_oracle(spark, sf_dir):
    """The registered query stays oracle-green under EITHER flag value
    (the registry test covers the default; this pins the other)."""
    from example_beam_spark.operators.dedup import dedup_minhash_lsh
    from pyspark.sql import functions as F

    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .filter(F.col("is_dup"))
        .select("doc_a", "doc_b")
    )
    star_labels, _ = connected_components(pairs, impl="star")
    prop_labels, _ = connected_components(pairs, impl="propagation")
    assert _labels(star_labels) == _labels(prop_labels)
