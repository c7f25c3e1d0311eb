"""Zipfian-regime pins for the text operators (see tools/zipfian.py).

The driver fixture's 31-term vocabulary saturates the shingle space, so
PPJoin's documented applicability condition (sub-quadratic prefix
candidates on a zipfian shingle-df tail — operators/dedup.py:386-392)
could never be tested there. These pins run on the deterministic zipfian
corpus where the condition holds and assert the claims.
"""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.zipfian import pair_volumes, zipfian_corpus


@pytest.mark.slow  # 22 s zipf ppjoin lane; EBS_RUN_SLOW=1 runs it
def test_ppjoin_prefix_candidates_subquadratic(spark, tmp_path):
    """4x the docs must grow PPJoin prefix pairs FAR less than the 16x a
    quadratic process would show (zipfian 3-gram df tail: most shingles
    are rare, so prefix buckets stay small). MinHash bucket pairs pinned
    sub-quadratic alongside."""
    small = zipfian_corpus(str(tmp_path / "s"), 2000)
    large = zipfian_corpus(str(tmp_path / "l"), 8000)
    vs, vl = pair_volumes(spark, small), pair_volumes(spark, large)
    assert vs["ppjoin_prefix_pairs"] > 0
    growth = vl["ppjoin_prefix_pairs"] / vs["ppjoin_prefix_pairs"]
    assert growth < 8, (vs, vl)  # quadratic would be 16
    mh_growth = vl["minhash_bucket_pairs"] / max(vs["minhash_bucket_pairs"], 1)
    assert mh_growth < 8, (vs, vl)


def test_text_scorers_nondegenerate_on_zipfian(spark, tmp_path):
    """The quality classifier and bigram-LM scorer produce real
    distributions (nonzero spread), and the vocabulary/salient-term
    queries are no longer vocabulary-capped at 31."""
    from pyspark.sql import functions as F

    from example_beam_spark.registry import load_registry

    sf = zipfian_corpus(str(tmp_path / "z"), 2000)
    reg = load_registry()
    assert reg["vocab_top_terms"].fn(spark, sf).count() == 100
    n_terms = (
        reg["doc_salient_terms"].fn(spark, sf).select("term").distinct().count()
    )
    assert n_terms > 1000, n_terms
    q = reg["docs_quality_classifier"].fn(spark, sf)
    sd = q.agg(F.stddev("score").alias("sd")).collect()[0]["sd"]
    assert sd and sd > 0.001
    lm = reg["doc_lm_predictability"].fn(spark, sf)
    sd = lm.agg(F.stddev("predictability").alias("sd")).collect()[0]["sd"]
    assert sd and sd > 0.0001
