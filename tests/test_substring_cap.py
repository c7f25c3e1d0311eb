"""Skew-lane pins for the frequency-capped exact-substring family
(round-13 verdict #1): plant a boilerplate gram in more docs than the
cap and prove, from the operator's own frames, that

- the heavy gram head is dropped BEFORE the self-join (every surviving
  gram key has doc-frequency <= F, so candidate pairs per gram are
  bounded by F(F-1)/2 — the quadratic blowup is structurally gone);
- pairs connected through rarer grams survive with their rare-gram
  mass; pairs whose ONLY overlap was the boilerplate disappear (the
  documented recall trade — that mass is the doc-level near-dup
  family's job);
- the span operator under the same cap keeps rare-span lengths exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_beam_spark.operators.decontam import (
    SUBSTR_L,
    _cap_grams,
    _substr_gram_arr,
    exact_substring_pairs,
    longest_shared_span_pairs,
)

CAP = 8
BOILER = "x" * SUBSTR_L + "LICENSE HEADER COMMON TO MANY DOCUMENTS " * 2
RARE = "the quick brown fox jumps over twelve lazy dogs tonight"  # > L chars


def _mk(i: int, body: str) -> tuple[int, str]:
    return (i, body)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # 12 docs (> CAP) share the boilerplate header, otherwise disjoint
    for i in range(12):
        rows.append(_mk(i, BOILER + f"unique tail {i} " + chr(97 + i) * 60))
    # docs 100/101 share a rare >L-char span (plus distinct bodies)
    rows.append(_mk(100, "prefix one " + RARE + " suffix alpha" + "q" * 50))
    rows.append(_mk(101, "prefix two " + RARE + " suffix beta" + "z" * 50))
    # doc 102 shares ONLY boilerplate with the 12 (drops under the cap)
    rows.append(_mk(102, BOILER + "totally different afterwards " + "m" * 60))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_drops_heavy_gram_head_before_join(docs):
    grams = docs.select("doc_id", F.explode(_substr_gram_arr(False)).alias("g"))
    capped = _cap_grams(grams, "g", CAP)
    # every surviving key's doc frequency is <= CAP -> per-gram candidate
    # pairs <= CAP*(CAP-1)/2 by construction
    max_df = (
        capped.select("doc_id", "gk")
        .distinct()
        .groupBy("gk")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_df <= CAP
    # the planted boilerplate gram (df=13 > CAP) is gone
    boiler_gram = BOILER[:SUBSTR_L]
    heavy_key = (
        docs.sparkSession.range(1)
        .select(F.unhex(F.md5(F.lit(boiler_gram))).alias("gk"))
        .collect()[0][0]
    )
    assert capped.filter(F.col("gk") == F.lit(heavy_key)).count() == 0
    # total candidate volume is bounded: sum over kept grams of C(df,2)
    cand = (
        capped.select("doc_id", "gk")
        .distinct()
        .groupBy("gk")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")))
        .collect()[0][0]
    )
    n_keys = capped.select("gk").distinct().count()
    assert cand <= n_keys * CAP * (CAP - 1) / 2


def test_capped_pairs_keep_rare_mass_drop_boiler_only_pairs(docs):
    raw = {
        (r.doc_a, r.doc_b): r.n_shared_grams
        for r in exact_substring_pairs(docs, None).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.n_shared_grams
        for r in exact_substring_pairs(docs, CAP).collect()
    }
    # raw connects all 13 boilerplate docs pairwise (12 planted + doc 102)
    assert (0, 1) in raw and (0, 102) in raw and (100, 101) in raw
    # capped: boilerplate-only pairs gone, rare-span pair intact with the
    # exact rare-gram mass (its shared span contributes len-L+1 grams,
    # all with df=2 <= CAP)
    assert (0, 1) not in capped and (0, 102) not in capped
    rare_grams = len(" " + RARE + " suffix") - SUBSTR_L + 1
    assert capped[(100, 101)] >= rare_grams > 0
    assert capped[(100, 101)] == raw[(100, 101)]
    # capped is a subset of raw with identical counts where both exist
    # ONLY for pairs whose grams were all rare; no pair gains mass
    for k, v in capped.items():
        assert k in raw and v <= raw[k]


def test_capped_span_operator_keeps_rare_span_length(docs):
    spans = {
        (r.doc_a, r.doc_b): (r.span_chars, r.n_spans)
        for r in longest_shared_span_pairs(docs, CAP).collect()
    }
    raw_spans = {
        (r.doc_a, r.doc_b): (r.span_chars, r.n_spans)
        for r in longest_shared_span_pairs(docs, None).collect()
    }
    assert (0, 1) not in spans  # boilerplate-only pair capped out
    assert spans[(100, 101)] == raw_spans[(100, 101)]  # rare span exact
    # the rare shared span is at least len(RARE) chars long
    assert spans[(100, 101)][0] >= len(RARE)
