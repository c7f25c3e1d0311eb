"""Zipfian text-fixture lane.

The driver's synthetic documents draw from a ~31-term vocabulary, which
SATURATES the 3-gram shingle space: every doc shares shingles with every
other, so PPJoin's prefix filter measures quadratic there (its documented
applicability condition — operators/dedup.py:386-392 — is a zipfian
shingle-df tail, which real corpora have and the fixture does not), the
top-100 vocabulary query returns 31 rows, and the quality/LM scorers see
no real distribution.

This lane generates a DETERMINISTIC zipfian corpus (10k-term vocabulary,
exponent ~1.07 — the empirical law for natural language; Zipf 1949,
public) with planted near-duplicates, at a base size and at 10x, and
measures the text operators in their intended regime:

- ``dedup_ngram_jaccard`` (PPJoin): prefix-candidate volume must grow
  sub-quadratically (ratio ~10-20x for a 10x corpus, not 100x);
- ``dedup_minhash_lsh``: bucket-pair volume for comparison;
- ``vocab_top_terms``: returns its full top-100 (not vocabulary-capped);
- ``doc_salient_terms``: per-doc tf·idf keywords are non-degenerate
  (distinct salient terms across the corpus >> 31);
- ``docs_quality_classifier`` / ``doc_lm_predictability``: score
  distributions have real spread (stddev > 0, non-trivial quantiles).

Usage: ``python tools/zipfian.py [--base 5000] [--out-dir DIR]`` —
prints one JSON line per size plus a growth-ratio summary line
(recorded in NOTES.md per round).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIPF_SEED = 20260814
VOCAB_SIZE = 10_000
ZIPF_EXPONENT = 1.07
NEAR_DUP_RATE = 0.03
# Heaps' law V = K * N^beta (vocabulary grows with corpus size — the
# property that keeps PPJoin's prefix dfs bounded on real corpora);
# K tuned so the 5k-doc base corpus has ~10k terms at ~80 tokens/doc
HEAPS_K = 16
HEAPS_BETA = 0.5
MEAN_TOKENS_PER_DOC = 80


def heaps_vocab_size(n_docs: int) -> int:
    return int(HEAPS_K * (MEAN_TOKENS_PER_DOC * n_docs) ** HEAPS_BETA)

# ~40 syllables -> unique natural-looking words by base-40 digit spelling
_SYLLABLES = (
    "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu "
    "ma me mi mo mu na ne ni no nu ra re ri ro ru sa se si so su"
).split()


def _word(i: int) -> str:
    """Deterministic unique word for vocabulary rank ``i`` (digits of i
    in base len(_SYLLABLES), spelled as syllables)."""
    n = len(_SYLLABLES)
    parts = [_SYLLABLES[i % n]]
    i //= n
    while i:
        parts.append(_SYLLABLES[i % n])
        i //= n
    return "".join(reversed(parts))


def zipfian_corpus(
    out_dir: str,
    n_docs: int,
    vocab_size: int | None = None,
    exponent: float = ZIPF_EXPONENT,
    seed: int = ZIPF_SEED,
) -> str:
    """Write ``documents.parquet`` under ``out_dir``: ``n_docs`` docs of
    30-300 tokens drawn from a rank-``exponent`` zipfian over a
    synthetic vocabulary; ``NEAR_DUP_RATE`` of docs are
    5%-token-dropout near-duplicates of an earlier doc (the planted
    signal the dedup operators must find). ``vocab_size=None`` (default)
    follows Heaps' law — vocabulary grows ~sqrt(corpus), like real text;
    pass a fixed size to model a CLOSED vocabulary (the saturation
    regime the driver fixture lives in, only less extreme). Same schema
    as the driver fixture. Deterministic in ``seed``."""
    if vocab_size is None:
        vocab_size = heaps_vocab_size(n_docs)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array([_word(i) for i in range(vocab_size)])
    p = 1.0 / np.arange(1, vocab_size + 1) ** exponent
    p /= p.sum()
    cum = np.cumsum(p)

    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < NEAR_DUP_RATE:
            base_toks = texts[int(rng.integers(0, i))].split()
            toks = [w for w in base_toks if rng.random() >= 0.05]
        else:
            n_tok = int(np.clip(rng.lognormal(4.3, 0.5), 30, 300))
            toks = vocab[np.searchsorted(cum, rng.random(n_tok))].tolist()
        texts.append(" ".join(toks))

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [("en", "es", "de", "fr")[i % 4] for i in range(n_docs)],
                    pa.string(),
                ),
                "source": pa.array(
                    [f"src{i % 20}" for i in range(n_docs)], pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )
    return out_dir


def pair_volumes(spark, sf_dir: str) -> dict[str, int]:
    """PPJoin prefix-pair and MinHash bucket-pair volumes — group-size
    aggregates, no pair materialization (same formulas as
    tools/stress_lane.candidate_volumes, minus the embedding lanes the
    zipfian corpus doesn't carry)."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        band_keys,
        minhash_signatures,
        shingles,
        shingles_raw,
    )
    from example_beam_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    mh = (
        band_keys(minhash_signatures(shingles_raw(docs)))
        .groupBy("band", "bk")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    sh = shingles(docs)
    dfreq = sh.groupBy("g").agg(F.count("*").alias("df"))
    prefix = (
        sh.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "g"))).alias("toks"),
            F.count("*").alias("n"),
        )
        .withColumn("p", F.col("n") - F.ceil(F.col("n") * _JACCARD_THRESHOLD) + 1)
        .select(F.explode(F.expr("slice(toks, 1, CAST(p AS INT))")).alias("tk"))
        .select(F.col("tk.g").alias("g"))
    )
    pp = (
        prefix.groupBy("g")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    return {"ppjoin_prefix_pairs": int(pp), "minhash_bucket_pairs": int(mh)}


def measure(spark, sf_dir: str, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from example_beam_spark.registry import load_registry

    reg = load_registry()
    out: dict = {"n_docs": n_docs, **pair_volumes(spark, sf_dir)}

    t0 = time.time()
    pairs = reg["dedup_ngram_jaccard"].fn(spark, sf_dir)
    out["ngram_jaccard_pairs"] = pairs.count()
    out["ngram_jaccard_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    out["minhash_lsh_pairs"] = reg["dedup_minhash_lsh"].fn(spark, sf_dir).count()
    out["minhash_lsh_sec"] = round(time.time() - t0, 1)

    vt = reg["vocab_top_terms"].fn(spark, sf_dir)
    out["vocab_top_terms_rows"] = vt.count()

    st = reg["doc_salient_terms"].fn(spark, sf_dir)
    out["distinct_salient_terms"] = st.select("term").distinct().count()

    q = reg["docs_quality_classifier"].fn(spark, sf_dir)
    s = q.agg(
        F.round(F.stddev("score"), 4).alias("sd"),
        F.round(F.min("score"), 4).alias("mn"),
        F.round(F.max("score"), 4).alias("mx"),
    ).collect()[0]
    out["quality_score_stddev"] = float(s["sd"])
    out["quality_score_range"] = [float(s["mn"]), float(s["mx"])]

    lm = reg["doc_lm_predictability"].fn(spark, sf_dir)
    s = lm.agg(
        F.round(F.stddev("predictability"), 6).alias("sd"),
        F.round(F.min("predictability"), 6).alias("mn"),
        F.round(F.max("predictability"), 6).alias("mx"),
    ).collect()[0]
    out["lm_predictability_stddev"] = float(s["sd"])
    out["lm_predictability_range"] = [float(s["mn"]), float(s["mx"])]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=5000)
    ap.add_argument("--out-dir", default="/tmp/spark_graft_zipf")
    args = ap.parse_args()

    from example_beam_spark.session import get_spark

    spark = get_spark()
    rows, fixed = [], []
    for mult in (1, 10):
        n = args.base * mult
        d = os.path.join(args.out_dir, f"n{n}")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            zipfian_corpus(d, n)
        r = {"vocab": heaps_vocab_size(n), **measure(spark, d, n)}
        print(json.dumps(r))
        rows.append(r)
        # closed-vocabulary twin: pair volumes only — the saturation
        # comparison (operators/dedup.py routing condition)
        df = os.path.join(args.out_dir, f"fixed_n{n}")
        if not os.path.exists(os.path.join(df, "documents.parquet")):
            zipfian_corpus(df, n, vocab_size=VOCAB_SIZE)
        fr = {"n_docs": n, "vocab": VOCAB_SIZE, **pair_volumes(spark, df)}
        print(json.dumps({"fixed_vocab": fr}))
        fixed.append(fr)
    ratio = {
        "growth_10x_heaps": {
            k: round(rows[1][k] / max(rows[0][k], 1), 1)
            for k in ("ppjoin_prefix_pairs", "minhash_bucket_pairs", "ngram_jaccard_pairs")
        },
        "growth_10x_fixed_vocab": {
            k: round(fixed[1][k] / max(fixed[0][k], 1), 1)
            for k in ("ppjoin_prefix_pairs", "minhash_bucket_pairs")
        },
        # quadratic would be 100x; the claim is the Heaps (real-corpus)
        # regime stays near-linear while a closed vocabulary drifts up
        "subquadratic_ppjoin_heaps": rows[1]["ppjoin_prefix_pairs"]
        < 30 * max(rows[0]["ppjoin_prefix_pairs"], 1),
    }
    print(json.dumps(ratio))


if __name__ == "__main__":
    main()
