"""sf1-equivalent stress lane for the similarity/dedup path.

The scale claims of the dedup/ANN operators (PPJoin prefix work stays
sub-quadratic, LSH buckets stay balanced) are plan-tested at bench SF but
the corpus never exceeds 5k docs / 2k vectors there. This tool generates
a deterministic 10x corpus (50k documents, 20k embeddings, 1M events
with 10x the users at constant per-user density — the sf1 shape) from
the sf0.1 tables and runs the scale-sensitive query suite (~30 queries,
multi-minute: includes the 70 s exact n-gram twin) against it,
reporting wall time, result rows, and the candidate-pair volumes that
decide scalability for the quadratic-risk operators:

- minhash_bucket_pairs:  sum over LSH band-buckets of C(|bucket|, 2)
- ppjoin_prefix_pairs:   sum over prefix tokens of C(df_prefix(g), 2)
- embedding_bucket_pairs: sum over 8-bit hyperplane buckets of C(|b|, 2)

Sub-quadratic means these grow ~linearly with corpus size while n**2
grows 100x for a 10x corpus.

Corpus recipe (seeded, reproducible): every new doc derives from an
sf0.1 base text — 3% are near-duplicates (5% token dropout, Jaccard of
3-gram shingles ~0.7 > the 0.5 threshold), the rest are remixes
(seeded word shuffle + 30% vocabulary swaps, shingle overlap ~0).
Embeddings: 2% near-duplicates (small Gaussian perturbation), the rest
fresh Gaussian vectors.

Usage:  python tools/stress_lane.py [--out-dir DIR]
Writes the corpus under DIR (default /tmp/spark_graft_stress) on first
run, reuses it after; prints one JSON line with the measurements
(recorded in NOTES.md per round).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF_DIR = "/root/testdata/sf0.1"

# corpus generators shared across lanes — tools/corpora.py
from tools.corpora import generate_scaled as generate  # noqa: E402


def candidate_volumes(spark, sf_dir: str) -> dict[str, int]:
    """The three candidate-pair volumes (see module doc) — each is a cheap
    aggregate over group sizes, NOT a pair materialization."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        band_keys,
        minhash_signatures,
        shingles,
        shingles_raw,
    )
    from example_beam_spark.operators.similarity import (
        band_keys_array,
        neardup_band_bits,
    )
    from example_beam_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")

    sig = minhash_signatures(shingles_raw(docs))
    mh = (
        band_keys(sig)
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

    emb = load_table(spark, sf_dir, "embeddings")
    # banded form (round 9): candidate PROBES = Σ over (band, key) of
    # c(c-1)/2 — an upper bound on distinct candidate pairs (a pair
    # agreeing in k bands is probed k times, deduped before verify)
    n_vecs = emb.count()
    r = neardup_band_bits(n_vecs)
    eb = (
        emb.select(
            F.posexplode(band_keys_array(r, n_vecs)).alias("band", "bkey")
        )
        .groupBy("band", "bkey")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )

    # IVF cell balance: per-query candidate work is the probed cells' sizes,
    # so the max/mean cell ratio is the skew that decides the scale story
    from example_beam_spark.operators.ivf import seed_scores
    from example_beam_spark.operators.similarity import norm_dec

    base = emb.select("vec_id", "embedding", norm_dec("embedding").alias("nrm"))
    cell_sizes = (
        seed_scores(base)
        .filter(F.col("crk") == 1)
        .groupBy("seed_id")
        .agg(F.count("*").alias("c"))
        .agg(
            F.max("c").alias("mx"),
            F.avg("c").alias("avg"),
            F.count("*").alias("n_cells"),
        )
        .collect()[0]
    )
    return {
        "minhash_bucket_pairs": int(mh),
        "ppjoin_prefix_pairs": int(pp),
        "embedding_bucket_pairs": int(eb),
        "neardup_band_bits": r,
        "ivf_cells": int(cell_sizes["n_cells"]),
        "ivf_max_cell": int(cell_sizes["mx"]),
        "ivf_avg_cell": round(float(cell_sizes["avg"]), 1),
    }


def lane_100x(out_dir: str) -> None:
    """Second decade of the growth curve for the core dedup path:
    500k docs, 10M events (100x users at constant per-user density), CC
    on a 1M-edge chain. Embeddings are skipped (ANN quality is the
    planted lane's job; the isotropic corpus caps recall by
    construction). Compare against the 10x lane's numbers: ratios ≈10
    for the linear-shaped queries are the claim under test; the minhash
    bucket-pair volume is the quadratic-risk number recorded alongside.
    ~128 GiB heap holds this comfortably (docs parquet ~500 MB)."""
    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        t0 = time.time()
        generate(out_dir, doc_copies=100, emb_copies=0)
        print(f"# generated 100x corpus in {time.time() - t0:.1f}s -> {out_dir}")

    from pyspark.sql import functions as F

    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="stress_lane_100x")
    reg = load_registry()
    # corpus scale read back from the written parquet (round-7 advice:
    # deriving it keeps the recorded numbers honest if the sf0.1 base or
    # doc_copies ever changes)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(out_dir, "documents.parquet")).num_rows
    n_events = pq.read_metadata(os.path.join(out_dir, "events.parquet")).num_rows
    base_docs = pq.read_metadata(
        os.path.join(SRC_SF_DIR, "documents.parquet")
    ).num_rows
    result: dict = {
        "sf_equiv": round(0.1 * n_docs / base_docs, 3),
        "docs": n_docs,
        "events": n_events,
        "queries": {},
    }
    for name in ("dedup_exact", "dedup_minhash_lsh", "events_funnel"):
        t0 = time.time()
        n = reg[name].fn(spark, out_dir).count()
        result["queries"][name] = {"sec": round(time.time() - t0, 2), "rows": n}
        drain_cleanups()
        print(f"# {name}: {result['queries'][name]}", flush=True)

    from example_beam_spark.operators.dedup import (
        band_keys,
        minhash_signatures,
        shingles_raw,
    )
    from example_beam_spark.sources.parquet import load_table

    docs = load_table(spark, out_dir, "documents")
    result["minhash_bucket_pairs"] = int(
        band_keys(minhash_signatures(shingles_raw(docs)))
        .groupBy("band", "bk")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    result["cc_chain_1m_edges"] = cc_chain_lane(spark, n=1_000_001)
    print(json.dumps(result))


def _semdedup_trained_cells(spark, sf_dir: str, cell_target: int = 500) -> dict:
    """SemDeDup's documented 100-TB shape MEASURED: spherical-kmeans
    cells with k = n / cell_target (k grows with the corpus so per-cell
    pair work stays constant — total pairs ≈ n·cell_target/2, LINEAR in
    n), then the same within-cell pairwise drop pass as the registered
    ``semantic_dedup`` (operators/curation.py:118) with plain double
    dots (no oracle parity needed on a lane). Returns wall, k, pair
    volume and kept fraction."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from example_beam_spark.operators.curation import SEM_THRESHOLD
    from example_beam_spark.operators.ivf import KMEANS_SEED
    from example_beam_spark.sources.parquet import load_table

    t0 = time.time()
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(8, n // cell_target)
    # deterministic hash-threshold sample (the ivf.py contract); the
    # sample and iteration budget SHRINK as k grows — a k-cell coarse
    # quantizer needs ~tens of points per cell, and kmeans cost is
    # k x sample x dim x iters (the training bill would otherwise grow
    # QUADRATICALLY with corpus size under k ∝ n)
    sample = emb
    sample_cap = min(100_000, 25 * k)
    if n > sample_cap:
        denom = 1_000_000
        thresh = -(-sample_cap * denom // n)
        sample = emb.filter(
            F.pmod(F.xxhash64("vec_id", F.lit(KMEANS_SEED)), F.lit(denom))
            < F.lit(thresh)
        )
    print(f"# semdedup n={n} k={k} sample<={sample_cap}", flush=True)
    # JVM-side L2 normalize + random init: the HOF `transform(v, x/nrm)`
    # projection re-evaluates the nrm aggregate per ELEMENT once
    # CollapseProject inlines it (a dim x blowup, ~70 s per pass at
    # 200k x 64 — see operators/ivf.py section comment), and k-means||
    # init buys nothing for a coarse quantizer.
    train = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(
        sample.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
        )
    ).persist()
    model = KMeans(
        k=k, seed=KMEANS_SEED, maxIter=3, featuresCol="features",
        initMode="random",
    ).fit(train)
    train.unpersist()
    print(f"# semdedup kmeans fitted at {round(time.time()-t0,1)}s", flush=True)

    # Cell assignment as a broadcast-centers GEMM (Arrow-batched
    # mapInPandas): at k ∝ n the declarative n x k join explodes to n·k
    # rows (8e9 at 2M vectors / k=4000), each paying a per-row HOF dot —
    # the one place SURVEY §7's "vectorized pandas where built-ins can't
    # express it" rule applies. The k x dim centers matrix is ~2 MB
    # broadcast; each Arrow batch does one X @ C.T argmax in BLAS.
    import numpy as np
    import pandas as pd

    C = np.array(model.clusterCenters(), dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        CC = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": (X @ CC.T).argmax(axis=1).astype("int32"),
                    "u": list(X),
                }
            )

    cells = emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell int, u array<double>"
    )
    cells = cells.persist()
    pair_volume = int(
        cells.groupBy("cell")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("p"))
        .collect()[0]["p"]
    )
    print(f"# semdedup pairs={pair_volume} at {round(time.time()-t0,1)}s", flush=True)

    # Within-cell pairwise as a per-cell gram matrix (applyInPandas):
    # the declarative self-join would MATERIALIZE n·c/2 rows each
    # carrying two dim-64 arrays (~0.5 TB at 2M vectors) before any
    # filtering; the shuffle-local kernel computes the same c x c
    # cosines in one BLAS call per cell and emits only the dropped ids.
    # Lowest-id keeper: a vector is dropped iff a lower-id cellmate
    # exceeds the threshold — identical to curation.semantic_dedup.
    def drop_in_cell(pdf):
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(pdf["u"].to_numpy())[order]
        c = len(ids)
        dropped = np.zeros(c, dtype=bool)
        blk = 1024  # row-blocked gram: bounded memory even if kmeans
        for s in range(0, c, blk):  # hands one cell far more than c_target
            G = X[s : s + blk] @ X.T  # b x c
            lower = np.arange(c)[None, :] < (s + np.arange(G.shape[0]))[:, None]
            dropped[s : s + blk] = ((G >= SEM_THRESHOLD) & lower).any(axis=1)
        return pd.DataFrame({"vec_id": ids[dropped]})

    drops = cells.groupBy("cell").applyInPandas(drop_in_cell, "vec_id long")
    n_dropped = drops.count()
    cells.unpersist()
    return {
        "n": n,
        "k": k,
        "pairs": pair_volume,
        "kept_frac": round(1.0 - n_dropped / n, 4),
        "sec": round(time.time() - t0, 2),
    }


def ann_second_decade(out_dir: str) -> None:
    """Round-7 verdict #3: push the ANN proofs through their second
    decade. Planted-neighborhood corpora (tools/planted.py — constant
    cluster size 100, so geometry is scale-invariant) at 10x (200k) and
    100x (2M) vectors; at each scale measure:

    - exact brute-force wall (the linear baseline the claim is judged
      against),
    - ``ann_topk_ivf_trained`` at its registered operating point
      (adaptive k = ⌈√n⌉, nprobe = nprobe_for(k) — round-11 verdict #1):
      recall@10 vs brute force, scanned fraction, wall — the gate is
      recall >= 0.9 at <= 5% scanned at 2M; if recall degrades the lane
      re-measures at 2× nprobe and records the recall/scan trade-off
      instead of hiding it,
    - the SemDeDup scale path with k ∝ n (constant cell size — the
      design claim 'k scales with corpus size to bound per-cell work'
      from operators/curation.py, now a measured number).
    """
    from example_beam_spark.operators.ivf import ivf_trained_frames
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark
    from example_beam_spark.sources.parquet import load_table
    from tools.planted import planted_corpus

    spark = get_spark(app_name="stress_lane_ann2m")
    reg = load_registry()
    result: dict = {"scales": []}
    for n, tag in ((200_000, "10x"), (2_000_000, "100x")):
        d = os.path.join(out_dir, f"planted_{tag}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            t0 = time.time()
            planted_corpus(d, n=n, n_clusters=n // 100)
            print(f"# planted {n} vectors in {time.time() - t0:.1f}s -> {d}")

        row: dict = {"n": n, "tag": tag}
        t0 = time.time()
        truth: dict[int, set[int]] = {}
        for r in reg["ann_topk_bruteforce"].fn(spark, d).collect():
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        row["bruteforce_sec"] = round(time.time() - t0, 2)
        drain_cleanups()

        from example_beam_spark.operators.ivf import coarse_k_for, nprobe_for

        k_ad, np_ad = coarse_k_for(n), nprobe_for(coarse_k_for(n))

        def trained_point(nprobe: int | None) -> dict:
            t0 = time.time()
            topk, cands = ivf_trained_frames(
                load_table(spark, d, "embeddings"), nprobe=nprobe
            )
            got: dict[int, set[int]] = {}
            for r in topk.collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            recalls = [
                len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
            ]
            return {
                "k": k_ad,
                "nprobe": np_ad if nprobe is None else nprobe,
                "recall_at_10": round(sum(recalls) / len(recalls), 3),
                "scanned_frac": round(
                    cands.count() / (N_QUERIES * (n - 1)), 4
                ),
                "sec": round(time.time() - t0, 2),
            }

        row["ivf_trained"] = trained_point(None)  # adaptive operating point
        if row["ivf_trained"]["recall_at_10"] < 0.9:
            row["ivf_trained_2x_nprobe"] = trained_point(2 * np_ad)
        drain_cleanups()

        row["semdedup_scaled_k"] = _semdedup_trained_cells(spark, d)
        drain_cleanups()

        # round-9: embedding_neardup_pairs through its second decade —
        # the banded-LSH acceptance criterion is candidate probes and
        # found pairs growing ~linearly with n (bucket occupancy held
        # constant by the band-width ladder), the same criterion
        # dedup_minhash_lsh passed at 500k docs.
        from example_beam_spark.operators.similarity import (
            band_keys_array,
            neardup_band_bits,
        )
        from pyspark.sql import functions as F

        emb = load_table(spark, d, "embeddings")
        r_bits = neardup_band_bits(n)
        t0 = time.time()
        probes = (
            emb.select(
                F.posexplode(band_keys_array(r_bits, n)).alias("band", "bkey")
            )
            .groupBy("band", "bkey")
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
            .collect()[0]["pairs"]
        )
        probe_sec = round(time.time() - t0, 2)
        t0 = time.time()
        found = reg["embedding_neardup_pairs"].fn(spark, d).count()
        row["neardup"] = {
            "band_bits": r_bits,
            "candidate_probes": int(probes),
            "probe_count_sec": probe_sec,
            "found_pairs": int(found),
            "full_op_sec": round(time.time() - t0, 2),
        }
        drain_cleanups()
        result["scales"].append(row)
        print(f"# {tag}: {json.dumps(row)}", flush=True)
    print(json.dumps(result))


def neardup_lane(out_dir: str) -> None:
    """Round-10 verdict #1: just the embedding_neardup_pairs block of
    the ann2m lane (found-pairs + wall at 200k and 2M planted vectors)
    — the acceptance bar for the Arrow dot-kernel verify stage is
    found_pairs BIT-IDENTICAL to the r9 HOF run (5,342,019 / 46,297,377)
    with the 2M wall materially under 261 s."""
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark
    from tools.planted import planted_corpus

    spark = get_spark(app_name="stress_lane_neardup")
    reg = load_registry()
    result: dict = {"scales": []}
    for n, tag in ((200_000, "10x"), (2_000_000, "100x")):
        d = os.path.join(out_dir, f"planted_{tag}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            planted_corpus(d, n=n, n_clusters=n // 100)
        t0 = time.time()
        found = reg["embedding_neardup_pairs"].fn(spark, d).count()
        row = {
            "n": n,
            "tag": tag,
            "found_pairs": int(found),
            "full_op_sec": round(time.time() - t0, 2),
        }
        drain_cleanups()
        result["scales"].append(row)
        print(f"# {tag}: {json.dumps(row)}", flush=True)
    print(json.dumps(result))


def exact_topk_truth(spark, sf_dir: str) -> dict[int, set[int]]:
    """Fast exact float64 cosine top-TOP_K ground truth for the planted
    lanes: per-Arrow-batch GEMM against the broadcast query block +
    per-batch top-K, then a global window merge over the tiny
    (batches × queries × K) partial frame. Replaces the dec-quantized
    ann_topk_bruteforce entry as the truth source at the third decade
    (75 s at 2M → ~13 min at 20M for the HOF path; this kernel reads
    the corpus once through BLAS). Recall measured against float64
    exact cosine — ties are measure-zero on planted gaussians."""
    import numpy as np

    from example_beam_spark.operators.similarity import N_QUERIES, TOP_K
    from example_beam_spark.sources.parquet import load_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q_pdf = emb.filter(F.col("vec_id") < N_QUERIES).toPandas()
    q_ids = q_pdf["vec_id"].to_numpy()
    Q = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, Q))
    topk = TOP_K

    def scan(batches):
        import pandas as pd

        qids, QQ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = X @ QQ.T  # (b, nq)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(qids):
                keep = ids != qid
                s, nid = S[keep, j], ids[keep]
                order = np.lexsort((nid, -s))[:topk]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_n.append(nid[order])
                out_c.append(s[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    local = emb.mapInPandas(scan, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    rows = (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .collect()
    )
    truth: dict[int, set[int]] = {}
    for r in rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    return truth


def ann_third_decade(out_dir: str, n: int = 20_000_000) -> None:
    """Round-13 verdict #2: the capacity point PAST the single-level
    training clamp (k = ⌈√n⌉ > 3,125 → coarse_plan_for goes
    'two_level'). 20M planted vectors (constant cluster size 100, the
    scale-invariant geometry of the 2M lane); measure the two-level
    trained IVF at its adaptive operating point: effective cells,
    nprobe, recall@10 vs float64-exact truth, scanned fraction, and
    walls for corpus build / truth / train+index+query. Gate:
    recall@10 >= 0.9 with k_eff > 3,125 at a ~4% scan."""
    from example_beam_spark.operators.ivf import (
        coarse_plan_for,
        ivf_trained_frames,
        nprobe_for,
        train_two_level_centers,
    )
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.registry import drain_cleanups
    from example_beam_spark.session import get_spark
    from example_beam_spark.sources.parquet import load_table
    from tools.planted import planted_corpus

    spark = get_spark(app_name="stress_lane_ann20m")
    d = os.path.join(out_dir, "planted_1000x")
    row: dict = {"n": n}
    if not os.path.exists(os.path.join(d, "embeddings.parquet")):
        t0 = time.time()
        planted_corpus(d, n=n, n_clusters=n // 100)
        row["corpus_build_sec"] = round(time.time() - t0, 1)
        print(f"# planted {n} vectors in {row['corpus_build_sec']}s -> {d}")

    t0 = time.time()
    truth = exact_topk_truth(spark, d)
    row["truth_sec"] = round(time.time() - t0, 1)
    print(f"# exact truth in {row['truth_sec']}s", flush=True)

    mode, k_target = coarse_plan_for(n)
    row["mode"], row["k_target"] = mode, k_target
    emb = load_table(spark, d, "embeddings")
    # one explicit train for reporting k_eff (deterministic — the frames
    # call below retrains to the identical quantizer)
    t0 = time.time()
    _, C2, _ = train_two_level_centers(emb, k_target, n)
    k_eff = int(C2.shape[0])
    row["train_sec"] = round(time.time() - t0, 1)
    row["k_eff"], row["nprobe"] = k_eff, nprobe_for(k_eff)
    print(f"# two-level quantizer: k_eff={k_eff} nprobe={row['nprobe']} "
          f"(train {row['train_sec']}s)", flush=True)

    t0 = time.time()
    topk, cands = ivf_trained_frames(emb)
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    row["recall_at_10"] = round(sum(recalls) / len(recalls), 3)
    row["scanned_frac"] = round(cands.count() / (N_QUERIES * (n - 1)), 4)
    row["ivf_sec"] = round(time.time() - t0, 1)
    drain_cleanups()
    print(json.dumps(row), flush=True)


def cellpart_third_decade(out_dir: str, n: int = 20_000_000) -> None:
    """Round-13 composition point: the PERSISTED cell-partitioned
    IVFPQ index (and its SQ8-rerank variant) built with the two-level
    coarse quantizer at 20M vectors — k_eff directories, directory
    pruning at ~nprobe/k_eff, recall vs float64-exact truth for both
    the float-rerank and SQ8-rerank entries, plus the rerank-side byte
    ratio. Reuses the ann20m planted corpus."""
    from example_beam_spark.operators.scalepaths import sq8_codes_table
    from example_beam_spark.operators.structures import ivfpq_cellpart_scan
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark
    from tools.planted import planted_corpus

    spark = get_spark(app_name="stress_lane_cellpart20m")
    reg = load_registry()
    d = os.path.join(out_dir, "planted_1000x")
    row: dict = {"n": n}
    if not os.path.exists(os.path.join(d, "embeddings.parquet")):
        t0 = time.time()
        planted_corpus(d, n=n, n_clusters=n // 100)
        row["corpus_build_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    truth = exact_topk_truth(spark, d)
    row["truth_sec"] = round(time.time() - t0, 1)
    print(f"# exact truth in {row['truth_sec']}s", flush=True)

    def recall_of(name: str) -> tuple[float, float]:
        t0 = time.time()
        got: dict[int, set[int]] = {}
        for r in reg[name].fn(spark, d).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        sec = round(time.time() - t0, 1)
        drain_cleanups()
        recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
        return round(sum(recalls) / len(recalls), 3), sec

    rec, sec = recall_of("ann_topk_ivfpq_cellpart")
    _, _, n_probed, k_cells = ivfpq_cellpart_scan(spark, d)
    drain_cleanups()
    row["cellpart"] = {
        "recall_at_10": rec,
        "sec": sec,
        "k_eff": k_cells,
        "probed_cells": n_probed,
        "probed_frac": round(n_probed / k_cells, 4),
    }
    print(f"# cellpart: {json.dumps(row['cellpart'])}", flush=True)

    rec, sec = recall_of("ann_topk_ivfpq_sq8")
    codes_dir, _, _ = sq8_codes_table(spark, d)
    sq8_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(codes_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    float_bytes = os.path.getsize(os.path.join(d, "embeddings.parquet"))
    row["ivfpq_sq8"] = {
        "recall_at_10": rec,
        "sec": sec,
        "byte_ratio": round(sq8_bytes / float_bytes, 3),
    }
    drain_cleanups()
    print(json.dumps(row), flush=True)


def dkmeans_lane(out_dir: str) -> None:
    """Round-13: the distributed full-corpus trainer at the second
    decade. At 200k and 2M planted vectors (reusing the ann2m corpora):
    train k = ⌈√n⌉ UNCLAMPED centers with
    train_coarse_centers_distributed (the clamp-free path — at 2M this
    is k=1415 like the two-level quantizer, but trained on all n rows
    instead of a sample), then measure recall@10 / scanned fraction /
    walls against the same brute-force truth as the sampled rungs. The
    lane's claim: full-corpus training costs iters extra linear passes
    and buys sampling-independent, bit-deterministic centroids — the
    recall delta vs the sampled trainer is the measured price of
    sampling."""
    import math

    from example_beam_spark.operators.ivf import (
        ivf_trained_frames,
        nprobe_for,
        train_coarse_centers_distributed,
    )
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark
    from example_beam_spark.sources.parquet import load_table
    from tools.planted import planted_corpus

    spark = get_spark(app_name="stress_lane_dkmeans")
    reg = load_registry()
    result: dict = {"scales": []}
    for n, tag in ((200_000, "10x"), (2_000_000, "100x")):
        d = os.path.join(out_dir, f"planted_{tag}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            t0 = time.time()
            planted_corpus(d, n=n, n_clusters=n // 100)
            print(f"# planted {n} vectors in {time.time() - t0:.1f}s -> {d}")

        row: dict = {"n": n, "tag": tag}
        t0 = time.time()
        truth: dict[int, set[int]] = {}
        for r in reg["ann_topk_bruteforce"].fn(spark, d).collect():
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        row["bruteforce_sec"] = round(time.time() - t0, 2)
        drain_cleanups()

        emb = load_table(spark, d, "embeddings")
        k = math.isqrt(n - 1) + 1
        t0 = time.time()
        C, hist = train_coarse_centers_distributed(emb, k, n_total=n)
        row["train_sec"] = round(time.time() - t0, 2)
        row["k"] = int(C.shape[0])
        row["nprobe"] = nprobe_for(len(C))
        row["obj_history"] = [round(h, 5) for h in hist]
        t0 = time.time()
        topk, cands = ivf_trained_frames(
            emb, centers=C, nprobe=nprobe_for(len(C))
        )
        got: dict[int, set[int]] = {}
        for r in topk.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
        row["recall_at_10"] = round(sum(recalls) / len(recalls), 3)
        row["scanned_frac"] = round(cands.count() / (N_QUERIES * (n - 1)), 4)
        row["query_sec"] = round(time.time() - t0, 2)
        drain_cleanups()
        result["scales"].append(row)
        print(f"# {tag}: {json.dumps(row)}", flush=True)
    print(json.dumps(result))


def dkmeans_third_decade(out_dir: str, n: int = 20_000_000) -> None:
    """The clamp-free trainer at the THIRD decade: k = ⌈√20M⌉ = 4,473
    centers refined over ALL 20M rows (no sample anywhere after init) —
    the companion point to cellpart20m's two-level-on-a-sample: both
    capacity paths past the 3,125-cell clamp, one trading extra linear
    passes for sampling-independent centroids. Reuses the ann20m corpus
    and the scan-based exact truth."""
    import math

    from example_beam_spark.operators.ivf import (
        ivf_trained_frames,
        nprobe_for,
        train_coarse_centers_distributed,
    )
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.registry import drain_cleanups
    from example_beam_spark.session import get_spark
    from example_beam_spark.sources.parquet import load_table
    from tools.planted import planted_corpus

    # third-decade jobs hold multi-minute driver-side phases (the k=4.5k
    # seeded init) between Spark actions — widen the rpc/broadcast
    # timeouts so a busy machine can't kill the run mid-lane
    spark = get_spark(
        app_name="stress_lane_dkmeans20m",
        extra_conf={
            "spark.network.timeout": "800s",
            "spark.executor.heartbeatInterval": "60s",
            "spark.sql.broadcastTimeout": "1200",
        },
    )
    d = os.path.join(out_dir, "planted_1000x")
    if not os.path.exists(os.path.join(d, "embeddings.parquet")):
        t0 = time.time()
        planted_corpus(d, n=n, n_clusters=n // 100)
        print(f"# planted {n} vectors in {time.time() - t0:.1f}s -> {d}")

    row: dict = {"n": n}
    t0 = time.time()
    truth = exact_topk_truth(spark, d)
    row["truth_scan_sec"] = round(time.time() - t0, 2)

    emb = load_table(spark, d, "embeddings")
    k = math.isqrt(n - 1) + 1
    t0 = time.time()
    C, hist = train_coarse_centers_distributed(emb, k, n_total=n)
    row["train_sec"] = round(time.time() - t0, 2)
    row["k"] = int(C.shape[0])
    row["nprobe"] = nprobe_for(len(C))
    row["obj_history"] = [round(h, 5) for h in hist]
    t0 = time.time()
    topk, cands = ivf_trained_frames(emb, centers=C, nprobe=nprobe_for(len(C)))
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    row["recall_at_10"] = round(sum(recalls) / len(recalls), 3)
    row["scanned_frac"] = round(cands.count() / (N_QUERIES * (n - 1)), 5)
    row["query_sec"] = round(time.time() - t0, 2)
    drain_cleanups()
    print(json.dumps(row))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/spark_graft_stress")
    ap.add_argument(
        "--lane",
        choices=(
            "10x",
            "100x",
            "ann2m",
            "neardup2m",
            "ann20m",
            "cellpart20m",
            "dkmeans2m",
            "dkmeans20m",
        ),
        default="10x",
        help="100x runs the core-dedup second-decade lane (own corpus "
        "dir); ann2m runs the planted-ANN second decade (200k + 2M "
        "vectors); neardup2m runs only the neardup block of ann2m",
    )
    args = ap.parse_args()
    if args.lane == "100x":
        lane_100x(args.out_dir.rstrip("/") + "_100x")
        return
    if args.lane == "ann2m":
        ann_second_decade(args.out_dir.rstrip("/") + "_ann2m")
        return
    if args.lane == "neardup2m":
        neardup_lane(args.out_dir.rstrip("/") + "_ann2m")
        return
    if args.lane == "ann20m":
        ann_third_decade(args.out_dir.rstrip("/") + "_ann20m")
        return
    if args.lane == "cellpart20m":
        cellpart_third_decade(args.out_dir.rstrip("/") + "_ann20m")
        return
    if args.lane == "dkmeans2m":
        dkmeans_lane(args.out_dir.rstrip("/") + "_ann2m")
        return
    if args.lane == "dkmeans20m":
        dkmeans_third_decade(args.out_dir.rstrip("/") + "_ann20m")
        return

    if not all(
        os.path.exists(os.path.join(args.out_dir, f"{t}.parquet"))
        for t in ("documents", "embeddings", "events")
    ):
        t0 = time.time()
        generate(args.out_dir)
        print(f"# generated 10x corpus in {time.time() - t0:.1f}s -> {args.out_dir}")

    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="stress_lane")
    reg = load_registry()
    result: dict = {
        "sf_equiv": 1.0,
        "docs": 50000,
        "vecs": 20000,
        "events": 1_000_000,
        "queries": {},
    }
    for name in (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "embedding_neardup_pairs",
        "dedup_exact",
        "dedup_simhash",
        "ann_topk_ivf",
        "ann_topk_lsh_multiprobe",
        "doc_repetition_ngrams",
        "vocab_top_terms",
        "docs_quality_filter",
        "eval_contamination",
        # round-5 session-3 additions — quadratic-risk and fan-out ops
        "semantic_dedup",
        "source_overlap",
        "winnowing_fingerprint",
        "doc_salient_terms",
        "knn_label_predict",
        "docs_mixture_sample",
        "pii_redact",
        "text_normalize",
        # round-5 session-4 additions — doc lifecycle + behavior ops
        # (events table is 10x users at constant per-user density)
        "docs_train_split",
        "docs_chunk_overlap",
        "dedup_incremental",
        "events_funnel",
        "user_retention_cohorts",
        "events_interarrival",
        "events_pivot_monthly",
        "events_json_stats",
        "events_value_zscore",
        "bpe_merge_pairs",
        # round-6: full BPE training loop (10 merge rounds, counts-only
        # driver collects) + the two document scorers
        "bpe_train_merges",
        "docs_quality_classifier",
        "doc_lm_predictability",
    ):
        t0 = time.time()
        n = reg[name].fn(spark, args.out_dir).count()
        result["queries"][name] = {
            "sec": round(time.time() - t0, 2),
            "rows": n,
        }
        drain_cleanups()  # release per-query persisted intermediates
        print(f"# {name}: {result['queries'][name]}", flush=True)
    result["candidate_volumes"] = candidate_volumes(spark, args.out_dir)
    result["cc_chain_100k"] = cc_chain_lane(spark)
    result["ann_recall_at_10"] = ann_recall(reg, spark, args.out_dir)
    result["ann_planted"] = ann_planted(reg, spark, args.out_dir)
    print(json.dumps(result))


def ann_recall(reg, spark, sf_dir: str) -> dict[str, float]:
    """recall@10 of the approximate ANN paths against the exact
    brute-force twin (per query, averaged). 50-row collects — the result
    sets, not the corpus."""
    truth: dict[int, set[int]] = {}
    for r in reg["ann_topk_bruteforce"].fn(spark, sf_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    out = {}
    for name in (
        "ann_topk_lsh",
        "ann_topk_lsh_multiprobe",
        "ann_topk_ivf",
        "ann_topk_ivf_trained",
    ):
        got: dict[int, set[int]] = {}
        for r in reg[name].fn(spark, sf_dir).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        out[name] = round(sum(recalls) / len(recalls), 3)
    return out


def ann_planted(reg, spark, out_dir: str) -> dict:
    """The production operating point: trained-centroid IVF recall@10 and
    scanned fraction on the 20k planted-neighborhood corpus
    (tools/planted.py — realistic embedding geometry; the isotropic 10x
    corpus caps ANY sublinear method's recall by construction). Also
    re-measures the hash-seed IVF on the same corpus so the
    trained-vs-seeded gap is attributable to the quantizer alone."""
    from example_beam_spark.operators.ivf import ivf_trained_frames
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.sources import load_table
    from tools.planted import planted_corpus

    planted_dir = os.path.join(out_dir, "planted")
    if not os.path.exists(os.path.join(planted_dir, "embeddings.parquet")):
        planted_corpus(planted_dir, n=20000, n_clusters=200)
    n = 20000

    truth: dict[int, set[int]] = {}
    for r in reg["ann_topk_bruteforce"].fn(spark, planted_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    out: dict = {}
    t0 = time.time()
    topk, cands = ivf_trained_frames(load_table(spark, planted_dir, "embeddings"))
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    out["ivf_trained"] = {
        "recall_at_10": round(sum(recalls) / len(recalls), 3),
        "scanned_frac": round(cands.count() / (N_QUERIES * (n - 1)), 4),
        "sec": round(time.time() - t0, 2),
    }

    for name in ("ann_topk_ivf", "ann_topk_lsh_multiprobe"):
        got = {}
        for r in reg[name].fn(spark, planted_dir).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
        out[name] = {"recall_at_10": round(sum(recalls) / len(recalls), 3)}
    return out




def cc_chain_lane(spark, n: int = 100_000) -> dict:
    """Scale evidence for the large-star/small-star CC engine: an
    n-node chain is the adversarial diameter case (propagation would
    need ~n driver rounds — NOT run here); star contraction must
    finish in O(log n) rounds. Labels spot-checked (all -> 0)."""
    import time as _t

    from pyspark.sql import functions as F

    from example_beam_spark.operators.dedup import connected_components
    t0 = _t.time()
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels, rounds = connected_components(pairs, impl="star")
    bad = labels.filter(F.col("label") != 0).count()
    return {
        "nodes": n,
        "rounds": rounds,
        "mislabeled": bad,
        "sec": round(_t.time() - t0, 2),
    }


if __name__ == "__main__":
    main()
