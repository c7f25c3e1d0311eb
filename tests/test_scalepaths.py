"""Gates for the round-13 scale-path entries (operators/scalepaths.py):
the IVF,PQ+SQ8 composition's recall + compressed-rerank byte claim, and
the fixture-shape contract of the rows-only entry."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

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


def test_filtered_ivf_soundness_and_recall_on_planted(spark, tmp_path):
    """Filtered ANN with the trained index: on the planted corpus with
    an even-id-only allow set (selectivity 0.5), every returned
    neighbor satisfies the predicate (pre-filter soundness) and
    recall@10 vs the exact FILTERED truth stays production-grade —
    the filter must not degrade the probe, only restrict candidates."""
    import numpy as np

    from example_beam_spark.operators.ivf import ivf_trained_frames
    from example_beam_spark.operators.similarity import N_QUERIES, TOP_K
    from example_beam_spark.sources import load_table

    N = 4000
    d = planted_corpus(str(tmp_path / "filt_planted"), n=N, n_clusters=100)
    emb = load_table(spark, d, "embeddings")
    allowed = emb.filter((F.col("vec_id") % 2) == 0).select(
        F.col("vec_id").alias("neighbor_id")
    )

    # exact filtered truth, driver-side (4000x64 floats is trivial)
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    truth: dict[int, set[int]] = {}
    for q in range(N_QUERIES):
        cos = X @ X[q]
        mask = (ids % 2 == 0) & (ids != q)
        cand = np.flatnonzero(mask)
        top = cand[np.argsort(-cos[cand])][:TOP_K]
        truth[q] = set(int(ids[i]) for i in top)

    topk, cands = ivf_trained_frames(emb, members_filter=allowed)
    got: dict[int, set[int]] = {}
    for r in topk.collect():
        assert r.neighbor_id % 2 == 0, r  # soundness
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    n_cands = cands.count()
    drain_cleanups()
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    recall = sum(recalls) / len(recalls)
    print(f"filtered-ivf planted recall@10={recall:.3f} cands={n_cands}")
    assert recall >= 0.8, (recall, recalls)
    # pre-filter cuts candidate work ~with selectivity: at 0.5 the
    # scan must be well under the unfiltered probe volume
    assert n_cands <= 0.05 * N_QUERIES * (N - 1) * 0.75, n_cands


def test_filtered_exact_plan_pushes_lang_filter(spark):
    """The predicate reaches the documents parquet scan (PushedFilters
    on lang) and only doc_id is read from it (ReadSchema pruning) —
    the 100-TB claim in the section comment."""
    import re

    from example_beam_spark.plans import explain_formatted

    reg = load_registry()
    df = reg["ann_topk_filtered"].fn(spark, SF)
    plan = explain_formatted(df)
    doc_scans = [
        b for b in plan.split("\n\n") if "documents" in b and "Scan parquet" in b
    ]
    assert doc_scans, plan[:3000]
    blk = doc_scans[0]
    m = re.search(r"PushedFilters: \[([^\]]*)\]", blk)
    assert m and "lang" in m.group(1), blk
    rs = re.search(r"ReadSchema: [^\n]*", blk)
    assert rs and "doc_id" in rs.group(0) and "text" not in rs.group(0), blk


def test_ivfpq_append_equals_rebuild(spark, tmp_path):
    """The frozen-quantizer append contract: growing the index by
    encoding the delta with the base-trained (C, books) and appending
    its files must produce EXACTLY the topk frame of a one-pass rebuild
    with the same quantizers — per-row-deterministic encoding makes
    add-without-retrain lossless. Also pins the physical claim: the
    base's parquet files are untouched by the append (same names and
    sizes before/after)."""
    import tempfile

    from example_beam_spark.operators.scalepaths import _ivfpq_appended_index
    from example_beam_spark.operators.structures import (
        exact_rerank_topk,
        ivfpq_scan_codes,
        pq_encode_frame,
    )
    from example_beam_spark.sources import load_table

    d = planted_corpus(str(tmp_path / "append_planted"), n=4000, n_clusters=100)
    codes_dir, C, books, n_total = _ivfpq_appended_index(spark, d)
    emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")

    # rebuild twin: one encode pass over the FULL corpus, same quantizers
    rebuild_dir = tempfile.mkdtemp(prefix="ebs_ivfpq_rebuild_")
    (
        pq_encode_frame(emb, C, books)
        .repartition(F.col("cell"))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(rebuild_dir)
    )

    def topk_rows(cd):
        shortlist, _, _, _ = ivfpq_scan_codes(spark, emb, cd, C, books, n_total)
        return sorted(
            (r.query_id, r.rk, r.neighbor_id, r.cosine)
            for r in exact_rerank_topk(emb, shortlist).collect()
        )

    appended, rebuilt = topk_rows(codes_dir), topk_rows(rebuild_dir)
    drain_cleanups()
    assert appended == rebuilt
    assert len(appended) >= 5  # all five queries produced neighbors


def test_ivfpq_append_leaves_base_files_untouched(spark, tmp_path):
    """Ingestion cost is linear in the delta: the append writes NEW
    files into the cell directories and never rewrites standing ones."""
    import tempfile

    from example_beam_spark.operators.scalepaths import _append_split
    from example_beam_spark.operators.structures import pq_encode_frame
    from example_beam_spark.operators.ivf import train_coarse_centers
    from example_beam_spark.operators.structures import _train_pq_books
    from example_beam_spark.sources import load_table

    import numpy as np

    d = planted_corpus(str(tmp_path / "append_files"), n=2000, n_clusters=50)
    emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
    base, delta = _append_split(emb)
    C = train_coarse_centers(base, 16, 100_000)
    pdf = base.limit(512).toPandas()
    Xs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Xs /= np.linalg.norm(Xs, axis=1, keepdims=True)
    books = _train_pq_books(Xs - C[(Xs @ C.T).argmax(axis=1)])

    out = tempfile.mkdtemp(prefix="ebs_append_files_")
    enc = lambda df: pq_encode_frame(df, C, books).repartition(F.col("cell"))  # noqa: E731

    enc(base).write.partitionBy("cell").mode("overwrite").parquet(out)
    before = {
        os.path.join(dp, f): os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    enc(delta).write.partitionBy("cell").mode("append").parquet(out)
    after = {
        os.path.join(dp, f): os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    assert set(before) <= set(after)  # nothing deleted
    for p, sz in before.items():
        assert after[p] == sz, p  # nothing rewritten
    assert len(after) > len(before)  # the delta landed as new files


def test_ivfpq_append_stream_equals_batch_append(spark, tmp_path):
    """Streamed ingestion loses nothing: the stream-ingested index
    (base dir + per-micro-batch cell-partitioned dirs, frozen-quantizer
    encode inside the streaming graph) yields EXACTLY the batch-append
    index's topk frame — and the ingestion really was multi-batch
    (>= 2 batch directories), so the equality isn't a single-batch
    degenerate."""
    from example_beam_spark.operators.scalepaths import (
        _ivfpq_appended_index,
        _ivfpq_streamed_index,
    )
    from example_beam_spark.operators.structures import (
        exact_rerank_topk,
        ivfpq_scan_codes,
    )
    from example_beam_spark.sources import load_table

    d = planted_corpus(str(tmp_path / "sappend_planted"), n=4000, n_clusters=100)
    emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")

    def topk_rows(roots, C, books, n_total):
        shortlist, _, _, _ = ivfpq_scan_codes(spark, emb, roots, C, books, n_total)
        return sorted(
            (r.query_id, r.rk, r.neighbor_id, r.cosine)
            for r in exact_rerank_topk(emb, shortlist).collect()
        )

    roots, C, books, n_total = _ivfpq_streamed_index(spark, d)
    assert len(roots) >= 3, roots  # base + >= 2 ingestion batches
    streamed = topk_rows(roots, C, books, n_total)

    bdir, C2, books2, n2 = _ivfpq_appended_index(spark, d)
    batch = topk_rows(bdir, C2, books2, n2)
    drain_cleanups()
    assert streamed == batch
    assert len(streamed) >= 5
