"""Pins for operators/structures.py — the persisted-physical-structure
family: PQ-compressed ANN (codes + ADC scan + exact re-rank), the
incremental MinHash index probe, and the bucketed co-located join.

Value correctness is carried by the registry oracle sweep
(test_registry_oracle runs every entry vs DuckDB); these tests pin the
PLAN SHAPES the operators exist for and the structural invariants the
oracles can't see (recall floors, code widths, exchange-free joins)."""

from __future__ import annotations

import os

import pytest

from example_beam_spark.registry import drain_cleanups, load_registry
from tests.conftest import SF_DIR

SF = SF_DIR


def _collect(q, spark, sf=SF):
    rows = q.fn(spark, sf).collect()
    drain_cleanups()
    return rows


# --------------------------------------------------------------------------
# PQ ANN
# --------------------------------------------------------------------------


def test_pq_codes_are_m_per_vector_and_within_codebook(spark):
    """Every corpus vector encodes to exactly PQ_M codes, each a valid
    codebook index — the compressed representation really is M small
    ints per vector."""
    from example_beam_spark.operators.structures import (
        PQ_K,
        PQ_M,
        _pq_codebook,
        _pq_codes,
        _pq_subs,
    )
    from example_beam_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    codes = _pq_codes(_pq_subs(emb), _pq_codebook(emb))
    stats = codes.agg(
        F.count("*").alias("rows"),
        F.min("code").alias("cmin"),
        F.max("code").alias("cmax"),
        F.countDistinct("vec_id").alias("vecs"),
    ).collect()[0]
    assert stats.rows == n * PQ_M
    assert stats.vecs == n
    assert 1 <= stats.cmin and stats.cmax <= PQ_K


def test_pq_rerank_recall_floor(spark):
    """The measured recall ladder holds its ordering: exact re-rank of
    the ADC shortlist recovers at least as many true neighbors as the
    ADC-only cut, and both clear a conservative floor (measured 0.22 →
    0.48 at sf0.01; floors set at half the measurement so fixture
    regeneration noise can't flake the pin)."""
    R = load_registry()
    exact = {}
    for r in _collect(R["ann_topk_bruteforce"], spark):
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    tot = sum(len(v) for v in exact.values())

    def recall(name):
        got = {}
        for r in _collect(R[name], spark):
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(exact[q] & got.get(q, set())) for q in exact) / tot

    r_adc = recall("ann_topk_pq_adc")
    r_rr = recall("ann_topk_pq_rerank")
    assert r_rr >= r_adc, (r_adc, r_rr)
    assert r_rr >= 0.2, r_rr


def test_pq_plan_broadcasts_codebook_and_lut(spark):
    """The PQ scan never shuffles the corpus against the codebook: the
    encode join and the ADC-table join are broadcasts, and the final
    per-query cut keeps the partial WindowGroupLimit pushdown."""
    q = load_registry()["ann_topk_pq_adc"]
    df = q.fn(spark, SF)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed[:2000]
    assert "WindowGroupLimit" in executed and "Partial" in executed, executed[:2000]


# --------------------------------------------------------------------------
# incremental MinHash
# --------------------------------------------------------------------------


def test_minhash_incremental_is_new_vs_seen_only(spark):
    """Every emitted pair crosses the batch boundary (new side is
    source==src13, seen side is not), rk=1 exists per new doc, and the
    pair set is exactly the batch-crossing subset of the full
    dedup_minhash_lsh pair set (same signatures, same verification —
    the delta operator finds precisely the full run's cross-boundary
    pairs, never more)."""
    from example_beam_spark.operators.corpus_ops import _BATCH_SOURCE
    from example_beam_spark.sources import load_table

    R = load_registry()
    rows = _collect(R["dedup_minhash_incremental"], spark)
    assert rows, "fixture has no cross-batch near-dup — canary for regeneration"
    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF, "documents").select("doc_id", "source").collect()
    }
    for r in rows:
        assert src[r.new_id] == _BATCH_SOURCE
        assert src[r.seen_id] != _BATCH_SOURCE
    best = {r.new_id for r in rows if r.rk == 1}
    assert best == {r.new_id for r in rows}

    full = _collect(R["dedup_minhash_lsh"], spark)
    crossing = {
        (a, b)
        for r in full
        for (a, b) in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a))
        if src[a] == _BATCH_SOURCE and src[b] != _BATCH_SOURCE
    }
    assert {(r.new_id, r.seen_id) for r in rows} == crossing


# --------------------------------------------------------------------------
# bucketed co-located join
# --------------------------------------------------------------------------


def test_bucketed_join_plan_has_no_exchange_below_join(spark):
    """With auto-broadcast disabled (the 100-TB regime where neither
    side fits), the orders⋈lineitem join over the bucketed layout is a
    SortMergeJoin whose BOTH inputs are `Bucketed: true` FileScans with
    no Exchange anywhere below the join — the exchange-free co-located
    join the layout exists for."""
    from example_beam_spark.operators.structures import bucketed_join

    old_a = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_b = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, SF)
        executed = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_a)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_b)
    assert "SortMergeJoin" in executed, executed[:2500]
    assert "Exchange" not in executed, executed[:2500]
    assert executed.count("Bucketed: true") == 2, executed[:2500]


def test_bucketed_layout_written_once_per_session(spark):
    """Rerunning the registered query reuses the already-written bucket
    tables (the layout is a persistent artifact, not a per-query temp)."""
    from example_beam_spark.operators.structures import _BUCKET_TABLES, _bucketed_tables

    a = _bucketed_tables(spark, SF)
    n_before = len(_BUCKET_TABLES)
    b = _bucketed_tables(spark, SF)
    assert a == b and len(_BUCKET_TABLES) == n_before


def test_pq_trained_recall_on_planted_corpus(spark, tmp_path):
    """The trained-codebook PQ variant must reach production recall on
    a corpus WITH neighborhood structure (the gaussian fixture caps any
    sublinear method by chance — see tools/planted.py): measured 1.0 at
    a 1% exact-rerank fraction on 20k vectors; floor at 0.9."""
    from tools.planted import planted_corpus

    d = planted_corpus(str(tmp_path / "pq_planted"), n=20000)
    R = load_registry()
    exact = {}
    for r in _collect(R["ann_topk_bruteforce"], spark, d):
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in _collect(R["ann_topk_pq_trained"], spark, d):
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    recall = sum(recalls) / len(recalls)
    print(f"planted PQ-trained recall@10={recall:.3f}")
    assert recall >= 0.9, (recall, recalls)


def test_pq_trained_deterministic(spark):
    """Same session, same input -> byte-identical result (fixed seed
    sample, deterministic Lloyd, deterministic tie-breaks in the scan)."""
    R = load_registry()
    a = sorted(map(tuple, _collect(R["ann_topk_pq_trained"], spark)))
    b = sorted(map(tuple, _collect(R["ann_topk_pq_trained"], spark)))
    assert a == b


def test_partitioned_scan_prunes_directories(spark):
    """The one-day query over the date-partitioned layout carries the
    date as a PartitionFilter (directory-level pruning) and the scan's
    file listing contains ONLY the selected day's partition."""
    from example_beam_spark.operators.structures import (
        _SCAN_DATE,
        partitioned_day_scan,
    )

    day = partitioned_day_scan(spark, SF)
    executed = day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in executed, executed[:2000]
    assert _SCAN_DATE in executed.split("PartitionFilters", 1)[1][:300], (
        executed[:2500]
    )
    # the pruned scan reads exactly the one day
    import datetime

    dts = {r.event_date for r in day.select("event_date").distinct().collect()}
    assert dts == {datetime.date(2024, 1, 15)}
    # and the files it actually opened all live under that one of the
    # 30 date directories
    import os

    from pyspark.sql import functions as F
    from example_beam_spark.operators.structures import _partitioned_events

    files = {
        r[0] for r in day.select(F.input_file_name()).distinct().collect()
    }
    assert files and all(f"event_date={_SCAN_DATE}" in f for f in files), files
    root = _partitioned_events(spark, SF)
    n_dirs = len([d for d in os.listdir(root) if d.startswith("event_date=")])
    assert n_dirs == 30


def _files_per_date(root):
    import os

    out = {}
    for d in os.listdir(root):
        if d.startswith("event_date="):
            out[d] = len(
                [f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
            )
    return out


def test_compaction_one_file_per_partition(spark):
    """At the default 128 MB target, every fixture date is far below one
    target file — the fragmented layout holds many files per date (one
    per writer task), the compacted one exactly 1 — and no date
    directory is lost."""
    from example_beam_spark.operators.structures import _compacted_events

    frag, comp = _compacted_events(spark, SF)
    f, c = _files_per_date(frag), _files_per_date(comp)
    assert set(f) == set(c) and len(f) == 30
    assert max(f.values()) > 1, f  # the problem exists
    assert set(c.values()) == {1}, c  # the pass solved it


def test_compaction_is_size_targeted(spark):
    """Round-11 verdict #3: compaction must NOT funnel a big date
    through one writer — files per date = ceil(date_bytes / target).
    With a target forcing multiple files per fixture date, the ceil
    sizing is pinned exactly and the rewrite is still lossless."""
    from example_beam_spark.operators.structures import (
        _compacted_events,
        _dir_parquet_bytes,
    )

    # pick a target ~1/3 of the largest fragmented date so ceil > 1
    frag_ref, _ = _compacted_events(spark, SF)
    biggest = max(
        _dir_parquet_bytes(os.path.join(frag_ref, d))
        for d in os.listdir(frag_ref)
        if d.startswith("event_date=")
    )
    target = max(1, biggest // 3)
    frag, comp = _compacted_events(spark, SF, target_bytes=target)
    c = _files_per_date(comp)
    expected = {
        d: max(1, -(-_dir_parquet_bytes(os.path.join(frag, d)) // target))
        for d in c
    }
    assert c == expected, (c, expected)
    assert max(c.values()) > 1, c  # a date really used >1 writer task
    n_frag = spark.read.parquet(frag).count()
    n_comp = spark.read.parquet(comp).count()
    assert n_frag == n_comp


def test_pca_projection_diagonalizes_covariance(spark):
    """Algebraic pins for embedding_pca_project: the projected data's
    covariance is DIAGONAL (off-diagonal ~0) with entries equal to the
    top eigenvalues in descending order, and variance explained is a
    sane fraction of the trace; two runs are byte-identical (fixed sign
    convention, deterministic eigh on the same bounded matrix)."""
    import numpy as np

    from example_beam_spark.operators.structures import PCA_COMPONENTS

    R = load_registry()
    rows = _collect(R["embedding_pca_project"], spark)
    Y = np.stack([np.array(r.proj) for r in sorted(rows, key=lambda r: r.vec_id)])
    assert Y.shape[1] == PCA_COMPONENTS
    Yc = Y - Y.mean(axis=0)
    C = (Yc.T @ Yc) / len(Y)
    diag = np.diag(C).copy()
    off = np.abs(C - np.diag(diag)).max()
    assert off < 1e-6 * diag.max(), off
    assert all(diag[i] >= diag[i + 1] - 1e-12 for i in range(len(diag) - 1)), diag
    # variance explained: top-8 of 64 isotropic-ish dims — positive,
    # below 1
    from example_beam_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    X = np.stack(
        [np.array(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    Xc = X - X.mean(axis=0)
    trace = ((Xc**2).sum(axis=0) / len(X)).sum()
    ve = diag.sum() / trace
    assert 0.05 < ve < 1.0, ve

    rows2 = _collect(R["embedding_pca_project"], spark)
    a = sorted((r.vec_id, tuple(r.proj)) for r in rows)
    b = sorted((r.vec_id, tuple(r.proj)) for r in rows2)
    assert a == b


def test_stream_partitioned_sink_exactly_once_across_restart(spark, tmp_path):
    """The native streaming file sink's _spark_metadata commit log gives
    exactly-once across drain restarts: drain chunk A, then drop chunk B
    into the source and drain AGAIN from the same checkpoint — the read-
    back (which consults the log) holds exactly A∪B, no duplicates, and
    the layout is date-partitioned."""
    import os

    from pyspark.sql import functions as F
    from example_beam_spark.sources import load_table
    from example_beam_spark.sources.parquet import events_read_schema

    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    a = ev.filter(F.dayofmonth("ts") <= 15)
    b = ev.filter(F.dayofmonth("ts") > 15)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    a.drop("event_date").write.parquet(src)

    schema, shim = events_read_schema(spark, SF)
    assert not shim  # micros fixture; the shim branch is covered elsewhere

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("event_date", F.col("ts").cast("date"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .partitionBy("event_date")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n_a = a.count()
    assert spark.read.parquet(out).count() == n_a
    # incremental arrival + restart from the same checkpoint
    b.drop("event_date").write.mode("append").parquet(src)
    drain()
    back = spark.read.parquet(out)
    assert back.count() == n_a + b.count()
    assert back.groupBy("event_id").count().filter("count > 1").count() == 0
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))
    dates = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dates) == 30


def test_ivfpq_trained_recall_on_planted_corpus(spark, tmp_path):
    """The IVFADC composition (coarse cells + residual PQ + exact
    rerank) must hold production recall where there is neighborhood
    structure: measured 1.0 on planted 20k; floor 0.9 (the gate the
    trained-IVF and trained-PQ rungs individually clear — composing
    them must not lose it)."""
    from tools.planted import planted_corpus

    d = planted_corpus(str(tmp_path / "ivfpq_planted"), n=20000)
    R = load_registry()
    exact = {}
    for r in _collect(R["ann_topk_bruteforce"], spark, d):
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in _collect(R["ann_topk_ivfpq_trained"], spark, d):
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    recall = sum(recalls) / len(recalls)
    print(f"planted IVFPQ recall@10={recall:.3f}")
    assert recall >= 0.9, (recall, recalls)


def test_layout_cache_key_fingerprints_source(spark, tmp_path):
    """An in-place regeneration of the source table (same path, new
    bytes/mtime) must change the layout cache key, so a long-lived
    session can never serve a layout built from stale data (the
    neardup-stream staging discipline applied to every persisted
    layout here)."""
    import os
    import shutil

    from example_beam_spark.operators.structures import _layout_key

    src = os.path.join(SF, "events.parquet")
    dst = str(tmp_path / "events.parquet")
    shutil.copyfile(src, dst)
    k1 = _layout_key(spark, str(tmp_path), "events")
    os.utime(dst, ns=(os.stat(dst).st_atime_ns, os.stat(dst).st_mtime_ns + 1))
    k2 = _layout_key(spark, str(tmp_path), "events")
    assert k1 != k2


def test_range_search_ivf_equals_exact_twin_and_prunes(spark, tmp_path):
    """Triangle-bounded pruning is SOUND at every threshold (output
    identical to the exact full scan — same rows, same cosines) and its
    depth ADAPTS to threshold selectivity: at the family's loose
    t=0.2 any sound method must touch nearly all pairs (matches span
    most cells — the physics, recorded, not hidden), while at a
    selective t=0.7 (in-cluster only on the planted corpus) the bounds
    prune the exact-dot work to a small fraction."""
    from example_beam_spark.operators.similarity import N_QUERIES
    from example_beam_spark.operators.structures import range_search_ivf_frames
    from example_beam_spark.operators.trainprep import RANGE_THRESHOLD
    from example_beam_spark.sources import load_table
    from tools.planted import planted_corpus

    n = 20000
    d = planted_corpus(str(tmp_path / "range_planted"), n=n)
    R = load_registry()
    exact_all = [
        (r.query_id, r.neighbor_id, round(r.cosine, 9))
        for r in _collect(R["ann_range_search"], spark, d)
    ]
    emb = load_table(spark, d, "embeddings")
    scans = {}
    for t in (RANGE_THRESHOLD, 0.5, 0.7):
        results, cands = range_search_ivf_frames(emb, threshold=t)
        got = sorted(
            (r.query_id, r.neighbor_id, round(r.cosine, 9))
            for r in results.collect()
        )
        scans[t] = cands.count() / (N_QUERIES * (n - 1))
        drain_cleanups()
        # matches at t >= RANGE_THRESHOLD are exactly the exact twin's
        # rows re-filtered — soundness at every rung
        assert got == sorted(p for p in exact_all if p[2] >= t), t
    print(f"range-ivf planted scanned by threshold: {scans}")
    # measured 0.94 / 0.58 / 0.26: the 0.26 floor at t=0.7 is coarse
    # capacity (k=√n=142 cells < 200 planted clusters, so merged cells
    # inflate member angles) — pinned with slack, monotone in t
    assert scans[0.7] <= 0.35, scans  # selective threshold prunes deep
    assert scans[0.7] < scans[0.5] < scans[RANGE_THRESHOLD] <= 1.0, scans


def test_ivfpq_cellpart_prunes_directories_and_recall(spark, tmp_path):
    """The persisted cell-partitioned index turns nprobe pruning into
    I/O pruning: the codes read carries `cell IN (...)` as a
    PartitionFilter, the files actually opened live ONLY under probed
    cell directories (opened fraction ≈ probed/k), and recall on the
    planted corpus holds the 0.9 floor the in-memory IVFADC gates."""
    import re

    from pyspark.sql import functions as F

    from example_beam_spark.operators.structures import (
        _ivfpq_cellpart_index,
        ivfpq_cellpart_scan,
    )
    from tools.planted import planted_corpus

    d = planted_corpus(str(tmp_path / "cellpart_planted"), n=20000)
    R = load_registry()
    exact = {}
    for r in _collect(R["ann_topk_bruteforce"], spark, d):
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in _collect(R["ann_topk_ivfpq_cellpart"], spark, d):
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
    recall = sum(recalls) / len(recalls)

    shortlist, pruned, n_probed, k = ivfpq_cellpart_scan(spark, d)
    executed = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in executed, executed[:2000]
    assert "cell" in executed.split("PartitionFilters", 1)[1][:300], executed[:2500]

    files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    opened_cells = {int(re.search(r"cell=(\d+)", f).group(1)) for f in files}
    assert len(opened_cells) <= n_probed
    opened_frac = len(opened_cells) / k
    print(
        f"cellpart planted: recall@10={recall:.3f} "
        f"opened {len(opened_cells)}/{k} cells ({opened_frac:.3f})"
    )
    assert recall >= 0.9, (recall, recalls)
    # probed fraction stays a small multiple of nprobe/k (padding may
    # widen it on tiny corpora; at 20k it must stay well under half)
    assert opened_frac <= 0.5, (len(opened_cells), k)


def test_zorder_layout_makes_user_stats_skippable(spark):
    """The Z-ORDER pin, from the parquet footers themselves: under the
    registered 1/8-user-slice predicate, the fraction of files whose
    user_id [min,max] range intersects the slice is a FRACTION of the
    ts-sorted baseline's (which is 1.0 — every time-sorted file spans
    the full user domain). Values are proven identical by the oracle;
    this pins the skipping precondition the layout exists for."""
    import pyarrow.parquet as pq

    from example_beam_spark.operators.structures import (
        _zorder_layout,
        _zorder_ts_baseline,
        zorder_user_slice,
    )

    zdir = _zorder_layout(spark, SF)
    tdir = _zorder_ts_baseline(spark, SF)  # contrast layout: built HERE,
    # not by the registered entry (round-12 verdict note #3)
    _, hi = zorder_user_slice(spark, SF)

    def must_read_fraction(root):
        touch, total = 0, 0
        for f in sorted(os.listdir(root)):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            lo = min(
                md.row_group(i).column(_user_col(md)).statistics.min
                for i in range(md.num_row_groups)
            )
            total += 1
            if lo <= hi:  # file intersects [0, hi] iff its min does
                touch += 1
        return touch, total

    def _user_col(md):
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        return names.index("user_id")

    z_touch, z_total = must_read_fraction(zdir)
    t_touch, t_total = must_read_fraction(tdir)
    print(
        f"zorder must-read {z_touch}/{z_total}, "
        f"ts-baseline {t_touch}/{t_total} at user_id <= {hi}"
    )
    assert z_total == t_total == 16
    assert t_touch == t_total  # time-sorted files all span the user domain
    assert z_touch <= z_total // 2, (z_touch, z_total)
