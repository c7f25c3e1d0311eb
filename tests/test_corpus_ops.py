"""Corpus lifecycle operators: the paths the driver fixture cannot
exercise (it contains no exact duplicates) plus split-invariant and
plan-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_beam_spark.operators.corpus_ops import dedup_incremental_frames
from example_beam_spark.plans import num_exchanges
from example_beam_spark.registry import load_registry

SF = "/root/testdata/sf0.01"


def test_incremental_dedup_drops_seen_and_batch_dupes(spark):
    """Constructed duplicates: batch-internal copies collapse to the
    lowest doc_id, and content already in the seen corpus is dropped."""
    batch = spark.createDataFrame(
        [
            (1, "alpha"),  # duplicated within the batch (with 3)
            (3, "alpha"),
            (2, "beta"),  # already seen → dropped
            (4, "gamma"),  # genuinely new
        ],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame(
        [(100, "beta"), (101, "delta")], "doc_id long, text string"
    )
    out = dedup_incremental_frames(batch, seen)
    rows = {r["doc_id"]: r["n_batch_copies"] for r in out.collect()}
    assert rows == {1: 2, 4: 1}  # alpha kept once (doc 1, 2 copies); beta gone


def test_incremental_dedup_empty_seen_passes_batch_through(spark):
    batch = spark.createDataFrame([(7, "x"), (8, "y")], "doc_id long, text string")
    seen = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_incremental_frames(batch, seen).count() == 2


def test_train_split_is_exhaustive_and_disjoint(spark):
    """Every doc lands in exactly one split (the three ranges cover
    [0,100) exclusively), and the split column never nulls."""
    q = load_registry()["docs_train_split"]
    df = q.fn(spark, SF)
    n_docs = df.count()
    assert df.filter(F.col("split").isNull()).count() == 0
    assert (
        df.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )
    per_split = {
        r["split"]: r["count"] for r in df.groupBy("split").count().collect()
    }
    assert sum(per_split.values()) == n_docs
    assert set(per_split) <= {"train", "valid", "test"}
    assert per_split["train"] > per_split.get("valid", 0)


def test_chunk_overlap_geometry_invariants(spark):
    """Chunks tile each doc with no redundant windows: first starts at
    0, strides are exactly S, every non-final chunk is a full W tokens,
    every non-first chunk reaches more than W−S new tokens (a chunk
    that didn't would be a strict subset of its predecessor), and
    exactly one is_last per doc."""
    q = load_registry()["docs_chunk_overlap"]
    df = q.fn(spark, SF).cache()
    bad_stride = df.filter(F.col("start_tok") != F.col("chunk_id") * 24)
    assert bad_stride.count() == 0
    assert df.filter(F.col("end_tok") < F.col("start_tok")).count() == 0
    assert df.filter(F.col("n_chunk_tokens") > 32).count() == 0
    # non-final chunks are full windows; no chunk is subset-redundant
    assert df.filter(~F.col("is_last") & (F.col("n_chunk_tokens") != 32)).count() == 0
    assert df.filter((F.col("chunk_id") > 0) & (F.col("n_chunk_tokens") <= 8)).count() == 0
    per_doc_last = df.groupBy("doc_id").agg(
        F.sum(F.col("is_last").cast("int")).alias("n_last"),
        F.min("start_tok").alias("first_start"),
    )
    assert per_doc_last.filter(F.col("n_last") != 1).count() == 0
    assert per_doc_last.filter(F.col("first_start") != 0).count() == 0
    df.unpersist()


def test_chunk_overlap_no_shuffle(spark):
    """Chunk planning is a narrow map + explode: zero exchanges."""
    q = load_registry()["docs_chunk_overlap"]
    assert num_exchanges(q.fn(spark, SF)) == 0


def test_train_split_no_shuffle(spark):
    """Split assignment is a pure scan expression: zero exchanges."""
    q = load_registry()["docs_train_split"]
    assert num_exchanges(q.fn(spark, SF)) == 0


def test_bpe_train_greedy_merge_semantics(spark):
    """Pins the two behaviors the sf fixtures cannot isolate:
    (1) greedy left-to-right single-pass application — 'a a a' with
    merge (a,a) yields [aa, a], never [a, aa] or a double merge;
    (2) cascading vocabulary growth — a token minted in round 1
    participates in round 2's winning pair."""
    from example_beam_spark.operators.corpus_ops import bpe_train_frames

    docs = spark.createDataFrame(
        # 'x x' dominates round 1 (4 pairs, one per doc plus the runs);
        # round 2 must then see 'xx y' pairs built from the NEW token.
        [
            (1, "x x y"),
            (2, "x x y"),
            (3, "x x y"),
            (4, "x x x"),  # run of three: greedy → [xx, x], ONE pair consumed
        ],
        "doc_id long, text string",
    )
    out = {r["step"]: (r["a"], r["b"], r["n_pair"]) for r in
           bpe_train_frames(docs, 2).collect()}
    # round 1: (x,x) appears in docs 1-3 once each and TWICE in doc 4
    # (x·x at positions 1-2 and 2-3) = 5 — more than (x,y)'s 3
    assert out[1] == ("x", "x", 5)
    # round 2: doc 4 became [xx, x] (greedy consumed ONE pair, leaving
    # ('xx','x')); docs 1-3 became [xx, y] → ('xx','y') wins with 3
    assert out[2] == ("xx", "y", 3)


def test_bpe_train_empty_corpus_stops_early(spark):
    from example_beam_spark.operators.corpus_ops import bpe_train_frames

    docs = spark.createDataFrame([(1, ""), (2, "solo")], "doc_id long, text string")
    assert bpe_train_frames(docs, 5).count() == 0  # no adjacent pairs anywhere
