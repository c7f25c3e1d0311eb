"""Corpus lifecycle operators: deterministic dataset splits, overlapping
context-window chunk planning, and incremental (new-batch-vs-seen)
dedup — the three steps that turn a cleaned corpus into training input
and keep it deduplicated as new crawls arrive.

These complete the sampling/packing family in ``textops.py``
(rate → ``docs_sample_stratified``, temperature → ``docs_mixture_sample``,
exact-k → ``docs_sample_fixed_k``, packing → ``docs_pack_sequences``)
with the remaining lifecycle moves: hold-out splitting, striding, and
delta dedup.

100-TB design notes
-------------------
- ``docs_train_split``: membership is a pure function of the salted
  doc_id hash (same 28-bit md5-prefix machinery as
  ``docs_sample_stratified``) — zero shuffle, composes with predicate
  pushdown, and the three-way partition is exhaustive and disjoint BY
  CONSTRUCTION (one slot, three exclusive ranges), so train/valid/test
  can be materialized as three filtered scans of the same table with no
  coordination.
- ``docs_chunk_overlap``: chunk geometry (start/end token offsets for a
  W-token window at stride S) is computed with ``sequence`` + explode —
  the fan-out is planned BEFORE any per-chunk work, so downstream
  tokenization parallelizes over chunks, not documents (same posture as
  ``multimodal_frame_sample``). Narrow map, no shuffle.
- ``dedup_incremental``: the delta pattern — hash-collapse the new
  batch internally (partial+final agg), then LEFT ANTI join against the
  seen-corpus hash set. At scale the seen side is a compact
  hash-per-doc index, orders of magnitude smaller than the corpus;
  Spark's runtime bloom-filter pruning (pinned by
  tests/test_plans.py's bloom test) discards most non-matching batch
  rows before the shuffle, and a broadcast anti-join applies when the
  delta window's seen set fits. Matches-found semantics are pinned by a
  constructed-duplicate unit test (the driver fixture has no exact
  duplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from example_beam_spark.operators.textops import _BPE_PATTERN
from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# docs_train_split — deterministic 98/1/1 train/valid/test hash split
# --------------------------------------------------------------------------

_SPLIT_MOD = 100
_TRAIN_LT = 98  # slots [0,98) → train
_VALID_LT = 99  # slot 98 → valid, slot 99 → test

_SPLIT_ORACLE = f"""
    WITH tagged AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))
                    AS BIGINT) % {_SPLIT_MOD} AS slot
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN slot < {_TRAIN_LT} THEN 'train'
                WHEN slot < {_VALID_LT} THEN 'valid'
                ELSE 'test' END AS split
    FROM tagged
"""


@register("docs_train_split", oracle=_SPLIT_ORACLE)
def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/valid/test assignment: 28 salted md5
    bits of the doc_id, one slot in [0,100), three exclusive ranges —
    exhaustive and disjoint by construction, stable across reruns,
    engines, and cluster topologies (no RNG, no seed coordination).

    The assignment is a pure scan expression: materializing a split is
    a filtered scan (`WHERE split = 'train'`), so hold-out membership
    survives repartitioning and composes with every downstream
    operator. Salting the hash ('split:' prefix) keeps this split
    independent of the sampling operators' hashes."""
    docs = load_table(spark, sf_dir, "documents")
    slot = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 7
            ),
            16,
            10,
        ).cast("long")
        % _SPLIT_MOD
    )
    split = (
        F.when(slot < _TRAIN_LT, "train")
        .when(slot < _VALID_LT, "valid")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", split.alias("split"))


# --------------------------------------------------------------------------
# docs_chunk_overlap — overlapping W-token context windows at stride S
# --------------------------------------------------------------------------

_CHUNK_W = 32  # window: tokens per chunk
_CHUNK_S = 24  # stride: 8-token overlap between consecutive chunks

_CHUNK_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{{bpe}}')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(s // {_CHUNK_S} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS start_tok,
           CAST(LEAST(s + {_CHUNK_W}, n_tokens) AS BIGINT) AS end_tok,
           CAST(LEAST(s + {_CHUNK_W}, n_tokens) - s AS BIGINT) AS n_chunk_tokens,
           LEAST(s + {_CHUNK_W}, n_tokens) = n_tokens AS is_last
    FROM toks
    CROSS JOIN UNNEST(generate_series(
        0, GREATEST(n_tokens - {_CHUNK_W - _CHUNK_S} - 1, 0), {_CHUNK_S})) AS u(s)
    WHERE n_tokens >= 1
"""


@register("docs_chunk_overlap", oracle=_CHUNK_ORACLE.format(bpe=_BPE_PATTERN))
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunk plan: one row per (doc, chunk)
    with token-offset geometry — a 32-token window every 24 tokens
    (8-token overlap so no boundary context is lost), the striding step
    between cleaning and tokenization in an LLM pipeline.

    Token counts reuse the BPE pre-tokenizer regex from
    ``token_count_bpe`` so budgets agree across the engine. The
    ``sequence`` fan-out is guarded for the degenerate empty-text case
    (n_tokens = 0 → no chunks) the same way as
    ``multimodal_audio_segments``; chunk_id = start // S, and the
    geometry is pure per-row arithmetic — narrow map, zero shuffles,
    fan-out planned before any per-chunk work.

    A start is emitted only while its window reaches NEW tokens
    (start < n_tokens − (W−S), i.e. strictly past the previous chunk's
    clamped end) — without that cap, any doc with n_tokens mod S in
    [1, W−S] would emit a final chunk that is a strict subset of its
    predecessor, silently duplicating ~10% of tail windows into a
    training pipeline whose whole point is dedup. Consequently every
    non-final chunk is a full W tokens, the final chunk has more than
    W−S, and is_last ≡ (end_tok = n_tokens) is unique per doc
    (pinned by tests/test_corpus_ops.py)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    ).cast("long")
    last_new_start = F.greatest(
        n_tokens - (_CHUNK_W - _CHUNK_S) - 1, F.lit(0).cast("long")
    )
    starts = F.when(
        n_tokens >= 1,
        F.sequence(F.lit(0).cast("long"), last_new_start, F.lit(_CHUNK_S)),
    ).otherwise(F.array().cast("array<bigint>"))
    exploded = docs.select(
        "doc_id", n_tokens.alias("n_tokens"), F.explode(starts).alias("s")
    )
    end_tok = F.least(F.col("s") + _CHUNK_W, F.col("n_tokens"))
    return exploded.select(
        "doc_id",
        F.expr(f"s div {_CHUNK_S}").cast("long").alias("chunk_id"),
        F.col("s").cast("long").alias("start_tok"),
        end_tok.cast("long").alias("end_tok"),
        (end_tok - F.col("s")).cast("long").alias("n_chunk_tokens"),
        (end_tok == F.col("n_tokens")).alias("is_last"),
    )


# --------------------------------------------------------------------------
# dedup_incremental — new-batch exact dedup against the seen corpus
# --------------------------------------------------------------------------

_BATCH_SOURCE = "src13"  # "today's crawl"; every other source is "seen"

_INCR_ORACLE = f"""
    WITH batch AS (
        SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_batch_copies
        FROM documents WHERE source = '{_BATCH_SOURCE}'
        GROUP BY md5(text)
    ),
    seen AS (
        SELECT DISTINCT md5(text) AS content_hash
        FROM documents WHERE source <> '{_BATCH_SOURCE}'
    )
    SELECT b.doc_id, b.content_hash, b.n_batch_copies
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.content_hash = b.content_hash)
"""


@register("dedup_incremental", oracle=_INCR_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: collapse the new batch (source =
    'src13') to one row per content hash (lowest doc_id canonical, copy
    count retained), then LEFT ANTI join against the seen corpus's
    distinct hash set — only genuinely new content survives.

    This is ``dedup_exact``'s delta form: instead of re-deduping the
    whole corpus per crawl, each batch compares against the persisted
    hash index. The driver fixture contains no exact duplicates, so at
    fixture scale everything passes through; the match-and-drop path is
    pinned by tests/test_corpus_ops.py with constructed duplicates.

    Implementation: ``dedup_incremental_frames`` holds the logic over
    arbitrary (batch, seen) frames; this registry entry binds it to the
    source split."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("source") == _BATCH_SOURCE)
    seen = docs.filter(F.col("source") != _BATCH_SOURCE)
    return dedup_incremental_frames(batch, seen)


def dedup_incremental_frames(batch: DataFrame, seen: DataFrame) -> DataFrame:
    """Core delta-dedup: rows of ``batch`` whose md5(text) does not
    occur in ``seen``, batch-internally collapsed first. Both inputs
    need (doc_id, text) columns."""
    batch_hashed = (
        batch.select(F.md5(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("long").alias("n_batch_copies"),
        )
    )
    seen_hashes = seen.select(F.md5(F.col("text")).alias("content_hash")).distinct()
    return batch_hashed.join(seen_hashes, "content_hash", "left_anti").select(
        "doc_id", "content_hash", "n_batch_copies"
    )


# --------------------------------------------------------------------------
# bpe_merge_pairs — the core BPE-training step: adjacent-pair counting
# --------------------------------------------------------------------------

_BPE_TOPK = 50

# adjacent-pair fan-out over a token array column `t` (0-based Spark
# indexing against the oracles' 1-based DuckDB t[i], t[i+1] — both
# enumerate the same n−1 pairs); the size guard avoids Spark's
# sequence(1, 0) counting DOWN on <2-token docs
_PAIR_EXPR = (
    "CASE WHEN size(t) >= 2 THEN "
    "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b)) "
    "ELSE array() END"
)

_MERGE_ORACLE = f"""
    WITH toks AS (
        SELECT regexp_extract_all(text, '{{bpe}}') AS t FROM documents
    ),
    pairs AS (
        SELECT t[i] AS a, t[i + 1] AS b
        FROM toks CROSS JOIN UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    )
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM pairs GROUP BY a, b
    ORDER BY n_pair DESC, a, b LIMIT {_BPE_TOPK}
"""


@register("bpe_merge_pairs", oracle=_MERGE_ORACLE.format(bpe=_BPE_PATTERN))
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer TRAINING at corpus scale: count
    adjacent symbol pairs (over the same pre-tokenizer vocabulary as
    ``token_count_bpe``) and rank the top merge candidates — each BPE
    round merges the most frequent pair, so this query IS one training
    round's work, distributed.

    Parity note: Spark SQL array indexing is 0-based while DuckDB's is
    1-based; the lambda uses t[i-1], t[i] against the oracle's t[i],
    t[i+1] so both enumerate the same n−1 adjacent pairs. The pair
    fan-out is guarded (docs with <2 tokens emit nothing — Spark's
    ``sequence(1, 0)`` would otherwise count DOWN by its default -1
    step rather than return empty like generate_series).

    100-TB design: explode → one partial+final count aggregate; the
    top-k is TakeOrderedAndProject (per-partition partial top-k, no
    global sort). Ties break deterministically on (a, b)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0).alias("t")
    )
    pairs = toks.select(F.explode(F.expr(_PAIR_EXPR)).alias("p")).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .orderBy(F.desc("n_pair"), "a", "b")
        .limit(_BPE_TOPK)
    )


# --------------------------------------------------------------------------
# bpe_train_merges — the FULL BPE training loop (merge → re-segment →
# recount), not just one inner-loop iteration
# --------------------------------------------------------------------------

_TRAIN_ROUNDS = 10

# Token sequences are carried as a single wrapped string: every token is
# single-space-wrapped, so adjacent tokens are separated by a DOUBLE
# space — ' t1  t2  ...  tn ' (empty docs → ''). The pre-tokenizer
# alphabet (_BPE_PATTERN) can never produce a space inside a token, and
# merged tokens are concatenations of tokens, so the space is a safe
# delimiter forever. Under this encoding, applying merge (a, b) is the
# literal replace  ' a  b '  →  ' ab ' : SQL replace() consumes
# non-overlapping matches LEFT TO RIGHT, which is exactly the greedy
# left-to-right single-pass merge application of BPE training (Sennrich
# et al., "Neural Machine Translation of Rare Words with Subword Units",
# ACL 2016) — e.g. tokens  a a a  merge (a,a) →  aa a , and within one
# pass a freshly merged token can never re-match (a and b are strict
# substrings of ab). Both engines' replace() are literal and
# left-to-right, so re-segmentation is bit-identical.
_WRAP_SQL = "CASE WHEN len(t) = 0 THEN '' ELSE ' ' || array_to_string(t, '  ') || ' ' END"


def _train_ctes() -> list[str]:
    """Shared CTE parts for the training-loop oracles: _TRAIN_ROUNDS
    nested rounds of count → top-1 → replace, mirroring the Spark driver
    loop exactly. Produces docs{r} (the re-segmented corpus after round
    r) and b{r} (round r's winning merge row)."""
    # docs{r} is consumed TWICE (by c{r+1} and docs{r+1}); without
    # MATERIALIZED, CTE inlining doubles the evaluation tree per round —
    # 2^rounds scans of docs0 (measured: 35 s at sf0.001 vs 2 s with the
    # hint, which is PostgreSQL-standard syntax DuckDB honors)
    parts = [
        f"""docs0 AS MATERIALIZED (
        SELECT {_WRAP_SQL} AS s
        FROM (SELECT regexp_extract_all(text, '{_BPE_PATTERN}') AS t FROM documents)
    )"""
    ]
    for r in range(1, _TRAIN_ROUNDS + 1):
        parts.append(
            f"""c{r} AS (
        SELECT t[i] AS a, t[i + 1] AS b, CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM (SELECT string_split(trim(s), '  ') AS t FROM docs{r - 1})
        CROSS JOIN UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        GROUP BY a, b
    )"""
        )
        parts.append(
            f"b{r} AS (SELECT CAST({r} AS BIGINT) AS step, a, b, n_pair "
            f"FROM c{r} ORDER BY n_pair DESC, a, b LIMIT 1)"
        )
        if r < _TRAIN_ROUNDS:
            parts.append(
                f"docs{r} AS MATERIALIZED (SELECT replace(s, ' ' || a || '  ' || b || ' ', "
                f"' ' || a || b || ' ') AS s FROM docs{r - 1} CROSS JOIN b{r})"
            )
    return parts


def _train_oracle() -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM b{r}" for r in range(1, _TRAIN_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(_train_ctes()) + f"\n    {union} ORDER BY step"


@register("bpe_train_merges", oracle=_train_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training end-to-end: _TRAIN_ROUNDS rounds of
    (count adjacent pairs → take the most frequent pair → merge it
    everywhere → re-segment), returning the learned merge table
    (step, a, b, n_pair) — the actual artifact a tokenizer trainer
    produces. Extends ``bpe_merge_pairs`` (one round's counting) to the
    full iterative loop.

    100-TB design: the corpus NEVER leaves the cluster — each round is
    one explode + partial+final count aggregate over the persisted
    wrapped-string corpus, and the driver collects exactly ONE row per
    round (the argmax pair; same counts-only-collect posture as
    ``dedup_cluster_canonical``). Merge application is a narrow
    map-side replace chained onto the cached base, so round k reads the
    cache + k-1 string replaces, no shuffle. Ties break
    deterministically on (n_pair DESC, a, b) in both engines."""
    return bpe_train_frames(load_table(spark, sf_dir, "documents"), _TRAIN_ROUNDS)


def bpe_train_frames(docs: DataFrame, rounds: int) -> DataFrame:
    """Core training loop over any (.., text) frame — split out so unit
    tests can pin merge semantics on constructed corpora."""
    spark = docs.sparkSession
    merges = train_merge_list(docs, rounds)
    return spark.createDataFrame(merges, "step long, a string, b string, n_pair long")


def train_merge_list(docs: DataFrame, rounds: int) -> list[tuple[int, str, str, int]]:
    """Run the training loop and return the learned merges as driver-side
    rows (one per round — the bounded artifact; ``bpe_encode`` folds them
    back into map-side column expressions)."""
    from pyspark import StorageLevel

    from example_beam_spark.sources.parquet import spread_small_input

    # Spread BEFORE the tokenize: the fixture corpus scans as ONE
    # partition, which made the regex tokenize and all ten rounds'
    # pair-explode + partial-agg run single-task (r15 decomposition:
    # 3.4 s materialize + 0.65 s/round on one core). At real scale the
    # scan already yields >= parallelism splits and this is a no-op.
    base = (
        spread_small_input(docs, docs.sparkSession).select(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0).alias("t")
        )
        .select(
            F.when(F.size("t") == 0, F.lit(""))
            .otherwise(F.concat(F.lit(" "), F.array_join("t", "  "), F.lit(" ")))
            .alias("s")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # NOT defer_cleanup: every consumption of this cache happens inside
    # the loop below (the returned frame is built from the collected
    # merge rows), so the eager unpersist in the finally is safe, does
    # not rely on the caller draining cleanups, and — unlike a post-loop
    # statement — releases the cache even when a round's collect throws.

    cur = base
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, rounds + 1):
            top = (
                cur.select(F.split(F.trim(F.col("s")), "  ").alias("t"))
                .select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
                .select("p.a", "p.b")
                .groupBy("a", "b")
                .agg(F.count("*").cast("long").alias("n_pair"))
                .orderBy(F.desc("n_pair"), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:  # pairs ran dry (degenerate corpus) — stop early
                break
            a, b, n = top[0]["a"], top[0]["b"], top[0]["n_pair"]
            merges.append((step, a, b, n))
            cur = cur.select(
                F.replace(
                    F.col("s"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
                ).alias("s")
            )
    finally:
        base.unpersist()
    return merges


# --------------------------------------------------------------------------
# bpe_encode — APPLY the trained merges: tokenize the corpus with the
# learned BPE vocabulary (the inference half of the tokenizer lifecycle)
# --------------------------------------------------------------------------


def _encode_oracle() -> str:
    """Training CTEs (shared with ``bpe_train_merges``) + an id-carrying
    encode chain: e{r} applies round r's winning merge to every document,
    so e{_TRAIN_ROUNDS} holds each doc's final token segmentation."""
    parts = _train_ctes()
    parts.append(
        f"""e0 AS MATERIALIZED (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens_base, {_WRAP_SQL} AS s
        FROM (SELECT doc_id, regexp_extract_all(text, '{_BPE_PATTERN}') AS t
              FROM documents)
    )"""
    )
    for r in range(1, _TRAIN_ROUNDS + 1):
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT doc_id, n_tokens_base, "
            f"replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS s "
            f"FROM e{r - 1} CROSS JOIN b{r})"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT doc_id, n_tokens_base,
           CAST(CASE WHEN trim(s) = '' THEN 0
                     ELSE len(string_split(trim(s), '  ')) END AS BIGINT)
               AS n_tokens_bpe
    FROM e{_TRAIN_ROUNDS}"""
    )


@register("bpe_encode", oracle=_encode_oracle())
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the BPE merges learned by
    ``bpe_train_merges`` — the inference half of the tokenizer
    lifecycle (Sennrich et al. 2016 apply_bpe): greedy left-to-right
    application of the merge list IN TRAINING ORDER to each doc's
    base-symbol sequence. Returns per-doc (n_tokens_base, n_tokens_bpe),
    the compression audit a tokenizer rollout needs.

    100-TB design: training collects exactly one row per round (see
    ``train_merge_list``); encoding then folds the merge table into a
    chain of map-side literal ``replace`` expressions over the wrapped
    corpus — zero shuffle, whole-stage codegen, and the merge list rides
    the closure (it IS the broadcast artifact). The same shape holds for
    a real 50k-merge vocabulary: the chain becomes an Arrow-batched
    pandas UDF applying the merge dict per batch, still shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_merge_list(docs, _TRAIN_ROUNDS)
    enc = docs.select(
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0).alias("t"),
    ).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens_base"),
        F.when(F.size("t") == 0, F.lit(""))
        .otherwise(F.concat(F.lit(" "), F.array_join("t", "  "), F.lit(" ")))
        .alias("s"),
    )
    s = F.col("s")
    for _step, a, b, _n in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return enc.select(
        "doc_id",
        "n_tokens_base",
        F.when(F.length(F.trim(s)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(s), "  ")))
        .cast("long")
        .alias("n_tokens_bpe"),
    )


# --------------------------------------------------------------------------
# bpe_decode_roundtrip — DECODE the encoded corpus and audit the
# round-trip (the symmetry proof of the tokenizer lifecycle)
# --------------------------------------------------------------------------


def _decode_oracle() -> str:
    """Training CTEs + the id-carrying encode chain, then the DECODE:
    BPE tokens are concatenations of base symbols and the pre-tokenizer
    alphabet (_BPE_PATTERN) can never emit a space inside a token, so
    stripping the double-space delimiters of the final segmentation
    reconstructs the normalized document exactly — decode(encode(doc))
    must equal the base-symbol concatenation, per doc, corpus-wide."""
    parts = _train_ctes()
    parts.append(
        f"""d0 AS MATERIALIZED (
        SELECT doc_id, array_to_string(t, '') AS base_concat, {_WRAP_SQL} AS s
        FROM (SELECT doc_id, regexp_extract_all(text, '{_BPE_PATTERN}') AS t
              FROM documents)
    )"""
    )
    for r in range(1, _TRAIN_ROUNDS + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT doc_id, base_concat, "
            f"replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS s "
            f"FROM d{r - 1} CROSS JOIN b{r})"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT doc_id,
           CAST(len(replace(trim(s), '  ', '')) AS BIGINT) AS n_decoded_chars,
           replace(trim(s), '  ', '') = base_concat AS roundtrip_ok
    FROM d{_TRAIN_ROUNDS}"""
    )


@register("bpe_decode_roundtrip", oracle=_decode_oracle())
def bpe_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the ``bpe_encode`` output back to text and audit
    decode(encode(doc)) == normalized doc per document — the round-trip
    symmetry a tokenizer rollout must hold (Sennrich et al. 2016: BPE
    decoding is plain concatenation of the learned subword units, since
    every merge only ever concatenates adjacent base symbols).

    Decode needs no merge table at all: tokens in the wrapped-string
    segmentation are separated by a double space and can never contain
    one (see the _WRAP_SQL contract above), so stripping the delimiters
    IS the decoder. The entry still runs the full train→encode chain so
    the equality is an end-to-end lifecycle proof, not a tautology.

    100-TB design: same zero-shuffle shape as ``bpe_encode`` — the merge
    list rides the closure as a literal replace chain, decode adds one
    more map-side replace, and the equality check is per-row columnar;
    nothing but the 10 one-row training collects touches the driver."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_merge_list(docs, _TRAIN_ROUNDS)
    enc = docs.select(
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0).alias("t"),
    ).select(
        "doc_id",
        F.array_join("t", "").alias("base_concat"),
        F.when(F.size("t") == 0, F.lit(""))
        .otherwise(F.concat(F.lit(" "), F.array_join("t", "  "), F.lit(" ")))
        .alias("s"),
    )
    s = F.col("s")
    for _step, a, b, _n in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    decoded = F.replace(F.trim(s), F.lit("  "), F.lit(""))
    return enc.select(
        "doc_id",
        F.length(decoded).cast("long").alias("n_decoded_chars"),
        (decoded == F.col("base_concat")).alias("roundtrip_ok"),
    )


# --------------------------------------------------------------------------
# docs_budget_select — greedy token-budget training-mix selection
# --------------------------------------------------------------------------
# "Fill a token budget with the best documents": rank by a quality
# score (descending), admit documents while the running token total
# stays within the budget — the selection step between scoring and
# tokenization when a training run has a fixed token budget. The stop
# rule is PREFIX-STOP (the first document that would overflow ends the
# admission; no skip-and-continue knapsack) — deterministic, one-pass,
# and the form a distributed pipeline actually uses (a knapsack over
# 100 TB of docs would need a global sort anyway; prefix-stop needs the
# same sort but no backtracking). Quality here = distinct-token ratio
# (vocabulary richness — boilerplate and repetition score low); both
# engines compute the two integer counts exactly and divide once.
# 100-TB design (round-11 rewrite): the quality score is a map-side
# expression, and the global rank/cumsum is TWO-PHASE — no unpartitioned
# window anywhere in the plan (the round-10 form funnelled every doc
# summary through one WindowExec task; Spark itself warned "No Partition
# Defined for Window operation!"). Phase 1 buckets docs by a DETERMINISTIC
# quality discretization (floor(quality*256): quality is a ratio in (0,1],
# so bucket-descending order IS quality-descending order) and collects one
# (count, token-sum) row per bucket — a <=256-row driver artifact, the
# same bounded-probe discipline as sessionize_events_auto's head-share
# probe. Phase 2 broadcasts per-bucket (rank, cumsum) base offsets back
# and runs rank/cumsum windows PARTITIONED BY bucket (256-way parallel),
# stitching global values as base + local — the scaleops base_sid stitch
# (operators/scaleops.py) applied to a running sum. Bonus pruning: buckets
# whose base cumsum already exceeds the budget are dropped from the join,
# so at scale only the admitted prefix of buckets is ever sorted. The
# scored summary (doc_id, n_tokens, quality — never text) is persisted
# across the two phases and unpersisted via defer_cleanup().

_BUDGET_TOKENS = 20_000
_BUDGET_QBUCKETS = 256

_BUDGET_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{{bpe}}')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS quality
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_tokens, quality,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
               CAST(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM scored
        WINDOW w AS (ORDER BY quality DESC, doc_id)
    )
    SELECT doc_id, n_tokens, quality, rank, cum_tokens
    FROM ranked WHERE cum_tokens <= {_BUDGET_TOKENS}
"""


@register("docs_budget_select", oracle=_BUDGET_ORACLE.format(bpe=_BPE_PATTERN))
def docs_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection, two-phase (section comment)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from example_beam_spark.registry import defer_cleanup

    n_tokens = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")).cast(
        "long"
    )
    quality = (
        F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("double")
        / F.size(F.split(F.col("text"), " "))
    )
    # quality ∈ (0,1] (distinct/total of a non-empty split), so this
    # discretization is order-congruent: every quality in bucket b+1
    # exceeds every quality in bucket b, hence ORDER BY quality DESC
    # == ORDER BY (qb DESC, quality DESC).
    scored = (
        docs.select("doc_id", n_tokens.alias("n_tokens"), quality.alias("quality"))
        .withColumn(
            "qb",
            F.least(
                F.floor(F.col("quality") * _BUDGET_QBUCKETS),
                F.lit(_BUDGET_QBUCKETS - 1),
            ).cast("int"),
        )
        .persist()
    )
    defer_cleanup(lambda: scored.unpersist())
    # Phase 1: bounded driver artifact — one (count, token sum) row per
    # quality bucket, <=256 rows at ANY corpus size.
    summ = {
        r["qb"]: (r["n"], r["s"])
        for r in scored.groupBy("qb")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("s"))
        .collect()
    }
    offsets = []
    base_rank, base_cum = 0, 0
    for b in sorted(summ, reverse=True):  # bucket DESC == quality DESC
        n, s = summ[b]
        # Admission pruning: a bucket whose starting cumsum is already
        # past the budget cannot emit a row (cum_tokens >= base_cum for
        # every row in it) — drop it from the join so its sort never runs.
        if base_cum <= _BUDGET_TOKENS:
            offsets.append((b, base_rank, base_cum))
        base_rank += n
        base_cum += s
    off = spark.createDataFrame(
        offsets, schema="qb int, base_rank long, base_cum long"
    )
    # Phase 2: per-bucket windows (256-way parallel) + broadcast stitch.
    wloc = Window.partitionBy("qb").orderBy(F.desc("quality"), "doc_id")
    ranked = scored.join(F.broadcast(off), "qb").select(
        "doc_id",
        "n_tokens",
        "quality",
        (F.col("base_rank") + F.row_number().over(wloc)).cast("long").alias("rank"),
        (
            F.col("base_cum")
            + F.sum("n_tokens").over(wloc.rowsBetween(Window.unboundedPreceding, 0))
        )
        .cast("long")
        .alias("cum_tokens"),
    )
    return ranked.filter(F.col("cum_tokens") <= _BUDGET_TOKENS)


# --------------------------------------------------------------------------
# docs_shard_shuffle — deterministic global shuffle + shard manifest
# --------------------------------------------------------------------------
# The write-order step of a training-data pipeline: every document gets
# a (shard, position) so the training loader reads a reproducible
# pseudo-random order. Shard = two md5 hex digits of the doc id
# (portable integer-free hex decode: character position in
# '0123456789abcdef' — identical in both engines) mod N; position =
# md5-rank WITHIN the shard. 100-TB design (round-11 rewrite): the
# round-10 plan ran one window task per shard — parallelism pinned at
# _N_SHARDS=8 forever (n/8 rows per single-task sort at any corpus
# size). Now the sort key's own prefix provides the parallelism: the
# first 4 md5 hex digits form a 0..65535 bucket b that is
# ORDER-CONGRUENT with the md5-string sort (hex chars are
# ASCII-ascending, so k1 < k2 iff b1 < b2 or (b1 == b2 and the tails
# compare)), and the shard is a pure function of b (shard = first-byte
# value mod N = (b div 256) mod N). Per-bucket rank windows run
# 65536-way parallel; per-(shard, bucket) counts (a <=65536-row
# summary) get prefix-summed by a window PARTITIONED BY shard — 8
# parallel tasks over <=8192 summary rows each, bounded by construction
# — and broadcast back as base offsets: pos = base + local rank. No
# single-task structure touches per-document rows.

_N_SHARDS = 8
_SHARD_BUCKET_HEX = 4  # md5 prefix digits → 16^4 = 65536 buckets
_HEX = "0123456789abcdef"


@register(
    "docs_shard_shuffle",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents
    )
    SELECT doc_id,
           CAST(((strpos('{_HEX}', substr(k, 1, 1)) - 1) * 16
                 + strpos('{_HEX}', substr(k, 2, 1)) - 1) % {_N_SHARDS}
               AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY ((strpos('{_HEX}', substr(k, 1, 1)) - 1) * 16
                             + strpos('{_HEX}', substr(k, 2, 1)) - 1)
                            % {_N_SHARDS}
               ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM keyed
""",
)
def docs_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard shuffle manifest, two-phase (section comment)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    k = F.md5(F.col("doc_id").cast("string"))
    # b = integer value of the first 4 hex digits (order-congruent with
    # the k sort); shard = first-byte value mod N = (b div 256) mod N,
    # identical to the oracle's two-digit decode.
    keyed = (
        docs.select("doc_id", k.alias("k"))
        .withColumn(
            "b", F.conv(F.substring("k", 1, _SHARD_BUCKET_HEX), 16, 10).cast("long")
        )
        .withColumn("shard", (F.floor(F.col("b") / 256) % _N_SHARDS).cast("long"))
    )
    # Per-bucket local rank: 65536-way parallel, each task sorts only
    # its bucket's rows by (k, doc_id).
    wloc = Window.partitionBy("b").orderBy("k", "doc_id")
    local = keyed.withColumn("local_pos", F.row_number().over(wloc).cast("long"))
    # Summary stitch: <=65536 (shard, b, count) rows; the prefix sum runs
    # per shard over <=8192 bounded summary rows.
    counts = keyed.groupBy("shard", "b").agg(F.count("*").alias("n"))
    wsum = Window.partitionBy("shard").orderBy("b")
    base = counts.withColumn(
        "base",
        F.coalesce(
            F.sum("n").over(wsum.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select("b", "base")
    return local.join(F.broadcast(base), "b").select(
        "doc_id",
        "shard",
        (F.col("base") + F.col("local_pos")).cast("long").alias("pos"),
    )
