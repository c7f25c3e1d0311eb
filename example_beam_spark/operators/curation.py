"""Corpus-curation operators — the data-cleaning passes an LLM
training-data pipeline runs between raw crawl and tokenization, beyond
the dedup/quality surface already in ``dedup.py``/``textops.py``:

- ``semantic_dedup`` — SemDeDup (Abbas et al., "SemDeDup: Data-efficient
  learning at web-scale through semantic deduplication", arXiv
  2303.09540): cluster embeddings into cells, drop all but one member of
  every within-cell near-duplicate group. The published recipe is
  k-means cells + within-cell pairwise cosine — exactly the IVF cell
  machinery of ``ivf.py``, reused here, with the same deterministic
  hash-rank seeds so the DuckDB oracle reproduces cell assignment
  bit-for-bit.
- ``pii_redact`` — regex PII scrubbing (emails, phone numbers) with
  per-document match counts: the C4/Dolma-style cleaning pass. The
  corpus fixture contains no organic PII, so the query first APPENDS
  deterministic synthetic PII derived from ``doc_id`` (both engines
  build the identical augmented text), then asserts the redacted
  output hash — exercising real matches, not a no-op scrub.
- ``text_normalize`` — canonical text form (lowercase, strip
  non-alphanumerics, collapse whitespace): the normalization applied
  before exact-hash dedup in every public pipeline (C4, RefinedWeb).
- ``source_overlap`` — pairwise shingle-Jaccard BETWEEN corpus sources:
  the inter-source contamination / redundancy matrix used to decide
  which crawl snapshots to keep. Scale design: one groupBy(shingle) →
  bounded source-set per shingle → pairwise expansion of that small set
  (≤ |sources|², not |docs|²) → one partial+final count aggregate. The
  |docs|² form never materializes.

Reference scope: these extend the training-data-pipeline surface the
build brief names as first-class; the relational/streaming operator
parity with mkuthan/example-beam lives in the other modules.

Float determinism: cosines reuse the quantized-integer dot products of
``operators/similarity.py``; Jaccard divisions are single IEEE double
ops on exact integer counts — bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.operators.dedup import SHINGLE_N, _shingle_array
from example_beam_spark.operators.io_roundtrip import (
    _ROUNDTRIP_ORACLE,
    roundtrip_frame,
)
from example_beam_spark.operators.ivf import _SEED_IDS_SQL, seed_scores
from example_beam_spark.operators.similarity import (
    _ELEMS_SQL,
    _NORMS_SQL,
    _QUERY_DOTS_SQL,
    _SCALE,
    N_QUERIES,
    TOP_K,
    dot_dec,
    norm_dec,
)
from example_beam_spark.registry import register
from example_beam_spark.sources import load_table, spread_small_input

# --------------------------------------------------------------------------
# semantic_dedup — SemDeDup over IVF cells
# --------------------------------------------------------------------------

SEM_THRESHOLD = 0.35  # within-cell cosine above which docs are semantic dups

# cell assignment mirrors ivf.py's oracle (same seeds, same quantized
# cosine) so both operators agree on every vector's cell
_CELLS_SQL = f"""
    seed_ids AS ({_SEED_IDS_SQL}),
    seed_cos AS (
        SELECT v.vec_id, s.vec_id AS seed_id,
               (CAST(SUM(CAST(FLOOR(v.x * s.x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE})
                   / (nv.nrm * ns.nrm) AS cos_seed
        FROM elems v
        JOIN elems s ON s.i = v.i
        JOIN seed_ids si ON si.vec_id = s.vec_id
        JOIN norms nv ON nv.vec_id = v.vec_id
        JOIN norms ns ON ns.vec_id = s.vec_id
        GROUP BY v.vec_id, s.vec_id, nv.nrm, ns.nrm
    ),
    ranked AS (
        SELECT vec_id, seed_id, ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY cos_seed DESC, seed_id
               ) AS crk
        FROM seed_cos
    ),
    cells AS (SELECT vec_id, seed_id AS cell FROM ranked WHERE crk = 1)
"""

_SEMDEDUP_ORACLE = f"""
    WITH elems AS ({_ELEMS_SQL}),
    norms AS ({_NORMS_SQL}),
    {_CELLS_SQL},
    dots AS (
        SELECT ca.vec_id AS a, cb.vec_id AS b,
               CAST(SUM(CAST(FLOOR(ea.x * eb.x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE} AS dot
        FROM cells ca
        JOIN cells cb ON cb.cell = ca.cell AND cb.vec_id > ca.vec_id
        JOIN elems ea ON ea.vec_id = ca.vec_id
        JOIN elems eb ON eb.vec_id = cb.vec_id AND eb.i = ea.i
        GROUP BY ca.vec_id, cb.vec_id
    ),
    drops AS (
        SELECT DISTINCT d.b AS vec_id
        FROM dots d
        JOIN norms na ON na.vec_id = d.a
        JOIN norms nb ON nb.vec_id = d.b
        WHERE d.dot / (na.nrm * nb.nrm) >= {SEM_THRESHOLD}
    )
    SELECT c.vec_id, c.cell, dr.vec_id IS NULL AS is_kept
    FROM cells c LEFT JOIN drops dr ON dr.vec_id = c.vec_id
"""


@register("semantic_dedup", oracle=_SEMDEDUP_ORACLE)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest IVF cell, then
    within each cell drop every vector that has a lower-id neighbor with
    cosine >= SEM_THRESHOLD (greedy lowest-id representative — the
    deterministic stand-in for the paper's random keeper choice).

    100-TB design: cell assignment is a broadcast join + per-vector
    argmax (see ivf.py); the pairwise pass shuffles by cell so each
    cell's (n/k)^2 comparisons are shuffle-local — the SemDeDup cost
    model. The global all-pairs form never materializes; k scales with
    corpus size to bound per-cell work."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    base = emb.select("vec_id", "embedding", norm_dec("embedding").alias("nrm"))
    cells = (
        seed_scores(base)
        .filter(F.col("crk") == 1)
        .select("vec_id", F.col("seed_id").alias("cell"))
    )
    members = cells.join(base, "vec_id")  # (vec_id, cell, embedding, nrm)

    a = members.select(
        F.col("cell"),
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = members.select(
        F.col("cell"),
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(b, "cell").filter(F.col("b") > F.col("a"))
    drops = (
        pairs.withColumn(
            "cosine", dot_dec("a_emb", "b_emb") / (F.col("a_nrm") * F.col("b_nrm"))
        )
        .filter(F.col("cosine") >= SEM_THRESHOLD)
        .select(F.col("b").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        cells.join(drops, "vec_id", "left")
        .select("vec_id", "cell", F.col("dropped").isNull().alias("is_kept"))
    )


# --------------------------------------------------------------------------
# pii_redact — regex PII scrubbing with match counts
# --------------------------------------------------------------------------

# RE2/Java-regex common subset only (no backrefs, no lookaround) so the
# pattern compiles identically in Spark (java.util.regex) and DuckDB (RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-\d{4}\b"

# deterministic synthetic PII appended to every doc (fixture has none);
# both engines build the identical augmented string from doc_id
_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or admin@test.org call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

_PII_ORACLE = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(aug, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(
                   regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g')) AS red_hash,
           CAST(length(regexp_replace(
                   regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS red_len
    FROM (SELECT doc_id, {_AUG_SQL} AS aug FROM documents) t
"""


@register("pii_redact", oracle=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails and phone numbers from document text (appended
    deterministically per doc_id — see module docstring), reporting match
    counts and the redacted-text hash.

    100-TB design: pure map-side column expressions (regexp_replace /
    regexp_extract_all run in the JVM inside whole-stage codegen) — no
    shuffle, no Python, scan-speed."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or admin@test.org call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(red).alias("red_hash"),
        F.length(red).cast("long").alias("red_len"),
    )


# --------------------------------------------------------------------------
# text_normalize — canonical form for hash-dedup
# --------------------------------------------------------------------------

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

_NORMALIZE_ORACLE = f"""
    SELECT doc_id,
           md5(norm) AS norm_hash,
           CAST(length(norm) AS BIGINT) AS norm_len,
           CAST(CASE WHEN norm = '' THEN 0
                     ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_norm_tokens
    FROM (SELECT doc_id, {_NORM_SQL} AS norm FROM documents) t
"""


def _norm_expr():
    """Spark twin of _NORM_SQL — shared by text_normalize and
    pipeline_clean_corpus so the normalization can never diverge."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )


@register("text_normalize", oracle=_NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form: lowercase, non-alphanumerics to spaces,
    whitespace runs collapsed, trimmed — the pre-pass before exact-hash
    dedup (C4/RefinedWeb normalization step). Emits the canonical hash,
    length, and token count.

    100-TB design: three regexp_replace column expressions, map-side
    only, whole-stage codegen — scan-speed, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    norm = _norm_expr()
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("norm_len"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_norm_tokens"),
    )


# --------------------------------------------------------------------------
# source_overlap — pairwise shingle-Jaccard between corpus sources
# --------------------------------------------------------------------------

_SOURCE_SHINGLES_SQL = f"""
    SELECT DISTINCT source, array_to_string(s[i:i+{SHINGLE_N - 1}], ' ') AS g
    FROM (SELECT source, string_split(text, ' ') AS s FROM documents) t
    CROSS JOIN UNNEST(generate_series(1, GREATEST(len(s) - {SHINGLE_N - 1}, 0))) AS u(i)
"""

_OVERLAP_ORACLE = f"""
    WITH sg AS ({_SOURCE_SHINGLES_SQL}),
    sizes AS (SELECT source, COUNT(*) AS n_g FROM sg GROUP BY source),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM sg a JOIN sg b ON b.g = a.g AND b.source > a.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(n_shared AS BIGINT) AS n_shared,
           CAST(sa.n_g AS BIGINT) AS n_a,
           CAST(sb.n_g AS BIGINT) AS n_b,
           CAST(n_shared AS DOUBLE) / (sa.n_g + sb.n_g - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.source = shared.src_a
    JOIN sizes sb ON sb.source = shared.src_b
"""

# pairwise expansion of a sorted source set: element i pairs with every
# later element — |srcs|^2/2 structs from a set bounded by |sources|
_PAIRS_EXPR = (
    "flatten(transform(srcs, (x, i) -> "
    "transform(slice(srcs, i + 2, size(srcs)), "
    "y -> named_struct('src_a', x, 'src_b', y))))"
)


@register("source_overlap", oracle=_OVERLAP_ORACLE)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source shingle-Jaccard matrix: for every pair of corpus
    sources, |shared distinct shingles| / |union| — the redundancy /
    contamination measure used to choose which crawl snapshots to keep.

    100-TB design: NEVER joins source against source on shingles (that
    shuffle carries the full shingle table twice). Instead one
    groupBy(shingle) collects each shingle's source set (bounded by
    |sources|, tiny), pairs are expanded from that in-memory array
    map-side, and one partial+final count aggregate produces the matrix.
    Per-source sizes ride a broadcast join — the big table is scanned
    once and shuffled once, keyed by shingle."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    sg = docs.select(
        "source",
        F.explode(F.array_distinct(_shingle_array(F.col("text")))).alias("g"),
    )
    # collect_set dedupes, so no distinct pre-pass: ONE shuffle keyed by
    # shingle with a map-side partial set-aggregate. Sizes derive from the
    # same aggregated stream (per-source distinct-shingle count = how many
    # shingle rows list the source). The table is persisted spill-safe so
    # both consumers (sizes, shared) read it without re-scanning the
    # corpus — static ReuseExchange does not fire here because column
    # pruning differs between the branches; same idiom as the cached
    # signature table in dedup.py's candidate-verify join. The returned
    # DataFrame is lazy, so an eager unpersist here would drop the cache
    # before the caller runs — instead the cache is released via
    # registry.defer_cleanup (runners drain after consuming the result).
    from pyspark import StorageLevel

    from example_beam_spark.registry import defer_cleanup

    by_shingle = (
        sg.groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    defer_cleanup(lambda: by_shingle.unpersist())
    sizes = (
        by_shingle.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_g"))
    )
    shared = (
        by_shingle.filter(F.size("srcs") >= 2)
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select(F.col("p.src_a"), F.col("p.src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n_g").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n_g").alias("n_b")))
    return (
        shared.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# record_roundtrip_orc — ORC wire format through the file-load sink
# --------------------------------------------------------------------------


@register("record_roundtrip_orc", oracle=_ROUNDTRIP_ORACLE)
def record_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S8 through the ORC wire format: the same 100 nested records as
    ``record_roundtrip``, written via ``write_file_loads(fmt='orc')`` and
    read back typed — covering Spark's third columnar on-disk format
    (struct/array/map/timestamp all round-trip natively in ORC). Body and
    oracle are shared with the parquet entry (io_roundtrip.py)."""
    return roundtrip_frame(spark, "orc")


# --------------------------------------------------------------------------
# knn_label_predict — kNN majority-vote classification over embeddings
# --------------------------------------------------------------------------

KNN_K = TOP_K  # vote among the exact cosine top-k (same K as ann_topk_*)

_KNN_ORACLE = f"""
    WITH elems AS ({_ELEMS_SQL}),
    norms AS ({_NORMS_SQL}),
    dots AS ({_QUERY_DOTS_SQL}),
    topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT t.query_id, t.neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.query_id
                       ORDER BY t.dot / (nq.nrm * nd.nrm) DESC, t.neighbor_id
                   ) AS rk
            FROM dots t
            JOIN norms nq ON nq.vec_id = t.query_id
            JOIN norms nd ON nd.vec_id = t.neighbor_id
        ) WHERE rk <= {KNN_K}
    ),
    votes AS (
        SELECT t.query_id, e.label, COUNT(*) AS n_votes
        FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
        GROUP BY t.query_id, e.label
    )
    SELECT v.query_id,
           CAST(q.label AS BIGINT) AS true_label,
           CAST(v.label AS BIGINT) AS pred_label,
           CAST(v.n_votes AS BIGINT) AS n_votes
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY n_votes DESC, label
               ) AS vrk
        FROM votes
    ) v
    JOIN embeddings q ON q.vec_id = v.query_id
    WHERE v.vrk = 1
"""


@register("knn_label_predict", oracle=_KNN_ORACLE)
def knn_label_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label prediction: for each query vector, the
    modal label among its exact cosine top-10 neighbors (tie → smaller
    label) — similarity search applied to auto-labeling / weak
    supervision of corpus documents.

    100-TB design: identical cost shape to ann_topk_bruteforce (broadcast
    query set × corpus scan; swap in the IVF/LSH candidate generation for
    sublinear scans) plus two tiny aggregations keyed by query."""
    from pyspark.sql import Window

    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    base = emb.select(
        "vec_id", "embedding", "label", norm_dec("embedding").alias("nrm")
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("label").alias("true_label"),
    )
    pairs = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
        F.col("label").alias("n_label"),
    ).join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "true_label",
        "n_label",
        "neighbor_id",
        (dot_dec("q_emb", "n_emb") / (F.col("q_nrm") * F.col("n_nrm"))).alias("cosine"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    topk = scored.withColumn("rk", F.row_number().over(wk)).filter(F.col("rk") <= KNN_K)
    votes = topk.groupBy("query_id", "true_label", "n_label").agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), "n_label")
    return (
        votes.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") == 1)
        .select(
            "query_id",
            F.col("true_label").cast("long").alias("true_label"),
            F.col("n_label").cast("long").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )


# --------------------------------------------------------------------------
# docs_mixture_sample — temperature-flattened per-language sampling
# --------------------------------------------------------------------------
# The multilingual data-mixing pass (Conneau & Lample, "Cross-lingual
# Language Model Pretraining", NeurIPS 2019 §3.1): sample languages with
# probability q_l ∝ n_l^alpha (alpha = 0.5 here, i.e. sqrt — chosen
# because IEEE sqrt is correctly-rounded in BOTH engines, unlike pow/ln)
# so low-resource languages are upsampled relative to their share.
# Membership stays a pure hash function of doc_id (no RNG) with a
# per-language threshold derived from the counts; the sqrt weights pass
# through DECIMAL(38,6) so their SUM is order-independent.

MIX_TARGET_FRACTION = 4  # sample ~1/4 of the corpus overall
_MIX_BITS = 268435456.0  # 2^28 — the slot space of the 7-hex-digit hash

# CTE chain producing rates(lang, n_l, rate) — shared verbatim by
# docs_mixture_sample and pipeline_clean_corpus so the sampling formula
# can never diverge between the standalone pass and the composed pipeline
_RATES_SQL = f"""counts AS (
        SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
    ),
    weights AS (
        SELECT lang, n_l,
               CAST(SQRT(CAST(n_l AS DOUBLE)) AS DECIMAL(38,6)) AS w_dec
        FROM counts
    ),
    totals AS (
        SELECT SUM(w_dec) AS sum_w, SUM(n_l) AS n_total FROM weights
    ),
    rates AS (
        SELECT w.lang, w.n_l,
               LEAST(1.0, (CAST(w.w_dec AS DOUBLE) / CAST(t.sum_w AS DOUBLE))
                          * (CAST(t.n_total AS DOUBLE) / {MIX_TARGET_FRACTION}.0)
                          / CAST(w.n_l AS DOUBLE)) AS rate
        FROM weights w CROSS JOIN totals t
    )"""


def _mix_pred_sql(doc_id_sql: str) -> str:
    """SQL predicate: 28 md5 bits of the salted doc id vs r.rate."""
    return (
        f"CAST(('0x' || substr(md5('mix:' || CAST({doc_id_sql} AS VARCHAR)), 1, 7))"
        f" AS BIGINT) < CAST(FLOOR(r.rate * {_MIX_BITS}) AS BIGINT)"
    )


_MIX_ORACLE = f"""
    WITH {_RATES_SQL}
    SELECT d.doc_id, d.lang,
           CAST(r.n_l AS BIGINT) AS n_lang,
           r.rate AS sample_rate
    FROM documents d
    JOIN rates r ON r.lang = d.lang
    WHERE {_mix_pred_sql("d.doc_id")}
"""


def _mixture_rates(docs: DataFrame) -> DataFrame:
    """Spark twin of _RATES_SQL: (lang, n_l, rate)."""
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    weights = counts.withColumn(
        "w_dec", F.sqrt(F.col("n_l").cast("double")).cast("decimal(38,6)")
    )
    totals = weights.agg(F.sum("w_dec").alias("sum_w"), F.sum("n_l").alias("n_total"))
    return weights.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_l",
        F.least(
            F.lit(1.0),
            (F.col("w_dec").cast("double") / F.col("sum_w").cast("double"))
            * (F.col("n_total").cast("double") / MIX_TARGET_FRACTION)
            / F.col("n_l").cast("double"),
        ).alias("rate"),
    )


def _mix_slot():
    """Spark twin of the 28-bit salted hash in _mix_pred_sql."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")


@register("docs_mixture_sample", oracle=_MIX_ORACLE)
def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixture sample: keep each document
    with per-language probability ∝ n_l^0.5 scaled to a 1/4 corpus
    budget (capped at 1), membership decided by 28 md5 bits of the doc
    id against the language's threshold.

    100-TB design: one tiny counts aggregate (|languages| rows) broadcast
    back onto the scan — the sample predicate is then map-side, composes
    with pushdown, and needs no RNG state or shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    rates = _mixture_rates(docs)
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(_mix_slot() < F.floor(F.col("rate") * _MIX_BITS).cast("long"))
        .select(
            "doc_id",
            "lang",
            F.col("n_l").cast("long").alias("n_lang"),
            F.col("rate").alias("sample_rate"),
        )
    )


# --------------------------------------------------------------------------
# doc_salient_terms — per-document top terms by tf·(N/df)
# --------------------------------------------------------------------------
# Log-free tf-idf variant: score = tf * (N / df). Monotone in the
# standard tf·idf ranking for fixed tf, and avoids ln/pow whose rounding
# is not guaranteed identical across engines — every op here is exact
# integer counting plus two correctly-rounded IEEE double ops in a fixed
# evaluation order, so scores hash bit-identically.

SALIENT_TOP = 5

_SALIENT_ORACLE = f"""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    total AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE)
                   * (CAST(t.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score
        FROM tf JOIN df ON df.term = tf.term CROSS JOIN total t
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
               ) AS rk
        FROM scored
    ) WHERE rk <= {SALIENT_TOP}
"""


@register("doc_salient_terms", oracle=_SALIENT_ORACLE)
def doc_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 (SALIENT_TOP) salient terms by tf·(N/df) — the
    keyword / topic-signature extraction pass (tf-idf family) used for
    corpus bucketing and retrieval indexing.

    100-TB design: tf is one partial+final count keyed by (doc, term);
    df aggregates the tf stream keyed by term (vocabulary-sized output);
    the tf×df join is keyed by term — skewed stopword terms are exactly
    the AQE skew-join case pinned in tests/test_plans.py. The final
    top-k cut is a window keyed by doc."""
    from pyspark.sql import Window

    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    tf = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= SALIENT_TOP)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            "rk",
        )
    )


# --------------------------------------------------------------------------
# winnowing_fingerprint — MOSS winnowing document fingerprints
# --------------------------------------------------------------------------
# Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD 2003): hash every k-gram, slide a window of w
# consecutive hashes, select the RIGHTMOST minimal hash in each window,
# dedup the selections. Guarantees every match of length >= w+k-1 shares
# a fingerprint, with expected density 2/(w+1) — the standard
# plagiarism / contamination fingerprint (sparser and position-aware,
# vs doc_fingerprint's single global min-hash).

WINNOW_W = 4  # window of consecutive k-gram hashes

_WINNOW_ORACLE = f"""
    WITH pos AS (
        SELECT doc_id, i AS p,
               CAST(('0x' || substr(md5(array_to_string(s[i:i+{SHINGLE_N - 1}], ' ')), 1, 7))
                    AS BIGINT) AS h,
               GREATEST(len(s) - {SHINGLE_N - 1}, 0) AS n_pos
        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) t
        CROSS JOIN UNNEST(generate_series(1, GREATEST(len(s) - {SHINGLE_N - 1}, 0))) AS u(i)
    ),
    win AS (
        SELECT a.doc_id, a.p AS wstart, b.p, b.h,
               ROW_NUMBER() OVER (
                   PARTITION BY a.doc_id, a.p ORDER BY b.h, b.p DESC
               ) AS mrk
        FROM pos a
        JOIN pos b ON b.doc_id = a.doc_id AND b.p >= a.p AND b.p < a.p + {WINNOW_W}
        WHERE a.p <= a.n_pos - {WINNOW_W} + 1
    )
    SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos, h AS fp
    FROM win WHERE mrk = 1
"""


@register("winnowing_fingerprint", oracle=_WINNOW_ORACLE)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: per document, the deduped set of
    (position, 28-bit k-gram hash) pairs selected as the rightmost
    minimum of each w-hash sliding window. Documents shorter than
    w+k-1 tokens yield no windows and are excluded (as in the paper —
    no guarantee below the noise threshold).

    100-TB design: hashing is map-side (explode + md5); the
    window-membership fan-out is a fixed ×w explode joined back on
    (doc, position) — one shuffle keyed by (doc, position), partial
    aggregation throughout; selection + dedup are windows keyed by doc.
    No corpus×corpus structure anywhere."""
    from pyspark.sql import Window

    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    s = F.split(F.col("text"), " ")
    base = docs.select("doc_id", s.alias("s")).select(
        "doc_id",
        "s",
        F.greatest(F.size("s") - (SHINGLE_N - 1), F.lit(0)).alias("n_pos"),
    )
    pos = base.select(
        "doc_id",
        "n_pos",
        F.explode(
            F.when(
                F.col("n_pos") >= 1, F.sequence(F.lit(1), F.col("n_pos"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
        "s",
    ).select(
        "doc_id",
        "n_pos",
        "p",
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice("s", F.col("p"), SHINGLE_N))), 1, 7),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    starts = pos.filter(F.col("p") <= F.col("n_pos") - WINNOW_W + 1).select(
        "doc_id", F.col("p").alias("wstart")
    )
    members = starts.withColumn(
        "p", F.explode(F.sequence(F.col("wstart"), F.col("wstart") + WINNOW_W - 1))
    ).join(pos.select("doc_id", "p", "h"), ["doc_id", "p"])
    mrk = F.row_number().over(
        Window.partitionBy("doc_id", "wstart").orderBy(F.col("h"), F.desc("p"))
    )
    return (
        members.withColumn("mrk", mrk)
        .filter(F.col("mrk") == 1)
        .select("doc_id", F.col("p").cast("long").alias("pos"), F.col("h").alias("fp"))
        .distinct()
    )


# --------------------------------------------------------------------------
# pipeline_clean_corpus — the end-to-end curation pipeline in ONE plan
# --------------------------------------------------------------------------
# Composes the session's curation passes the way a production corpus
# build chains them (C4/RefinedWeb order): canonical normalization →
# exact dedup on the normalized hash (keep lowest doc_id) → token-band
# quality gate → temperature-flattened language sampling. Emits every
# document with its per-stage provenance flags and the final keep
# decision, so downstream audits can attribute every drop to a stage.
# One declarative plan end-to-end: Catalyst fuses the map-side stages
# (normalize, hash, quality, sample predicate) into the scan projection;
# the only shuffles are the dedup window (keyed by content hash) and
# the tiny language-counts aggregate that broadcasts back.

_PIPE_Q_MIN_TOKENS = 20  # quality band on normalized token count
_PIPE_Q_MAX_TOKENS = 1000

_PIPELINE_ORACLE = f"""
    WITH normed AS (
        SELECT doc_id, lang, {_NORM_SQL} AS norm FROM documents
    ),
    flagged AS (
        SELECT doc_id, lang, norm,
               md5(norm) AS norm_hash,
               ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
                   AS is_canonical,
               CASE WHEN norm = '' THEN 0
                    ELSE len(string_split(norm, ' ')) END AS n_tok
        FROM normed
    ),
    {_RATES_SQL}
    SELECT f.doc_id, f.lang, f.norm_hash,
           f.is_canonical,
           f.n_tok BETWEEN {_PIPE_Q_MIN_TOKENS} AND {_PIPE_Q_MAX_TOKENS}
               AS passes_quality,
           {_mix_pred_sql("f.doc_id")} AS sampled,
           (f.is_canonical
            AND f.n_tok BETWEEN {_PIPE_Q_MIN_TOKENS} AND {_PIPE_Q_MAX_TOKENS}
            AND {_mix_pred_sql("f.doc_id")}) AS final_keep
    FROM flagged f JOIN rates r ON r.lang = f.lang
"""


@register("pipeline_clean_corpus", oracle=_PIPELINE_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning as one composed plan: normalize →
    hash-dedup (canonical = lowest doc_id per normalized hash) →
    token-band quality gate → temperature-flattened language sample.
    Every document is emitted with per-stage flags plus the conjunction
    (`final_keep`) so each drop is attributable to its stage.

    100-TB design: the map-side stages fuse into the scan projection
    (whole-stage codegen); shuffles are exactly (1) the dedup window
    keyed by content hash and (2) a |languages|-row aggregate broadcast
    back onto the stream. No stage materializes an intermediate corpus —
    the audit-friendliness of staged pipelines WITHOUT paying a write
    per stage."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = _norm_expr()
    n_tok = (
        F.when(F.col("norm") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("norm"), " ")))
        .cast("long")
    )
    flagged = (
        docs.select("doc_id", "lang", norm.alias("norm"))
        .withColumn("norm_hash", F.md5(F.col("norm")))
        .withColumn(
            "is_canonical",
            F.row_number().over(
                Window.partitionBy("norm_hash").orderBy("doc_id")
            )
            == 1,
        )
        .withColumn("n_tok", n_tok)
    )

    rates = _mixture_rates(docs).select("lang", "rate")
    passes_quality = F.col("n_tok").between(_PIPE_Q_MIN_TOKENS, _PIPE_Q_MAX_TOKENS)
    sampled = _mix_slot() < F.floor(F.col("rate") * _MIX_BITS).cast("long")
    return (
        flagged.join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            "norm_hash",
            "is_canonical",
            passes_quality.alias("passes_quality"),
            sampled.alias("sampled"),
            (F.col("is_canonical") & passes_quality & sampled).alias("final_keep"),
        )
    )


# --------------------------------------------------------------------------
# label_centroids — per-class mean-pooled prototype vectors
# --------------------------------------------------------------------------

_CENT_ORACLE = f"""
    WITH elems AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS i,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_SCALE}) AS BIGINT) AS q
        FROM embeddings
    ),
    dims AS (
        SELECT label, i,
               CAST(SUM(q) AS DOUBLE) / (COUNT(*) * {_SCALE}) AS m
        FROM elems GROUP BY label, i
    ),
    counts AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM embeddings GROUP BY label
    )
    SELECT d.label, c.n_vectors, list(d.m ORDER BY d.i) AS centroid
    FROM dims d JOIN counts c ON c.label = d.label
    GROUP BY d.label, c.n_vectors
"""


@register("label_centroids", oracle=_CENT_ORACLE)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class prototype vectors: element-wise mean of every embedding
    sharing a label — the pooling step behind nearest-centroid
    classification, class-balanced sampling, and the trained-IVF seeding
    idea. Sums use the FLOOR(x·1e12) quantized-integer convention from
    ``operators/similarity.py`` so the mean is bit-reproducible against
    the oracle (raw double sums are order-sensitive; decimal(38,6) would
    ROUND float32 mantissas differently per engine).

    100-TB design: posexplode fans each vector into (label, dim)
    elements map-side; ONE partial+final aggregate keyed by
    (label, dim) — at most |labels|·dim groups — then a labels-sized
    regroup packs the array back in dimension order. No vector ever
    crosses the shuffle whole; state is two longs per (label, dim)."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    elems = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x")
    ).select(
        "label", "i", F.floor(F.col("x") * F.expr(_SCALE)).cast("long").alias("q")
    )
    dims = elems.groupBy("label", "i").agg(
        (F.sum("q").cast("double") / (F.count("*") * F.expr(_SCALE))).alias("m")
    )
    counts = emb.groupBy("label").agg(F.count("*").cast("long").alias("n_vectors"))
    packed = (
        dims.groupBy("label")
        .agg(F.sort_array(F.collect_list(F.struct("i", "m"))).alias("ps"))
        .select("label", F.expr("transform(ps, p -> p.m)").alias("centroid"))
    )
    return counts.join(packed, "label").select("label", "n_vectors", "centroid")
