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

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.operators.dedup import SHINGLE_N, _shingle_array
from example_beam_spark.operators.ivf import _SEED_IDS_SQL, seed_scores
from example_beam_spark.operators.similarity import (
    _ELEMS_SQL,
    _NORMS_SQL,
    _SCALE,
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


@register("text_normalize", oracle=_NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form: lowercase, non-alphanumerics to spaces,
    whitespace runs collapsed, trimmed — the pre-pass before exact-hash
    dedup (C4/RefinedWeb normalization step). Emits the canonical hash,
    length, and token count.

    100-TB design: three regexp_replace column expressions, map-side
    only, whole-stage codegen — scan-speed, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
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
    # signature table in dedup.py's candidate-verify join.
    from pyspark import StorageLevel

    by_shingle = (
        sg.groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
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


@register(
    "record_roundtrip_orc",
    oracle="""
    SELECT i AS id,
           CAST(to_timestamp(i) AS TIMESTAMP) AS timestamp,
           'some name ' || i AS name,
           CASE WHEN i % 10 <> 0 THEN 'some description ' || i END AS description,
           'someKey' AS attr_key,
           'someValue ' || i AS attr_value,
           'someValue ' || i AS map_value
    FROM range(1, 101) t(i)
""",
)
def record_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S8 through the ORC wire format: the same 100 nested records as
    ``record_roundtrip`` written via ``write_file_loads(fmt='orc')`` and
    read back typed — covering Spark's third columnar on-disk format
    (struct/array/map/timestamp all round-trip natively in ORC)."""
    from example_beam_spark.sinks import (
        CreateDisposition,
        WriteDisposition,
        write_file_loads,
    )
    from example_beam_spark.sources import range_records

    records = range_records(spark, 100)
    path = os.path.join(tempfile.mkdtemp(prefix="roundtrip_orc_"), "records")
    write_file_loads(
        records,
        path,
        create_disposition=CreateDisposition.CREATE_IF_NEEDED,
        write_disposition=WriteDisposition.WRITE_TRUNCATE,
        fmt="orc",
    )
    back = spark.read.schema(records.schema).orc(path)
    return back.select(
        "id",
        "timestamp",
        "name",
        "description",
        F.col("attributes")[0]["key"].alias("attr_key"),
        F.col("attributes")[0]["value"].alias("attr_value"),
        F.col("attributes_map")["someKey"].alias("map_value"),
    )
