"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, exact n-gram Jaccard, and SimHash. North-star extensions
(BASELINE.json); not in the reference.

Engine-portability: all hashing derives from md5 hex (identical across
engines); MinHash uses the one-base-hash *affine family*
``(a_i * h + b_i) mod p`` with ``h`` = 56 md5 bits mod p — integer
arithmetic both Spark and DuckDB compute bit-identically, so every query
here has a full value-level oracle.

Scale design (100 TB):
- exact dedup: one hash-aggregate on md5(text) — partial+final, no blow-up;
- MinHash signatures: explode shingles (map-side, no distinct pre-pass —
  the aggregate is duplicate-tolerant), one md5 per shingle, one
  partial+final aggregate to 12 affine mins — state per doc is 12 longs.
  (Measured dead end: computing the 12 mins map-side with higher-order
  functions — array_min(transform(...)) or one F.aggregate over the
  shingle array — is 6-15× SLOWER than explode+groupBy, because HOF
  lambdas evaluate interpreted per element while the exploded aggregate
  runs in whole-stage codegen. Keep the explode.);
- LSH banding: candidates come from equality joins on band keys (4 shuffle
  joins on short keys), so the pairwise work is |candidate pairs|, not
  |docs|²; exact-Jaccard verification joins shingles only for candidates;
- exact n-gram Jaccard uses PPJoin-style prefix filtering (rare-first
  token order; join only on each doc's first n - ceil(t*n) + 1 tokens):
  pairwise work is Σ df(g)² over PREFIX tokens only — an exact
  similarity join that scales; LSH remains the approximate/cheaper path;
- SimHash: explode tokens → 16 partial+final bit-weight sums per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sources import load_table, spread_small_input

SHINGLE_N = 3
N_HASHES = 12
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_DUP_THRESHOLD = 0.5
SIMHASH_BITS = 16

# --------------------------------------------------------------------------
# shared shingle machinery
# --------------------------------------------------------------------------


def _shingle_array(text: Column, n: int = SHINGLE_N) -> Column:
    """Array of n-token shingle strings (empty when the doc is shorter)."""
    s = F.split(text, " ")
    return F.when(
        F.size(s) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(s) - n),
            lambda i: F.concat_ws(" ", F.slice(s, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, g) — distinct n-token shingles per document."""
    return docs.select(
        "doc_id", F.explode(F.array_distinct(_shingle_array(F.col("text"), n))).alias("g")
    )


def shingles_raw(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, g) WITHOUT per-doc dedup — the cheap stream for consumers
    whose aggregate is duplicate-tolerant (MinHash MIN; gset via
    array_distinct in the aggregate). Skips the interpreted ``transform``
    lambda of :func:`_shingle_array`: explode positions, then a
    codegen'd ``concat_ws(slice(...))`` projection (measured ~2× faster
    than the HOF form; duplicate rows are <0.2% on this corpus)."""
    s = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", s.alias("s"))
        .select(
            "doc_id",
            "s",
            # guard: sequence(1, 0) would count DOWN in Spark (default
            # step -1) for docs shorter than n tokens — emit an empty
            # array instead so explode drops the row, matching the
            # distinct-shingles path and DuckDB's generate_series
            F.explode(
                F.when(
                    F.size("s") >= n,
                    F.sequence(F.lit(1), F.size("s") - n + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
        .select("doc_id", F.concat_ws(" ", F.slice("s", F.col("i"), n)).alias("g"))
    )


_SHINGLES_SQL = f"""
    SELECT DISTINCT doc_id, array_to_string(s[i:i+{SHINGLE_N - 1}], ' ') AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) t
    CROSS JOIN UNNEST(generate_series(1, GREATEST(len(s) - {SHINGLE_N - 1}, 0))) AS u(i)
"""

# --------------------------------------------------------------------------
# dedup_exact — hash-groupBy exact duplicate detection
# --------------------------------------------------------------------------

_EXACT_ORACLE = """
    SELECT doc_id,
           md5(text) AS content_hash,
           CAST(ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS BIGINT)
               AS dup_rank,
           CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
               AS is_canonical
    FROM documents
"""


@register("dedup_exact", oracle=_EXACT_ORACLE, headline=True)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(content) groups; lowest doc_id is canonical."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    w = Window.partitionBy(h)
    rank = F.row_number().over(w.orderBy("doc_id"))
    return docs.select(
        "doc_id",
        h.alias("content_hash"),
        rank.cast("long").alias("dup_rank"),
        F.count("*").over(w).cast("long").alias("group_size"),
        (rank == 1).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# dedup_minhash_lsh — MinHash signatures → banded LSH candidates → exact
# Jaccard verification
# --------------------------------------------------------------------------


# One-base-hash affine MinHash family (the MLlib-MinHashLSH shape): the
# base hash is the first 14 hex digits of md5(g) reduced mod p, and the
# i-th hash is (a_i * h + b_i) mod p with md5-derived constants. ONE md5
# per shingle instead of N_HASHES salted md5s — measured ~2× on the
# signature aggregate. p = 2^31 - 1 keeps a_i * h < 2^62 (no BIGINT
# overflow in either engine); both sides compute integer-identically.
_MINHASH_P = 2147483647


def _affine_const(i: int) -> tuple[int, int]:
    import hashlib

    a = int(hashlib.md5(f"a:{i}".encode()).hexdigest()[:8], 16) % (_MINHASH_P - 1) + 1
    b = int(hashlib.md5(f"b:{i}".encode()).hexdigest()[:8], 16) % _MINHASH_P
    return a, b


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, gset, s0..s{k-1}): per-doc MinHash signature —
    the i-th component is MIN((a_i * h(g) + b_i) mod p) over the affine
    family above. Accepts the duplicate-carrying :func:`shingles_raw`
    stream: MIN is duplicate-tolerant and ``gset`` dedups in the
    aggregate, so no distinct pre-pass (and no Expand plan) is needed.

    ``gset`` (the doc's sorted distinct shingle set) rides along for the
    verify stage: candidate-pair verification is then two one-row-per-doc
    joins + ``array_intersect``, instead of re-joining the exploded
    shingle table twice and re-aggregating (measured ~2× on the verify
    stage at sf0.1). State per doc is bounded by doc length — the same
    rows that already flow through this aggregate."""
    # materialize the base hash in a projection so the md5 runs ONCE per
    # row, not once per min-aggregate child expression
    h = F.conv(F.substring(F.md5("g"), 1, 14), 16, 10).cast("long") % F.lit(
        _MINHASH_P
    )
    mins = []
    for i in range(N_HASHES):
        a, b = _affine_const(i)
        mins.append(
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(_MINHASH_P)).alias(
                f"s{i}"
            )
        )
    return (
        sh.withColumn("_h", h)
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.array_distinct(F.collect_list("g"))).alias("gset"),
            *mins,
        )
        .withColumn("n_shingles", F.size("gset").cast("long"))
    )


def band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bk): one short LSH bucket key per band —
    md5 of the band's signature slice."""
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"s{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                )
            ).alias("bk"),
        )
        for b in range(N_BANDS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bandkey")
    ).select("doc_id", F.col("bandkey.band").alias("band"), F.col("bandkey.bk").alias("bk"))


def minhash_sig_cols_sql() -> str:
    """The DuckDB projection computing the N_HASHES MinHash signature
    columns (s0..s{N-1}) from shingle rows (doc_id, g). SINGLE source of
    truth for every oracle that replicates this module's MinHash family
    (the batch oracle below and structures.py's incremental-index
    oracle) — edit here and both stay in lockstep."""
    return ", ".join(
        "MIN(({a} * (CAST(('0x' || substr(md5(g),1,14)) AS BIGINT) % {p})"
        " + {b}) % {p}) AS s{i}".format(
            a=_affine_const(i)[0], b=_affine_const(i)[1], p=_MINHASH_P, i=i
        )
        for i in range(N_HASHES)
    )


def minhash_band_rows_sql() -> str:
    """The DuckDB VALUES rows mapping signature columns to LSH band
    keys ((band, md5-of-row-concat) pairs) — shared with
    structures.py's incremental oracle like minhash_sig_cols_sql."""
    return ", ".join(
        f"({b}, md5(s{b * ROWS_PER_BAND} || '|' || s{b * ROWS_PER_BAND + 1} || '|' || s{b * ROWS_PER_BAND + 2}))"
        for b in range(N_BANDS)
    )


def _minhash_oracle() -> str:
    sig_cols = minhash_sig_cols_sql()
    band_rows = minhash_band_rows_sql()
    return f"""
        WITH sh AS ({_SHINGLES_SQL}),
        sig AS (
            SELECT doc_id, COUNT(DISTINCT g) AS n_shingles, {sig_cols}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, band, bk
            FROM sig CROSS JOIN LATERAL (VALUES {band_rows}) AS v(band, bk)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        ),
        verified AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
            FROM cand c
            JOIN sh x ON x.doc_id = c.doc_a
            JOIN sh y ON y.doc_id = c.doc_b AND y.g = x.g
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT v.doc_a, v.doc_b,
               CAST(v.n_shared AS BIGINT) AS n_shared,
               CAST(sa.n_shingles AS BIGINT) AS n_a,
               CAST(sb.n_shingles AS BIGINT) AS n_b,
               CAST(v.n_shared AS DOUBLE)
                   / (sa.n_shingles + sb.n_shingles - v.n_shared) AS jaccard,
               CAST(v.n_shared AS DOUBLE)
                   / (sa.n_shingles + sb.n_shingles - v.n_shared)
                   >= {JACCARD_DUP_THRESHOLD} AS is_dup
        FROM verified v
        JOIN sig sa ON sa.doc_id = v.doc_a
        JOIN sig sb ON sb.doc_id = v.doc_b
    """


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), headline=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: shingle → 12-component affine
    MinHash family (one base md5 per shingle; the i-th hash is
    ``(a_i*h + b_i) mod p``, see :data:`_MINHASH_P`) → 4 bands × 3 rows →
    bucket-equality candidate join → exact Jaccard verification on
    candidates only (``array_intersect`` over the per-doc sorted shingle
    sets riding on the signature table — no second pass over the exploded
    shingles; see :func:`minhash_signatures`)."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles_raw(docs)
    # sig feeds the band keys AND the verify joins — cache the
    # one-row-per-doc signature table instead of recomputing the
    # shingle aggregation.
    sig = minhash_signatures(sh).cache()
    bands = band_keys(sig)

    b2 = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band2"), F.col("bk").alias("bk2")
    )
    cand = (
        bands.join(
            b2,
            (F.col("band") == F.col("band2"))
            & (F.col("bk") == F.col("bk2"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )

    docsets = sig.select("doc_id", "n_shingles", "gset")
    out = (
        cand.join(
            docsets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_shingles").alias("n_a"),
                F.col("gset").alias("gs_a"),
            ),
            "doc_a",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n_shingles").alias("n_b"),
                F.col("gset").alias("gs_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "n_shared", F.size(F.array_intersect("gs_a", "gs_b")).cast("long")
        )
        .filter(F.col("n_shared") > 0)
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return out.select(
        "doc_a",
        "doc_b",
        "n_shared",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        jac.alias("jaccard"),
        (jac >= JACCARD_DUP_THRESHOLD).alias("is_dup"),
    )


# --------------------------------------------------------------------------
# dedup_ngram_jaccard — exact all-pairs n-gram Jaccard above a threshold
# --------------------------------------------------------------------------

_JACCARD_THRESHOLD = 0.25

_NGRAM_ORACLE = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT s.doc_a, s.doc_b,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(s.n_shared AS DOUBLE) / (a.n + b.n - s.n_shared) AS jaccard
    FROM shared s
    JOIN sizes a ON a.doc_id = s.doc_a
    JOIN sizes b ON b.doc_id = s.doc_b
    WHERE CAST(s.n_shared AS DOUBLE) / (a.n + b.n - s.n_shared) >= {_JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard pairs above the threshold, via prefix
    filtering (the PPJoin family, Xiao et al. / Bayardo et al. — public
    similarity-join literature): order every doc's shingles by ascending
    document frequency (ties by shingle), and join docs only on tokens in
    each doc's first ``n - ceil(t*n) + 1`` shingles. Exactness: if
    J(x,y) >= t, the smallest common token in that global order cannot sit
    in either doc's suffix (the suffix holds < t*n tokens, fewer than the
    required overlap), so it lies in BOTH prefixes and the prefix join
    finds the pair. Candidates are then verified with the true
    intersection; nothing below the bar survives.

    Scale (100 TB): pairwise work drops from Σ df(g)² over ALL shingles to
    Σ df(g)² over PREFIX tokens — rare-first ordering makes prefix tokens
    precisely the low-df ones. No global rank is materialized (ordering
    uses the (df, g) tuple itself), so there is no single-partition
    bottleneck; every stage is an ordinary keyed shuffle.

    The candidate join also applies PPJoin's size filter (t*na <= nb <=
    na/t) and positional filter (intersection <= min(na-pa, nb-pb)+1 for
    the first shared prefix token; J >= t needs >= t/(1+t)*(na+nb)) —
    both exact. Measured on the 10x stress corpus: the positional filter
    does NOT move wall time there (232 s vs 209 s, within environment
    drift) because the bottleneck is the prefix equi-join volume itself
    (sum df_prefix(g)^2 rows are matched before any residual predicate
    runs); it pays off on natural corpora by shrinking the
    distinct+verify stages, and costs nothing here.

    Applicability condition (measured, round-5 stress lane — NOTES.md):
    prefix filtering is sub-quadratic only while the shingle-df
    distribution keeps a long unique tail (natural text). On a
    vocab-saturated corpus the shingle space fills up, every df grows
    ~linearly with n, and Σ df_prefix(g)² grows quadratically — measured
    106× candidate growth for a 10× synthetic corpus (a constant ~17×
    reduction vs all-pairs, both ≈5.5% of n²). For such corpora route
    scale through :func:`dedup_minhash_lsh`, whose verify stage computes
    the same EXACT Jaccard on LSH candidates (probabilistic recall, 4.9k
    candidate pairs at 50k docs on the same corpus); keep this operator
    as the exactness oracle."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles(docs)
    dfreq = sh.groupBy("g").agg(F.count("*").alias("df"))
    docsets = (
        sh.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("g")))
            ).alias("toks"),
            F.count("*").alias("n"),
        )
        .withColumn("p", F.col("n") - F.ceil(F.col("n") * _JACCARD_THRESHOLD) + 1)
        .withColumn("gset", F.expr("transform(toks, x -> x.g)"))
        .cache()
    )
    prefix = docsets.select(
        "doc_id",
        "n",
        F.posexplode(F.expr("slice(toks, 1, CAST(p AS INT))")).alias("pos0", "tk"),
    ).select(
        "doc_id",
        "n",
        (F.col("pos0") + 1).alias("pos"),  # 1-based position in df-sorted order
        F.col("tk.g").alias("g"),
    )

    pa_ = prefix.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("pos").alias("pa"),
        "g",
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("pos").alias("pb"),
        F.col("g").alias("g2"),
    )
    t = F.lit(_JACCARD_THRESHOLD)
    # positional filter (PPJoin): common tokens all sit at positions
    # >= (pa, pb) of the FIRST shared prefix token in the global df order,
    # so the intersection is at most min(na-pa, nb-pb)+1; J >= t needs
    # intersection >= t/(1+t)*(na+nb). Exact: for a qualifying pair the
    # first shared token satisfies the bound, and any-token-passes keeps
    # exactly those pairs (later shared tokens only tighten the bound).
    overlap_req = F.lit(_JACCARD_THRESHOLD / (1.0 + _JACCARD_THRESHOLD)) * (
        F.col("na") + F.col("nb")
    )
    ubound = F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")) + 1
    cand = (
        pa_.join(
            pb,
            (F.col("g") == F.col("g2"))
            & (F.col("doc_a") < F.col("doc_b"))
            # size filter: J >= t forces t*na <= nb and t*nb <= na
            & (F.col("nb") >= t * F.col("na"))
            & (F.col("na") >= t * F.col("nb"))
            & (ubound >= overlap_req),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )

    sets = docsets.select("doc_id", "n", "gset")
    out = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n").alias("na"),
                F.col("gset").alias("gs_a"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n").alias("nb"),
                F.col("gset").alias("gs_b"),
            ),
            "doc_b",
        )
        .withColumn("n_shared", F.size(F.array_intersect("gs_a", "gs_b")).cast("long"))
    )
    jac = F.col("n_shared").cast("double") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return out.filter(jac >= _JACCARD_THRESHOLD).select(
        "doc_a",
        "doc_b",
        "n_shared",
        jac.alias("jaccard"),
    )


# --------------------------------------------------------------------------
# dedup_simhash — 16-bit portable SimHash per document
# --------------------------------------------------------------------------


def _simhash_oracle() -> str:
    weights = ", ".join(
        f"SUM(CASE WHEN substr(md5('{j}:' || t), 1, 1) < '8' THEN 1 ELSE -1 END) AS w{j}"
        for j in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"(CASE WHEN w{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        wt AS (SELECT doc_id, {weights} FROM toks GROUP BY doc_id)
        SELECT doc_id, CAST({value} AS BIGINT) AS simhash
        FROM wt
    """


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per distinct token, bit j votes ±1 by whether
    md5('j:'||token) starts below hex '8' (an unbiased portable bit);
    the signature bit is the vote sign. Near-dup docs differ in few bits."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("t")
    )
    weights = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("t"))), 1, 1) < "8",
                    1,
                ).otherwise(-1)
            ).alias(f"w{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    value = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"w{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        value = term if value is None else value + term
    return weights.select("doc_id", value.cast("long").alias("simhash"))


# --------------------------------------------------------------------------
# dedup_cluster_canonical — connected components over the MinHash dup
# pairs: every document in a duplicate cluster gets the cluster's minimum
# doc_id as its canonical representative (the keep-one-per-cluster step a
# training-data pipeline runs after near-dup pair detection).
# --------------------------------------------------------------------------
# Two implementations behind SPARK_GRAFT_CC_IMPL (see
# connected_components):
#
# - 'star' (DEFAULT — the 100-TB shape): alternating large-star /
#   small-star edge contraction (Kiveris et al., "Connected Components
#   in MapReduce and Beyond", ACM SoCC 2014, Alg. 2 "Two-Phase").
#   Large-star points every neighbor LARGER than u at u's neighborhood
#   minimum; small-star does the same for the smaller neighbors. Both
#   are one groupBy(min) + one join per round over the edge list, and
#   the edge set contracts toward per-component stars rooted at the
#   minimum in O(log n) rounds REGARDLESS of diameter — a chain-shaped
#   duplicate cluster (crawl mirrors of mirrors) converges in ~log n
#   rounds where propagation needs ~n (measured: tests/test_dedup_cc.py
#   pins 64-chain rounds star<=10 vs propagation>=32).
#
# - 'propagation': iterative min-label propagation — each round every
#   node takes the min label among itself and its neighbors; converged
#   when no label changes. Rounds = graph diameter; kept as the
#   didactically-simple reference twin.
#
# Both truncate lineage per round with localCheckpoint so the plan does
# not grow exponentially, and the driver-side loop sees only COUNTS,
# never rows. Oracle: exact transitive closure via WITH RECURSIVE on the
# same pairs (implementation-independent ground truth).


def _cluster_oracle() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    sym AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs WHERE is_dup
        UNION
        SELECT doc_b, doc_a FROM pairs WHERE is_dup
    ),
    reach(u, v) AS (
        SELECT u, v FROM sym
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u AND r.u <> s.v
    )
    SELECT u AS doc_id,
           CAST(LEAST(u, MIN(v)) AS BIGINT) AS canonical_id,
           CAST(COUNT(DISTINCT v) + 1 AS BIGINT) AS cluster_size
    FROM reach GROUP BY u
"""


def _cc_propagation(sym: DataFrame) -> tuple[DataFrame, int]:
    """Min-label propagation; ``sym`` holds (u, v) in BOTH directions.
    Returns ((doc_id, label), n_rounds)."""
    labels = sym.select("u").distinct().select(
        F.col("u").alias("doc_id"), F.col("u").alias("label")
    ).localCheckpoint()

    rounds = 0
    while True:
        rounds += 1
        nbr = (
            sym.join(labels, sym.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.doc_id == nbr.u, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels, rounds


def _cc_star(sym: DataFrame) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star contraction (Kiveris et al.
    2014). Edges are kept CANONICAL — distinct (lo, hi) with lo < hi —
    so set-equality (the convergence test) is a plain subtract. Each
    round is two edge rewrites, each one groupBy(min)+join; at the
    fixpoint the edge set is exactly the per-component stars
    {(root, member)}, from which labels read off directly."""
    edges = (
        sym.select(F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = sym.select(F.col("u").alias("doc_id")).distinct().localCheckpoint()

    def large_star(e: DataFrame) -> DataFrame:
        # every neighbor v > u attaches to m(u) = min(u, min of Γ(u))
        nbrs = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        m = nbrs.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("u", "mv").alias("m"))
        return (
            nbrs.join(m, "u")
            .filter(F.col("v") > F.col("u"))  # m <= u < v: canonical, no loops
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # every neighbor v < u (and u itself) attaches to min of the
        # smaller neighborhood; (lo, hi) is already big-end = hi
        nbrs = e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        m = nbrs.groupBy("u").agg(F.min("v").alias("m"))  # m < u
        re_small = (
            nbrs.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
        )
        re_center = m.select(F.col("m").alias("lo"), F.col("u").alias("hi"))
        return re_small.union(re_center).distinct()

    rounds = 0
    n_prev = edges.count()
    while True:
        rounds += 1
        new_edges = small_star(large_star(edges)).localCheckpoint()
        n_new = new_edges.count()
        stable = (
            n_new == n_prev
            and new_edges.subtract(edges).limit(1).count() == 0
        )
        edges, n_prev = new_edges, n_new
        if stable:
            break

    # fixpoint: edges = {(root, member)}; roots never appear as hi
    member_labels = edges.select(
        F.col("hi").alias("doc_id"), F.col("lo").alias("label")
    )
    labels = all_nodes.join(member_labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("label")
    )
    return labels, rounds


def connected_components(
    pairs: DataFrame, impl: str | None = None
) -> tuple[DataFrame, int]:
    """Connected components over an undirected pair list (doc_a, doc_b):
    returns ((doc_id, label) with label = component minimum, n_rounds).
    ``impl``: 'star' (default; O(log n) rounds — see section comment) or
    'propagation' (O(diameter) rounds), also via SPARK_GRAFT_CC_IMPL."""
    import os

    impl = impl or os.environ.get("SPARK_GRAFT_CC_IMPL", "star")
    if impl not in ("star", "propagation"):
        raise ValueError(f"unknown CC impl {impl!r}; use 'star' or 'propagation'")
    sym = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .distinct()
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint()
    )
    return _cc_star(sym) if impl == "star" else _cc_propagation(sym)


@register("dedup_cluster_canonical", oracle=_cluster_oracle())
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, canonical_id, cluster_size) for every document that has at
    least one near-duplicate (jaccard >= threshold per the MinHash+LSH
    pairs); canonical_id = MIN doc_id of the connected dup cluster."""
    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .filter(F.col("is_dup"))
        .select("doc_a", "doc_b")
    )
    labels, _ = connected_components(pairs)
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").cast("long").alias("canonical_id"),
            "cluster_size",
        )
    )
