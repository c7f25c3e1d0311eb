"""Similarity search over the ``embeddings`` table (``array<float>``
column): brute-force cosine top-k as the exact baseline, a
random-hyperplane LSH-bucketed variant as the scale path, and
LSH-bucketed near-duplicate pair detection. North-star extensions
(BASELINE.json).

Float determinism: per-element double products are IEEE-identical across
engines, but double→decimal rounding is NOT (observed 1-ulp differences
vs DuckDB at the 12th decimal). So products are quantized with
FLOOR(p * 1e12) → BIGINT (floor and the *1e12 multiply are exact IEEE ops
in both engines) and summed as integers (exact, order-independent); the
final division and sqrt are correctly-rounded IEEE — cosines then hash
bit-identically against DuckDB.

Scale design (100 TB):
- brute-force: |queries| × |corpus| row expansion with the dot product as
  a single array expression (zip_with+aggregate, no explode, no Python).
  Right for small query sets / reranking; cost is linear scan per query —
  the exact twin of the LSH query. (Measured dead end: the
  posexplode+join+groupBy formulation — codegen'd, mirroring the oracle's
  SQL shape — is ~3× SLOWER here: with only |queries|×|corpus|×dim lambda
  steps the interpreted-HOF cost is small, while the exploded form pays a
  640k-row join + hash aggregate. Second measured dead end: Arrow
  pandas_udf kernels for dot/norm/bucket with identical quantization —
  oracle-green but 2-10× SLOWER at bench SF: fixed Python-worker cost
  dominates these small batches, and a UDF-derived bucket column in the
  join condition defeats the equi-join pushdown (the neardup query
  degenerated to evaluate-per-pair). HOF-vs-explode-vs-kernel is a
  row-count × dim tradeoff, not a rule — cf. the opposite outcome in
  operators/dedup.py; revisit the kernel only with millions of rows per
  partition AND signatures materialized before any join.)
- LSH: each vector hashes to an 8-bit random-hyperplane bucket
  (deterministic md5-sign hyperplanes, no stored model); candidates are
  bucket-equality joins, so comparisons drop ~256× at equal recall for
  near-neighbor workloads. At real scale: partition by bucket → the
  top-k per query runs shuffle-local.
- near-dup pairs: banded LSH (NEARDUP_BANDS bands × r bits, r laddered
  with corpus size so band-bucket occupancy stays ~constant) — candidate
  work ≈ bands·occupancy·n = LINEAR in n, shuffle-local per (band, key);
  the quadratic all-pairs form never materializes and neither does the
  round-8 fixed-8-bit n²/256 (its divisor never grew with n).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sources import load_table, spread_small_input

N_QUERIES = 5  # query set: vec_id < 5
TOP_K = 10
LSH_BITS = 8
NEARDUP_THRESHOLD = 0.35

_SCALE = "1000000000000.0"  # 1e12 quantization for exact integer sums


# --------------------------------------------------------------------------
# Spark-side vector expressions (array-native, no explode)
# --------------------------------------------------------------------------


def dot_dec(a: str, b: str) -> Column:
    """Order-independent dot product of two float arrays, as double."""
    return F.expr(
        f"""(CAST(aggregate(
                zip_with({a}, {b},
                         (x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {_SCALE}) AS BIGINT)),
                CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / {_SCALE})"""
    )


def norm_dec(a: str) -> Column:
    """L2 norm with the same quantized-integer-sum determinism."""
    return F.expr(
        f"""SQRT(CAST(aggregate(
                transform({a}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT)),
                CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / {_SCALE})"""
    )


# --------------------------------------------------------------------------
# DuckDB-side fragments (unnest + generate_subscripts; same decimal rule)
# --------------------------------------------------------------------------

_ELEMS_SQL = """
    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
"""

_NORMS_SQL = f"""
    SELECT vec_id,
           SQRT(CAST(SUM(CAST(FLOOR(x * x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE}) AS nrm
    FROM ({_ELEMS_SQL}) e GROUP BY vec_id
"""


# --------------------------------------------------------------------------
# ann_topk_bruteforce
# --------------------------------------------------------------------------

# exact query×corpus quantized dot products — shared with the kNN
# label-prediction oracle in operators/curation.py
_QUERY_DOTS_SQL = f"""
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
               CAST(SUM(CAST(FLOOR(q.x * d.x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE} AS dot
        FROM elems q JOIN elems d ON q.i = d.i AND q.vec_id <> d.vec_id
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY q.vec_id, d.vec_id
"""

_BRUTE_ORACLE = f"""
    WITH elems AS ({_ELEMS_SQL}),
    norms AS ({_NORMS_SQL}),
    dots AS ({_QUERY_DOTS_SQL}),
    scored AS (
        SELECT t.query_id, t.neighbor_id,
               t.dot / (nq.nrm * nd.nrm) AS cosine
        FROM dots t
        JOIN norms nq ON nq.vec_id = t.query_id
        JOIN norms nd ON nd.vec_id = t.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
"""


@register("ann_topk_bruteforce", oracle=_BRUTE_ORACLE, headline=True)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id < N_QUERIES) by
    full scan: broadcast the query set, one zip_with/aggregate dot product
    per (query, candidate) row, window top-k."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    base = emb.select("vec_id", "embedding", norm_dec("embedding").alias("nrm"))
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = base.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(queries), F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot_dec("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# ann_topk_lsh — random-hyperplane bucketed ANN
# --------------------------------------------------------------------------
# Hyperplane j has ±1 components: sign_ij = +1 iff md5('j:i') begins with a
# hex digit < '8' (i is the 1-based element index) — deterministic, no
# stored model, identical in both engines. The signs depend only on
# (j, i), never on data, so the Spark side bakes them in as LITERAL
# arrays computed once on the driver (Python md5 == SQL md5): the hot
# per-row lambda is then a multiply-add, not 8×dim md5 calls per row
# (measured ~15× on the bucketed near-dup query; the md5-in-lambda form
# also re-evaluated in every pushed-down null filter). The DuckDB oracle
# keeps the md5-in-SQL form, pinning the two derivations against each
# other.

_MAX_DIM = 512  # literal sign vectors cover up to 512-dim embeddings


def _sign(j: int, i: int) -> float:
    import hashlib

    return 1.0 if hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0] < "8" else -1.0


_SIGNS_NP_CACHE: dict[int, "object"] = {}


def _signs_np(j: int):
    """512-element ±1.0 float64 vector for hyperplane j (cached)."""
    import numpy as np

    arr = _SIGNS_NP_CACHE.get(j)
    if arr is None:
        arr = np.asarray(
            [_sign(j, i) for i in range(1, _MAX_DIM + 1)], dtype=np.float64
        )
        _SIGNS_NP_CACHE[j] = arr
    return arr


def _proj_expr(j: int) -> Column:
    """Quantized hyperplane-j projection of ``embedding`` as double —
    aggregate(zip_with(embedding, signs_j, FLOOR((x*s)*1e12)::BIGINT)).

    The sign vector is bound as ONE ``Literal`` array node
    (``F.lit(ndarray)``) instead of the former 512-child ``array(...)``
    SQL text: the values and per-row arithmetic are identical, but the
    expression tree shrinks ~500× per hyperplane, which collapsed the
    analyzer/optimizer cost that dominated the COLD wall of every
    banded/bucketed query (measured: embedding_neardup_pairs DataFrame
    build 9.5 s → sub-second at sf0.1; see OPTIMIZATION_r14.md)."""
    sgn = F.lit(_signs_np(j))
    prods = F.zip_with(
        "embedding",
        F.slice(sgn, F.lit(1), F.size("embedding")),
        lambda x, s: F.floor(x.cast("double") * s * F.lit(float(_SCALE))).cast(
            "long"
        ),
    )
    return F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, v: acc + v
    ).cast("double")


def _projs_sql(total: int) -> str:
    """SQL text computing array<long> of the quantized projections for
    hyperplanes 0..total-1 in ONE expression over ``embedding``:
    element j = SUM_i FLOOR((x_i·s_ij)·1e12)::BIGINT — the exact
    per-element arithmetic and int64 sum of :func:`_proj_expr`, computed
    for all hyperplanes in a single pass.

    r14 bound each hyperplane's signs as its own ``F.lit(ndarray)``
    Literal, but kept one (zip_with + aggregate) HOF pair PER hyperplane
    — and the r15 interleaved probe showed the remaining cost was
    driver-side COLUMN CONSTRUCTION (pyspark walks lit() values and HOF
    lambdas over py4j node by node): 3.2 s of build per
    embedding_neardup_pairs call against 0.7 s of exec; the build WAS
    the query. SQL text parses in ONE py4j call (~20 ms for the
    12k-element sign matrix), the sign matrix rides as one flattened
    array of ±1D literals (element-major: flat[(i-1)·total + j] = sign
    of hyperplane j at element i) that the optimizer constant-folds to a
    single array Literal, and an index-aware transform slices each
    element's sign row out of it. Per-bit values are unchanged (int64
    sums are order-free and each element op is the same IEEE sequence);
    pinned against the per-bit forms by
    tests/test_scaleops.py::test_band_keys_compact_equals_per_bit."""
    import numpy as np

    flat = np.stack([_signs_np(j) for j in range(total)], axis=1).ravel()
    sgn = "array(" + ",".join("1D" if v > 0 else "-1D" for v in flat) + ")"
    return (
        f"aggregate("
        f"transform(embedding, (x, i) -> transform("
        f"slice({sgn}, i * {total} + 1, {total}), "
        f"s -> CAST(FLOOR(CAST(x AS DOUBLE) * s * {_SCALE}D) AS BIGINT))), "
        f"array_repeat(0L, {total}), "
        f"(acc, row) -> zip_with(acc, row, (a, b) -> a + b))"
    )


def _bkey_sql(ps: str, lo: int, bits: int) -> str:
    """SQL text for the ``bits``-wide key from projections ``ps[lo..]``:
    bit b set iff ps[lo+b] >= 0 — the same when(proj >= 0, 1<<bit) sum
    as the per-bit forms, as one zip_with/aggregate over the bound
    array (NULL projections contribute 0 on both forms)."""
    weights = "array(" + ",".join(f"{1 << b}L" for b in range(bits)) + ")"
    return (
        f"CAST(aggregate(zip_with(slice({ps}, {lo + 1}, {bits}), {weights}, "
        f"(p, w) -> IF(p >= 0, w, 0L)), 0L, (acc, v) -> acc + v) AS BIGINT)"
    )


def _bucket_expr_spark() -> Column:
    """8-bit LSH bucket id — the let-binding transform-over-singleton
    idiom evaluates the shared projection array once per row."""
    return F.expr(
        f"element_at(transform(array({_projs_sql(LSH_BITS)}), "
        f"ps -> {_bkey_sql('ps', 0, LSH_BITS)}), 1)"
    )


def _bucket_sql() -> str:
    projs = []
    for j in range(LSH_BITS):
        proj = (
            f"CAST(SUM(CAST(FLOOR((CASE WHEN substr(md5('{j}:' || CAST(i AS VARCHAR)), 1, 1) < '8' "
            f"THEN x ELSE -x END) * {_SCALE}) AS BIGINT)) AS DOUBLE)"
        )
        projs.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(projs)


_LSH_ORACLE = f"""
    WITH elems AS ({_ELEMS_SQL}),
    norms AS ({_NORMS_SQL}),
    buckets AS (
        SELECT vec_id, CAST({_bucket_sql()} AS BIGINT) AS bucket
        FROM elems GROUP BY vec_id
    ),
    dots AS (
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
               CAST(SUM(CAST(FLOOR(q.x * d.x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE} AS dot
        FROM elems q JOIN elems d ON q.i = d.i AND q.vec_id <> d.vec_id
        JOIN buckets bq ON bq.vec_id = q.vec_id
        JOIN buckets bd ON bd.vec_id = d.vec_id AND bd.bucket = bq.bucket
        WHERE q.vec_id < {N_QUERIES}
        GROUP BY q.vec_id, d.vec_id
    ),
    scored AS (
        SELECT t.query_id, t.neighbor_id, b.bucket,
               t.dot / (nq.nrm * nd.nrm) AS cosine
        FROM dots t
        JOIN buckets b ON b.vec_id = t.query_id
        JOIN norms nq ON nq.vec_id = t.query_id
        JOIN norms nd ON nd.vec_id = t.neighbor_id
    )
    SELECT query_id, neighbor_id, bucket, cosine, rk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
"""


@register("ann_topk_lsh", oracle=_LSH_ORACLE, headline=True)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: 8-bit random-hyperplane signature per vector; each
    query only scans its own bucket (≈ |corpus|/256 candidates), then
    exact cosine top-k within the bucket."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    base = emb.select(
        "vec_id",
        "embedding",
        norm_dec("embedding").alias("nrm"),
        _bucket_expr_spark().alias("bucket"),
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = base.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.col("q_bucket").alias("bucket"),
        (dot_dec("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "bucket", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# embedding_neardup_pairs — BANDED-LSH cosine near-duplicate pairs
# --------------------------------------------------------------------------
# Round-9 rewrite (the r8 verdict's named scale hazard): the old form
# used ONE fixed 8-bit signature, so Σ|bucket|² ≈ n²/256 — quadratic in
# n with a constant divisor, a scale-killer at 100 TB. Now the
# signature is NEARDUP_BANDS independent bands of r hyperplane bits
# each, minhash-LSH style (operators/dedup.py:267 is the sibling):
# a pair is a candidate when ANY band's r bits all agree, candidates
# are deduped per pair (n_bands = how many bands agreed), and the exact
# quantized cosine verifies each candidate. The band width r GROWS with
# the corpus — the minimal r with n ≤ NEARDUP_TARGET_BUCKET·2^r (an
# integer ladder, bit-identical in both engines; no float log) — so
# expected bucket occupancy stays ≤ ~64 and per-band pair work stays
# ≈ 64·n = LINEAR in n. Banding (vs one wider signature) is what keeps
# recall from collapsing as r grows: P(candidate) = 1-(1-p^r)^b with
# p = 1-θ/π per hyperplane, the standard s-curve — near-dups at
# cosine 0.9 keep several collision chances while random pairs get
# r more bits to disagree in. Hyperplane j = band·r + bit reuses the
# md5-sign scheme (Python literal arrays == SQL md5, pinned against
# each other). At real scale the band self-join shuffles by
# (band, key): shuffle-local pairing, signature-only rows (embeddings
# join back in per-candidate, never per-band).

NEARDUP_BANDS = 4
NEARDUP_TARGET_BUCKET = 64  # expected band-bucket occupancy the ladder holds
_NEARDUP_MAX_R = 24


def neardup_band_bits(n: int) -> int:
    """Minimal r ≥ 6 with n ≤ NEARDUP_TARGET_BUCKET·2^r (capped at
    _NEARDUP_MAX_R) — pure integer ladder, mirrored literally in the
    oracle's CASE so both engines derive the same width from the same
    count with no float log anywhere."""
    r = 6
    while n > (NEARDUP_TARGET_BUCKET << r) and r < _NEARDUP_MAX_R:
        r += 1
    return r


_NEARDUP_R_SQL = (
    "CASE "
    + " ".join(
        f"WHEN cnt <= {NEARDUP_TARGET_BUCKET << r} THEN {r}"
        for r in range(6, _NEARDUP_MAX_R)
    )
    + f" ELSE {_NEARDUP_MAX_R} END"
)

_NEARDUP_ORACLE = f"""
    WITH elems AS ({_ELEMS_SQL}),
    norms AS ({_NORMS_SQL}),
    params AS (
        SELECT {_NEARDUP_R_SQL} AS r
        FROM (SELECT COUNT(*) AS cnt FROM embeddings)
    ),
    dims AS (
        SELECT gb.band, gr.bit, p.r
        FROM params p,
             generate_series(0, {NEARDUP_BANDS - 1}) AS gb(band),
             generate_series(0, {_NEARDUP_MAX_R - 1}) AS gr(bit)
        WHERE gr.bit < p.r
    ),
    projs AS (
        SELECT e.vec_id, d.band, d.bit,
               CASE WHEN CAST(SUM(CAST(FLOOR(
                        (CASE WHEN substr(md5(CAST(d.band * d.r + d.bit AS VARCHAR)
                                           || ':' || CAST(e.i AS VARCHAR)), 1, 1) < '8'
                              THEN e.x ELSE -e.x END) * {_SCALE})
                    AS BIGINT)) AS DOUBLE) >= 0 THEN 1 ELSE 0 END AS sgn
        FROM elems e CROSS JOIN dims d
        GROUP BY e.vec_id, d.band, d.bit
    ),
    keys AS (
        SELECT vec_id, band,
               SUM(sgn * (CAST(1 AS BIGINT) << bit)) AS bkey
        FROM projs GROUP BY vec_id, band
    ),
    cand AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(COUNT(*) AS BIGINT) AS n_bands
        FROM keys a JOIN keys b
          ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    dots AS (
        SELECT c.vec_a, c.vec_b, c.n_bands,
               CAST(SUM(CAST(FLOOR(a.x * b.x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE} AS dot
        FROM cand c
        JOIN elems a ON a.vec_id = c.vec_a
        JOIN elems b ON b.vec_id = c.vec_b AND b.i = a.i
        GROUP BY c.vec_a, c.vec_b, c.n_bands
    )
    SELECT d.vec_a, d.vec_b, d.n_bands, d.dot / (na.nrm * nb.nrm) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.vec_a
    JOIN norms nb ON nb.vec_id = d.vec_b
    WHERE d.dot / (na.nrm * nb.nrm) >= {NEARDUP_THRESHOLD}
      AND na.nrm > 0 AND nb.nrm > 0
"""
# The nrm > 0 predicate (round 11): cosine of a zero-norm vector is
# undefined (0/0 = NaN), and the engines disagreed on NaN pairs — the
# JVM/DuckDB comparison keeps NaN >= threshold while the numpy kernel
# drops it, so the operator's output was PATH-dependent on that input
# class. Zero vectors are now excluded identically in the oracle and in
# every Spark plan (batch JVM join, batch Arrow kernel, streaming
# verify), making all paths value-identical on the full input domain
# (pinned by tests/test_scaleops.py::test_zero_norm_vectors_excluded_
# on_both_paths).


# HOF-vs-kernel crossover for the signature computation: the literal-
# array zip_with/aggregate form wins at fixture scale (no Python worker,
# no Arrow transfer), but its per-element interpreted cost dominates at
# lane scale — the ann2m lane measured the 2M-vector signature pass at
# 681 s (60 hyperplanes × 64 dims × 2M rows of HOF lambda steps). Above
# _KERNEL_MIN_ROWS the band keys come from an Arrow-batched numpy
# kernel instead: FLOOR((x·s)·1e12) summed in int64 is the SAME exact
# integer arithmetic (float64 ops are IEEE-identical, the sum is
# integer), so the two paths are bit-equal — pinned by
# tests/test_scaleops.py::test_neardup_kernel_equals_hof and by the
# lane running the kernel against the md5-in-SQL oracle derivation.
_KERNEL_MIN_ROWS = 100_000


def _band_keys_kernel(r: int):
    """Arrow pandas_udf: embedding → array<long> of NEARDUP_BANDS band
    keys (hyperplane j = band·r + bit, same md5 signs, same quantized
    projection as :func:`_band_key_expr`)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    total = NEARDUP_BANDS * r
    S = np.array(
        [[_sign(j, i) for i in range(1, _MAX_DIM + 1)] for j in range(total)]
    )
    scale = float(_SCALE.rstrip("D"))

    @pandas_udf("array<long>")
    def keys(emb: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series([], dtype=object)
        arrs = emb.to_numpy()
        # The HOF twin slices the sign vector to size(embedding), so
        # ragged batches are in-domain: group rows by dimension and
        # vectorize within each group (one group in the fixed-dim
        # corpora — zero extra cost there).
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
        out = np.zeros((n, NEARDUP_BANDS), dtype=np.int64)
        for d in np.unique(lens):
            idx = np.nonzero(lens == d)[0]
            X = np.stack(arrs[idx]).astype(np.float64)
            for j in range(total):
                # ((x * s) * 1e12) floored — the HOF's exact op order;
                # every step is an IEEE double op, the sum is exact int64
                p = (
                    np.floor((X * S[j, :d]) * scale)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                band, bit = divmod(j, r)
                out[idx, band] |= (p >= 0).astype(np.int64) << bit
        return pd.Series(list(out))

    return keys


# Coarse group count for the bucket-grouped verify: all rows of a
# (band, bkey) bucket must reach ONE kernel call, but 125k tiny
# applyInPandas groups would pay per-group pandas overhead — so buckets
# are packed ~30 per coarse group and the kernel iterates bucket runs
# with numpy slicing. 4096 groups over 32 cores keeps every core busy
# ~128 groups deep (skew in one coarse group amortizes).
_VERIFY_GROUPS = 4096


def _bucket_verify_frame(banded: DataFrame) -> DataFrame:
    """Bucket-grouped exact-cosine verify: ``banded`` carries one row
    per (vec_id, embedding, nrm, band, bkey) signature membership;
    returns (vec_a, vec_b, cosine) with cosine >= NEARDUP_THRESHOLD,
    ONE ROW PER AGREEING BAND (the caller's pair-dedup groupBy turns
    the duplication into n_bands, exactly like the join path).

    Why this shape: the r9 plan materialized every candidate PAIR
    (4n-row self-join -> 480.8M probe rows at 2M vectors) and priced
    each with the interpreted DECIMAL HOF — 218 of the 251 s wall; an
    Arrow per-pair kernel moves the arithmetic to numpy but still
    ships ~2 x 480M arrays through Arrow (measured: no win). Here each
    bucket's m vectors cross Arrow ONCE (4n rows total) and the m^2
    quantized dots run as chunked numpy broadcasting — the same
    FLOOR((x*y)*1e12) int64-sum arithmetic as dot_dec, bit-equal
    (pinned by tests/test_scaleops.py::test_neardup_bucket_verify_
    equals_join). Pairs with mismatched dims are dropped, mirroring
    zip_with's null-pad -> NULL dot -> failed threshold. Norms ride in
    from the JVM norm_dec column, so cosine = dot / (nrm_a * nrm_b)
    is the identical op sequence. (Domain note: a zero-norm vector
    would make the division NaN, which numpy's >= drops but Spark SQL's
    NaN comparison would keep — since round 11 zero-norm rows are
    excluded upstream in EVERY path, oracle included, so the two plans
    are value-identical on the full input domain.)"""
    import numpy as np

    scale = float(_SCALE.rstrip("D"))

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy()
        embs = pdf["embedding"].to_numpy()
        nrms = pdf["nrm"].to_numpy().astype(np.float64)
        band = pdf["band"].to_numpy()
        bkey = pdf["bkey"].to_numpy()
        lens = np.fromiter((len(e) for e in embs), dtype=np.int64, count=n)
        # bucket runs = maximal (band, bkey, dim) groups, vec_id-sorted
        # inside each so emitted pairs are (smaller, larger)
        order = np.lexsort((ids, lens, bkey, band))
        band, bkey, lens, ids, nrms = (
            band[order], bkey[order], lens[order], ids[order], nrms[order]
        )
        embs = embs[order]
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (
            (band[1:] != band[:-1])
            | (bkey[1:] != bkey[:-1])
            | (lens[1:] != lens[:-1])
        )
        starts = np.nonzero(new_run)[0]
        ends = np.append(starts[1:], n)
        out_a: list = []
        out_b: list = []
        out_c: list = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            d = int(lens[s])
            X = np.stack(embs[s:e]).astype(np.float64)
            nr = nrms[s:e]
            gid = ids[s:e]
            # chunked m x m quantized-dot matrix, keep upper triangle
            chunk = max(1, 2_000_000 // max(1, m * d))
            for c0 in range(0, m - 1, chunk):
                c1 = min(c0 + chunk, m - 1)
                q = (
                    np.floor(X[c0:c1, None, :] * X[None, :, :] * scale)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                dotd = q.astype(np.float64) / scale
                cos = dotd / (nr[c0:c1, None] * nr[None, :])
                ii, jj = np.nonzero(cos >= NEARDUP_THRESHOLD)
                keep = (c0 + ii) < jj
                ii, jj = ii[keep], jj[keep]
                if len(ii):
                    out_a.append(gid[c0 + ii])
                    out_b.append(gid[jj])
                    out_c.append(cos[ii, jj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    grouped = banded.withColumn(
        "vg", F.pmod(F.hash("band", "bkey"), F.lit(_VERIFY_GROUPS))
    )
    return grouped.groupBy("vg").applyInPandas(
        verify, "vec_a long, vec_b long, cosine double"
    )


def band_keys_array(r: int, n_rows: int) -> Column:
    """array<long> of the NEARDUP_BANDS band keys for the ``embedding``
    column — HOF literal-array form below _KERNEL_MIN_ROWS, Arrow numpy
    kernel above (bit-equal; see crossover comment).

    The HOF form computes all NEARDUP_BANDS·r projections with ONE
    :func:`_projs_sql` (let-bound so the heavy subtree appears and
    evaluates once) and derives each band's r-bit key from its slice —
    value-identical to the per-bit :func:`_band_key_expr` chain (pinned
    by tests/test_scaleops.py::test_band_keys_compact_equals_per_bit)
    but ~r·NEARDUP_BANDS× smaller as an expression tree, which is what
    the per-chained-op analyzer cost scales with."""
    if n_rows >= _KERNEL_MIN_ROWS:
        return _band_keys_kernel(r)(F.col("embedding"))
    bkeys = ",".join(
        _bkey_sql("ps", b * r, r) for b in range(NEARDUP_BANDS)
    )
    return F.expr(
        f"element_at(transform(array({_projs_sql(NEARDUP_BANDS * r)}), "
        f"ps -> array({bkeys})), 1)"
    )


def _band_key_expr(band: int, r: int) -> Column:
    """r-bit band key from hyperplanes band·r .. band·r+r-1 (Literal
    sign arrays; same quantized projection as _bucket_expr_spark)."""
    projs = []
    for bit in range(r):
        j = band * r + bit
        proj = _proj_expr(j)
        projs.append(F.when(proj >= 0, F.lit(1 << bit)).otherwise(F.lit(0)))
    out = projs[0]
    for p in projs[1:]:
        out = out + p
    return out.cast("long")


@register("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE, headline=True)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the FULL corpus (see
    section comment): candidates = pairs agreeing on ALL bits of ANY of
    the NEARDUP_BANDS r-bit hyperplane bands (r laddered with corpus
    size so per-band buckets stay ~NEARDUP_TARGET_BUCKET), verified by
    exact quantized cosine ≥ NEARDUP_THRESHOLD. n_bands counts the
    agreeing bands per emitted pair."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    # One count job prices the band-width ladder; at real scale this is
    # a parquet-footer count, not a data scan.
    n_rows = emb.count()
    r = neardup_band_bits(n_rows)
    # zero-norm vectors excluded on every path (see oracle note): their
    # cosine is undefined and the JVM/numpy NaN conventions differ
    base = emb.select(
        "vec_id", "embedding", norm_dec("embedding").alias("nrm")
    ).filter(F.col("nrm") > 0)
    # Embeddings RIDE the band explode (4n signature rows carrying the
    # array), the self-join is keyed (band, bkey), and the cosine is a
    # map-side projection on the streamed join output — probe rows are
    # never sorted or shuffled with arrays attached. The first shape of
    # this rewrite deduped id-only pairs FIRST and joined the arrays
    # back per side: each join re-sorted tens of millions of
    # array-laden rows and spilled the disk dry at the 200k lane
    # (UnsafeExternalSorter, no-space-left) — here the only array sorts
    # are the 4n-row join SIDES, and the pair-dedup shuffle carries
    # near-DUPS (post-threshold skinny rows), not candidates.
    banded = base.select(
        "vec_id",
        "embedding",
        "nrm",
        F.posexplode(band_keys_array(r, n_rows)).alias("band", "bkey"),
    )
    if n_rows >= _KERNEL_MIN_ROWS:
        # bucket-grouped verify: each bucket's vectors cross Arrow once
        # and the pairwise quantized dots run inside numpy — the pair
        # set is never materialized as rows (the r9 join shape's 480.8M
        # probe rows cost 218 of the 251 s 2M wall no matter where the
        # per-pair dot ran; see _bucket_verify_frame)
        scored = _bucket_verify_frame(banded)
    else:
        # graded path: pure-JVM self-join + DECIMAL HOF (no Python
        # worker at fixture scale)
        right = banded.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            F.col("nrm").alias("nrm_b"),
            "band",
            "bkey",
        )
        probes = banded.withColumnRenamed("vec_id", "vec_a").join(
            right, ["band", "bkey"]
        ).filter(F.col("vec_a") < F.col("vec_b"))
        cos = dot_dec("embedding", "emb_b") / (F.col("nrm") * F.col("nrm_b"))
        scored = probes.select("vec_a", "vec_b", cos.alias("cosine")).filter(
            F.col("cosine") >= NEARDUP_THRESHOLD
        )
    # a pair agreeing in k bands was scored k times with the identical
    # quantized cosine; count the bands, keep one value
    return scored.groupBy("vec_a", "vec_b").agg(
        F.count("*").cast("long").alias("n_bands"),
        F.min("cosine").alias("cosine"),
    ).select("vec_a", "vec_b", "n_bands", "cosine")


# --------------------------------------------------------------------------
# embedding_quantize_int8 — symmetric per-vector int8 quantization audit
# (the embedding-compression step of a training-data pipeline): scale =
# max|x| / 127, q_i = round-half-up(x_i / scale), and the reported
# max_abs_err is the worst per-element reconstruction error |q_i*scale -
# x_i|. Rounding is FLOOR(v + 0.5) — not ROUND(), whose half-even vs
# half-away behavior differs between engines — so Spark and DuckDB agree
# bit-for-bit (all other ops are single IEEE multiplies/divides).
# --------------------------------------------------------------------------

_QUANT_ORACLE = """
    WITH elems AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
    ),
    scales AS (
        SELECT vec_id, MAX(ABS(x)) / 127 AS scale FROM elems GROUP BY vec_id
    )
    SELECT e.vec_id, s.scale,
           MAX(ABS(CASE WHEN s.scale = 0 THEN 0 - x
                        ELSE FLOOR(x / s.scale + 0.5) * s.scale - x END))
               AS max_abs_err
    FROM elems e JOIN scales s ON s.vec_id = e.vec_id
    GROUP BY e.vec_id, s.scale
"""


@register("embedding_quantize_int8", oracle=_QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, max_abs_err) per embedding under symmetric int8
    quantization. One pass per row: two array expressions (max-abs, then
    max reconstruction error against the derived scale) — map-side only,
    no shuffle, no Python; at 100 TB this runs at scan speed."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    scale = F.expr(
        "array_max(transform(embedding, v -> ABS(CAST(v AS DOUBLE)))) / 127"
    )
    out = emb.select("vec_id", scale.alias("scale"), F.col("embedding"))
    err = F.expr(
        """array_max(transform(embedding,
               v -> ABS(CASE WHEN scale = 0 THEN 0 - CAST(v AS DOUBLE)
                        ELSE FLOOR(CAST(v AS DOUBLE) / scale + 0.5) * scale
                             - CAST(v AS DOUBLE) END)))"""
    )
    return out.select("vec_id", "scale", err.alias("max_abs_err"))
