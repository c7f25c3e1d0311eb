"""IVF-style cell-probed ANN over the ``embeddings`` table — the
inverted-file counterpart of ``ann_topk_lsh`` (SURVEY §2 extensions name
"an IVF or LSH-bucketed variant" as the ANN scale path; this adds the
IVF side so both canonical bucketing families are covered).

Structure (classic IVF, e.g. Jégou et al., "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011 — coarse quantizer only, no
PQ compression):

1. pick ``IVF_K`` seed vectors as cell centers;
2. assign every corpus vector to its nearest seed (argmax cosine) — the
   inverted lists;
3. per query, probe the ``IVF_NPROBE`` nearest cells and run exact
   cosine top-k over only those cells' members (≈ nprobe/k of the
   corpus scanned per query instead of all of it).

Determinism / oracle: production IVF trains k-means centroids — a
stored model the SQL oracle could not reproduce. Here the seeds are the
``IVF_K`` corpus vectors with the smallest ``md5(vec_id)`` (a
deterministic hash-rank "sample"; Spark md5 == DuckDB md5), so cell
assignment, probing, and ranking are bit-reproducible in both engines:
cosines reuse the quantized-integer dot products from
``operators/similarity.py``, making every comparison (argmax, top-k)
operate on bit-identical doubles.

Scale design (100 TB): seed selection sorts only (vec_id, md5) pairs —
never embeddings; with trained centroids this stage disappears
entirely. Assignment is a broadcast join (k vectors ≈ MBs even at
k=√n for billions of rows) + a per-vector argmax window keyed by
vec_id — the n×k expansion is bounded and map-local per vector. The
candidate join shuffles by cell id, so each probed cell's exact scan is
shuffle-local, exactly like the LSH bucket join. Swapping hash-rank
seeds for pyspark.ml KMeans centroids changes ONE dataframe (``seeds``)
and nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.operators.similarity import (
    _ELEMS_SQL,
    _NORMS_SQL,
    _SCALE,
    N_QUERIES,
    TOP_K,
    dot_dec,
    norm_dec,
)
from example_beam_spark.registry import register
from example_beam_spark.sources import load_table, spread_small_input

IVF_K = 16  # seed cells (≈√n at this SF; production: trained centroids)
IVF_NPROBE = 3

_SEED_IDS_SQL = f"""
    SELECT vec_id FROM (
        SELECT vec_id, ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS srk
        FROM embeddings
    ) WHERE srk <= {IVF_K}
"""

_IVF_ORACLE = f"""
    WITH elems AS ({_ELEMS_SQL}),
    norms AS ({_NORMS_SQL}),
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
    cells AS (SELECT vec_id, seed_id AS cell FROM ranked WHERE crk = 1),
    probes AS (
        SELECT vec_id AS query_id, seed_id AS cell FROM ranked
        WHERE vec_id < {N_QUERIES} AND crk <= {IVF_NPROBE}
    ),
    dots AS (
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, p.cell,
               CAST(SUM(CAST(FLOOR(q.x * d.x * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE} AS dot
        FROM elems q
        JOIN probes p ON p.query_id = q.vec_id
        JOIN cells c ON c.cell = p.cell
        JOIN elems d ON d.vec_id = c.vec_id AND d.i = q.i AND d.vec_id <> q.vec_id
        GROUP BY q.vec_id, d.vec_id, p.cell
    ),
    scored AS (
        SELECT t.query_id, t.neighbor_id, t.cell,
               t.dot / (nq.nrm * nd.nrm) AS cosine
        FROM dots t
        JOIN norms nq ON nq.vec_id = t.query_id
        JOIN norms nd ON nd.vec_id = t.neighbor_id
    )
    SELECT query_id, neighbor_id, cell, cosine, rk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
"""


def seed_scores(base: DataFrame) -> DataFrame:
    """(vec_id, seed_id, cos_seed, crk) for every corpus vector × seed —
    crk=1 is the vector's cell; crk<=nprobe are a query's probe cells.
    ``base`` must carry (vec_id, embedding, nrm)."""
    # seed selection is a top-K cut on (md5, vec_id) — orderBy+limit
    # compiles to TakeOrderedAndProject (per-partition K-heaps), never a
    # global rank window (round-11: the previous row_number form ran one
    # single-task sort of every vec_id); embeddings join in after
    seed_ids = (
        base.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(IVF_K)
    )
    seeds = F.broadcast(
        base.join(seed_ids, "vec_id").select(
            F.col("vec_id").alias("seed_id"),
            F.col("embedding").alias("s_emb"),
            F.col("nrm").alias("s_nrm"),
        )
    )
    seed_cos = base.join(seeds).select(
        "vec_id",
        "seed_id",
        (dot_dec("embedding", "s_emb") / (F.col("nrm") * F.col("s_nrm"))).alias("cos_seed"),
    )
    crk = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("cos_seed"), "seed_id")
    )
    return seed_cos.withColumn("crk", crk)


@register("ann_topk_ivf", oracle=_IVF_ORACLE)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-probed ANN: assign every vector to its nearest of IVF_K seed
    cells, probe the IVF_NPROBE nearest cells per query, exact cosine
    top-k within the probed cells only."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    base = emb.select("vec_id", "embedding", norm_dec("embedding").alias("nrm"))

    ranked = seed_scores(base)
    cells = ranked.filter(F.col("crk") == 1).select(
        "vec_id", F.col("seed_id").alias("cell")
    )
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crk") <= IVF_NPROBE)
    ).select(F.col("vec_id").alias("query_id"), F.col("seed_id").alias("cell"))

    # exact cosine over probed cells only — shuffle keyed by cell
    members = cells.join(
        base.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            F.col("nrm").alias("n_nrm"),
        ),
        cells.vec_id == F.col("neighbor_id"),
    ).select("neighbor_id", "cell", "n_emb", "n_nrm")
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cands = (
        members.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(queries), "query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        "cell",
        (dot_dec("q_emb", "n_emb") / (F.col("q_nrm") * F.col("n_nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cell", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# ann_topk_lsh_multiprobe — multi-probe LSH (the recall fix for top-k)
# --------------------------------------------------------------------------
# Measured (tools/stress_lane.py ann_recall): the single-bucket 8-bit
# sign-LSH of ann_topk_lsh has recall@10 = 0.0 for GENERAL top-k on this
# corpus — its bucket-equality candidates are built for near-duplicate
# retrieval (cosine >= threshold pairs collide with high probability),
# not for ranking isotropic-noise neighbors whose cosines (~0.4) agree
# on all 8 bits with probability ~(1 - acos(0.4)/pi)^8 ~ 2.5%. The
# standard fix (Lv et al., "Multi-Probe LSH", VLDB 2007) probes nearby
# buckets too: all 1+8+28 = 37 buckets within Hamming distance <= 2,
# i.e. ~14% of the corpus per query, recovering recall comparable to
# IVF at similar scan fractions while keeping the bucket join shape.

_PROBE_MASKS = [0] + [1 << j for j in range(8)] + [
    (1 << i) | (1 << j) for i in range(8) for j in range(i + 1, 8)
]

_MASKS_SQL = ", ".join(f"({m})" for m in _PROBE_MASKS)

_MULTIPROBE_ORACLE = f"""
    WITH elems AS ({{elems}}),
    norms AS ({{norms}}),
    buckets AS (
        SELECT vec_id, CAST({{bucket}} AS BIGINT) AS bucket
        FROM elems GROUP BY vec_id
    ),
    probes AS (
        SELECT b.vec_id AS query_id, xor(b.bucket, m.mask) AS bucket
        FROM buckets b CROSS JOIN (VALUES {_MASKS_SQL}) AS m(mask)
        WHERE b.vec_id < {{nq}}
    ),
    dots AS (
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
               CAST(SUM(CAST(FLOOR(q.x * d.x * {{scale}}) AS BIGINT)) AS DOUBLE) / {{scale}} AS dot
        FROM elems q
        JOIN probes p ON p.query_id = q.vec_id
        JOIN buckets bd ON bd.bucket = p.bucket
        JOIN elems d ON d.vec_id = bd.vec_id AND d.i = q.i AND d.vec_id <> q.vec_id
        GROUP BY q.vec_id, d.vec_id
    ),
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
    ) WHERE rk <= {{topk}}
"""


def _multiprobe_oracle() -> str:
    from example_beam_spark.operators.similarity import _bucket_sql

    return _MULTIPROBE_ORACLE.format(
        elems=_ELEMS_SQL,
        norms=_NORMS_SQL,
        bucket=_bucket_sql(),
        nq=N_QUERIES,
        scale=_SCALE,
        topk=TOP_K,
    )


@register("ann_topk_lsh_multiprobe", oracle=_multiprobe_oracle())
def ann_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: each query scans the 37 hyperplane buckets
    within Hamming distance <= 2 of its own (~14% of a uniform corpus),
    exact cosine top-k over those candidates. Same bucket-equality join
    shape as ann_topk_lsh — shuffle keyed by bucket — with a 37-row
    probe fan-out per query instead of 1."""
    from example_beam_spark.operators.similarity import _bucket_expr_spark

    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    base = emb.select(
        "vec_id",
        "embedding",
        norm_dec("embedding").alias("nrm"),
        _bucket_expr_spark().alias("bucket"),
    )
    masks = F.array(*[F.lit(m) for m in _PROBE_MASKS])
    probes = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(masks).alias("mask"),
            F.col("bucket").alias("q_bucket"),
        )
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            F.col("q_bucket").bitwiseXOR(F.col("mask")).alias("probe_bucket"),
        )
    )
    cands = base.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe_bucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cands.select(
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
# ann_topk_ivf_trained — IVF with TRAINED centroids (the production
# operating point; the hash-seed entry above stays as the oracle twin)
# --------------------------------------------------------------------------
# Swaps the deterministic hash-rank seeds for spherical k-means
# centroids (pyspark.ml.clustering.KMeans over L2-normalized vectors, so
# Euclidean argmin ≡ cosine argmax) — exactly the ONE-dataframe change
# the module header promises. A trained coarse quantizer aligns cells
# with the data's real neighborhood structure, which is what turns IVF
# from "scans 19% for recall 0.58" (hash seeds on isotropic noise — see
# NOTES 'ANN recall measurements') into a production operating point:
# on the planted-neighborhood corpus (tools/planted.py) this reaches
# recall@10 >= 0.8 while scanning <= 5% of the corpus per query
# (k=80 cells, nprobe=3 → 3/80 ≈ 3.75% at balanced cells, ~4.5% with
# realistic cell-size skew; measured by tests/test_ann_trained.py and
# the stress lane's recall table — recall@10 = 1.0 there).
#
# Oracle note: a trained model is a fitted artifact SQL cannot
# reproduce, so this entry is registered WITHOUT a value oracle (the
# driver records a rows-only check — the documented weaker gate); its
# quality gate is the measured recall/scan table instead, and
# ``ann_topk_ivf`` keeps the bit-exact DuckDB oracle for the shared
# probe/scan machinery.
#
# 100-TB design: training runs on a bounded sample (KMEANS_SAMPLE rows —
# a coarse quantizer needs only a sketch of the density), the fitted
# centroids are k×dim doubles broadcast to every executor (MBs even at
# k=√n for billions of rows), and cell assignment is a broadcast-centers
# GEMM over Arrow batches (mapInPandas): each batch does one X @ Cᵀ and
# an argmax/argpartition in BLAS — no shuffle, no per-row work. The
# declarative alternative (broadcast join + per-vector argmax window,
# the seeded path's shape) expands to n×k rows each paying an
# interpreted higher-order-function dot: measured 541 s at 200k vectors
# / k=80 on local[32] (stress lane, r8) vs seconds for the GEMM — the
# one place SURVEY §7's "vectorized pandas where built-ins can't express
# it efficiently" rule applies to a registered ANN entry. The
# probed-cell exact scan still shuffles by cell id so each cell's work
# is shuffle-local.

IVF_TRAINED_K = 80  # legacy fixed operating point (explicit callers only)
IVF_TRAINED_NPROBE = 3
KMEANS_SEED = 20260814
KMEANS_MAXITER = 10  # coarse quantizer: convergence past ~10 iters buys nothing
KMEANS_SAMPLE = 100_000  # training-sample cap: coarse quantizer, not a fit

# Adaptive coarse-quantizer sizing (round-11 verdict #1): a FIXED k
# means cells grow linearly with the corpus — the repo's own 2M lane
# measured recall@10 = 0.76 at k=80 (~250 planted clusters per cell)
# while the 20k gate passed at the same constant. The standard rule
# (FAISS guidelines; also this module's own section comment) is
# k ∝ √n: cells and per-cell population both grow as √n, so probing a
# fixed FRACTION of cells keeps both recall and scanned fraction stable
# across scale. The SINGLE-LEVEL k is capped so the bounded training
# sample still feeds >= IVF_CELL_TRAIN_BUDGET points per centroid;
# beyond that clamp (k = ⌈√n⌉ > 3,125, i.e. n ≳ 10M vectors — the
# round-12 verdict's capacity frontier) coarse_plan_for switches to the
# TWO-LEVEL quantizer below, whose capacity is k1 × sub-cells — the
# IMI shape (Babenko & Lempitsky, "The Inverted Multi-Index", CVPR
# 2012), trained per-cell on a sample that scales with k. nprobe
# scales with EFFECTIVE k at IVF_PROBE_FRAC (floor 3).
IVF_COARSE_MIN_K = 16
IVF_CELL_TRAIN_BUDGET = 32  # training points per centroid floor
IVF_PROBE_FRAC = 0.04
IVF_L1_K = 256  # level-1 cells of the two-level coarse quantizer


def coarse_k_for(n: int, sample_cap: int = KMEANS_SAMPLE) -> int:
    """Single-level k = ⌈√n⌉ clamped to [IVF_COARSE_MIN_K,
    sample_cap // budget]. Callers that can consume a two-level
    quantizer should use coarse_plan_for instead — this clamp is the
    capacity frontier the two-level path lifts."""
    import math

    k = max(IVF_COARSE_MIN_K, math.isqrt(max(n, 1) - 1) + 1)
    return min(k, max(IVF_COARSE_MIN_K, sample_cap // IVF_CELL_TRAIN_BUDGET))


def coarse_plan_for(n: int, sample_cap: int = KMEANS_SAMPLE) -> tuple[str, int]:
    """('flat', ⌈√n⌉) while the single-level training clamp holds;
    ('two_level', ⌈√n⌉) beyond it — k keeps tracking the corpus
    instead of saturating at sample_cap // budget cells."""
    import math

    k_raw = max(IVF_COARSE_MIN_K, math.isqrt(max(n, 1) - 1) + 1)
    flat_cap = max(IVF_COARSE_MIN_K, sample_cap // IVF_CELL_TRAIN_BUDGET)
    return ("flat", k_raw) if k_raw <= flat_cap else ("two_level", k_raw)


def nprobe_for(k: int) -> int:
    """Probe a fixed fraction of cells, never fewer than 3."""
    import math

    return min(k, max(IVF_TRAINED_NPROBE, math.ceil(k * IVF_PROBE_FRAC)))


def _fdot(a, b):
    """Plain double dot product via zip_with+aggregate (no oracle parity
    needed on this path, so no decimal quantization)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_coarse_centers(emb: DataFrame, k: int, sample_cap: int, n_total: int | None = None):
    """UNIT-normalized (k, dim) float64 coarse-quantizer centers —
    shared by the trained IVF here and the trained IVFPQ in
    operators/structures.py.

    Training sample: a hash-threshold filter, never a bare ``limit``
    (not contractually deterministic under partition scheduling — the
    centroids, hence the rows-only counts, could flap once the corpus
    exceeds the cap); the count is one cheap columnar-scan job, and
    ~sample_cap rows (binomial spread) is plenty for a coarse
    quantizer, which needs a sketch of the density, not an exact-k
    sample. The training frame is cached (k-means runs ~2 jobs per
    iteration; uncached, every job re-scans parquet) and init is
    RANDOM: k-means|| spends several extra passes buying an init
    quality a coarse quantizer cannot use — profiled at 200k vectors /
    k=80: 149 s (k-means||, uncached) → 8.5 s (cached + random init),
    identical recall through the tests/test_ann_trained.py gate.
    Determinism contract: fixed seed + hash-threshold sample pins the
    training SET, but initMode='random' draws its k init points
    per-partition — the resulting centroids (hence cells and lane
    timings/recall) are only reproducible for a fixed partitioning of
    the sample; correctness is unaffected (oracle=None + recall gate),
    reproduction of recorded numbers requires the same layout."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    if n_total is None:
        n_total = emb.count()
    sample = emb
    if n_total > sample_cap:
        denom = 1_000_000
        thresh = -(-sample_cap * denom // n_total)  # ceil
        sample = emb.filter(
            F.pmod(F.xxhash64("vec_id", F.lit(KMEANS_SEED)), F.lit(denom))
            < F.lit(thresh)
        )
    train = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(
        sample.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
        )
    ).persist()
    model = KMeans(
        k=k,
        seed=KMEANS_SEED,
        maxIter=KMEANS_MAXITER,
        featuresCol="features",
        initMode="random",
    ).fit(train)
    train.unpersist()  # synchronous-safe: fit has consumed the frame
    C = np.array(model.clusterCenters(), dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    return C


def _lloyd(X, k: int, rng, iters: int = KMEANS_MAXITER):
    """Seeded driver-side spherical k-means over UNIT rows (assign by
    max dot == min Euclidean on the sphere; centers re-normalized each
    step). Deterministic given (X, k, rng state) — unlike the
    distributed fit's RANDOM init (see train_coarse_centers' contract
    note), which is why the two-level trainer uses this for BOTH
    levels. Empty clusters reseed to the point farthest from its
    center (standard k-means repair)."""
    import numpy as np

    m = len(X)
    if k >= m:
        C = X.copy()
        return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    C = X[rng.choice(m, size=k, replace=False)].copy()
    for _ in range(iters):
        S = X @ C.T
        a = S.argmax(axis=1)
        best = S[np.arange(m), a]
        newC = np.zeros_like(C)
        np.add.at(newC, a, X)
        counts = np.bincount(a, minlength=k)
        empty = np.flatnonzero(counts == 0)
        if len(empty):
            # reseed each empty center at a worst-fit point
            worst = np.argsort(best)[: len(empty)]
            newC[empty] = X[worst]
            counts[empty] = 1
        newC /= np.maximum(
            np.linalg.norm(newC, axis=1, keepdims=True), 1e-12
        )
        C = newC
    return C


def train_two_level_centers(
    emb: DataFrame, k_target: int, n_total: int, seed: int = KMEANS_SEED
):
    """(C1 (k1,d), C2 (k_eff,d), offsets (k1+1,)) — the two-level coarse
    quantizer that lifts the single-level √n clamp (module comment):
    IVF_L1_K level-1 cells trained on a hash-threshold sample that
    SCALES with k_target (k_target × IVF_CELL_TRAIN_BUDGET rows — still
    a bounded driver artifact: ~200k × d doubles at k=6,000), then
    per-level-1-cell sub-quantizers sized proportionally to the cell's
    sample mass so Σ sub-cells ≈ k_target. Effective cell ids are
    offsets[c1] + j, contiguous per level-1 cell. All training is the
    seeded driver-side Lloyd above — deterministic given the sample,
    closing the distributed fit's init nondeterminism as a bonus."""
    import numpy as np

    sample_cap = min(n_total, max(KMEANS_SAMPLE, k_target * IVF_CELL_TRAIN_BUDGET))
    sample = emb.select("embedding")
    if n_total > sample_cap:
        denom = 1_000_000
        thresh = -(-sample_cap * denom // n_total)  # ceil
        sample = emb.filter(
            F.pmod(F.xxhash64("vec_id", F.lit(seed)), F.lit(denom))
            < F.lit(thresh)
        ).select("embedding")
    pdf = sample.toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    k1 = min(IVF_L1_K, max(1, len(X) // IVF_CELL_TRAIN_BUDGET))
    C1 = _lloyd(X, k1, rng)
    a1 = (X @ C1.T).argmax(axis=1)
    subs, offsets = [], [0]
    for c in range(len(C1)):
        pts = X[a1 == c]
        if len(pts) == 0:
            sub = C1[c : c + 1]
        else:
            k2 = max(1, round(k_target * len(pts) / len(X)))
            sub = _lloyd(pts, min(k2, len(pts)), rng)
        subs.append(sub)
        offsets.append(offsets[-1] + len(sub))
    C2 = np.vstack(subs)
    return C1, C2, np.asarray(offsets, dtype=np.int64)


# --------------------------------------------------------------------------
# Distributed full-corpus k-means (the clamp-free trainer)
# --------------------------------------------------------------------------
#
# Both trainers above fit on a bounded DRIVER-side sample — the honest
# 100-TB limitation being that centroid quality is capped by what a
# ~200k-row sketch can see. This trainer refines over the FULL corpus
# with Lloyd iterations executed as Spark jobs (the classic distributed
# k-means shape: broadcast centers, map-side partial sums, k-row
# reduce), so the training set is the corpus itself and k is limited
# only by the k×d-double broadcast — no sample clamp at all.
#
# Per iteration: the current (k, d) centers broadcast to every
# executor; one mapInPandas pass assigns each Arrow batch by GEMM
# (X @ Cᵀ argmax — same kernel as the probe path) and accumulates
# per-cell PARTIAL sums; each task emits ≤ k rows (cell, count,
# d-long sum vector), a groupBy(cell) reduce adds the partials, and
# the driver collects k rows to form the next centers. Shuffle volume
# is tasks × k rows of (8 + 8d) bytes per iteration — independent of n.
#
# Determinism (the distributed fit's known gap — see
# train_coarse_centers' contract note): naive float partial sums would
# make the result depend on partitioning and reduce order. Instead
# every accumulated element is quantized ONCE to fixed point
# (floor(x · 2^24) as int64, the repo's standard order-independence
# trick — similarity.dot_dec) and all reduction is exact int64
# addition, which is associative and commutative. The REDUCTION is
# therefore bit-identical for any partitioning of the same rows
# (pinned by tests/test_dkmeans.py at two partitionings), closing the
# init nondeterminism as well because the seeded driver-side _lloyd on
# the hash-threshold sample provides the init. Scope caveat (r13
# advice): per-row ASSIGNMENT goes through BLAS GEMM (X @ Cᵀ), whose
# rounding is not specified across BLAS builds/thread shapes — a
# near-tie argmax could flip a row's cell on a different build. The
# bit-determinism contract is: fixed BLAS build ⇒ fixed fit under any
# partitioning; across builds the fit is deterministic up to GEMM
# rounding of near-tie assignments. Overflow headroom: |floor(x·2^24)| ≤ 2^24
# per unit-vector element, so a cell of m members sums to < m·2^24 —
# int64 holds to m ≈ 5.5e11 rows per cell (guarded below).

DKMEANS_SCALE = 1 << 24  # fixed-point quantum for order-invariant sums
DKMEANS_REFINE_ITERS = 5  # full-corpus passes after the sampled init


def train_coarse_centers_distributed(
    emb: DataFrame,
    k: int,
    n_total: int | None = None,
    seed: int = KMEANS_SEED,
    iters: int = DKMEANS_REFINE_ITERS,
):
    """(C (k, d) unit float64, obj_history [iters] mean-cosine) — the
    full-corpus distributed Lloyd refinement (section comment). The
    objective is the mean best-cosine of the PREVIOUS iteration's
    centers measured during assignment, itself an exact fixed-point
    sum, so the history is deterministic too and spherical k-means'
    monotone improvement is assertable."""
    import numpy as np
    import pandas as pd

    from example_beam_spark.registry import defer_cleanup

    spark = emb.sparkSession
    src = emb.select("embedding").persist()
    defer_cleanup(lambda: src.unpersist())
    if n_total is None:
        n_total = src.count()
    if n_total >= (1 << 62) // DKMEANS_SCALE:
        raise ValueError("fixed-point reduce overflow bound exceeded")

    # seeded init: driver _lloyd on the standard hash-threshold sample
    # (bounded artifact — k·IVF_CELL_TRAIN_BUDGET rows, same contract
    # as train_two_level_centers)
    sample_cap = min(n_total, max(KMEANS_SAMPLE, k * IVF_CELL_TRAIN_BUDGET))
    sample = emb.select("vec_id", "embedding")
    if n_total > sample_cap:
        denom = 1_000_000
        thresh = -(-sample_cap * denom // n_total)  # ceil
        sample = sample.filter(
            F.pmod(F.xxhash64("vec_id", F.lit(seed)), F.lit(denom))
            < F.lit(thresh)
        )
    # the collected sample is sorted by vec_id BEFORE the seeded init —
    # toPandas row order follows partition order, so without the sort
    # the init (hence the whole fit) would depend on the layout, the
    # exact nondeterminism this trainer exists to close
    pdf = sample.toPandas().sort_values("vec_id")
    X0 = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    X0 /= np.maximum(np.linalg.norm(X0, axis=1, keepdims=True), 1e-12)
    C = _lloyd(X0, k, np.random.default_rng(seed))
    k = int(C.shape[0])  # _lloyd may return fewer when k >= sample size
    d = int(C.shape[1])

    out_schema = "cell int, cnt long, s array<long>, obj long"
    obj_history: list[float] = []
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches):
            CC = bc.value
            kk, dd = CC.shape
            acc = np.zeros((kk, dd), dtype=np.int64)
            cnt = np.zeros(kk, dtype=np.int64)
            obj = np.int64(0)
            for pdf_ in batches:
                if len(pdf_) == 0:
                    continue
                X = np.stack(pdf_["embedding"].to_numpy()).astype(np.float64)
                X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                S = X @ CC.T
                a = S.argmax(axis=1)
                np.add.at(
                    acc, a, np.floor(X * DKMEANS_SCALE).astype(np.int64)
                )
                cnt += np.bincount(a, minlength=kk).astype(np.int64)
                obj += np.floor(
                    S[np.arange(len(X)), a] * DKMEANS_SCALE
                ).astype(np.int64).sum()
            nz = np.flatnonzero(cnt)
            if len(nz) == 0:
                return
            ocol = np.zeros(len(nz), dtype=np.int64)
            ocol[0] = obj  # partition objective rides on one row
            yield pd.DataFrame(
                {
                    "cell": nz.astype("int32"),
                    "cnt": cnt[nz],
                    "s": [acc[i] for i in nz],
                    "obj": ocol,
                }
            )

        def reduce_cell(pdf_: "pd.DataFrame") -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "cell": [pdf_["cell"].iloc[0]],
                    "cnt": [int(pdf_["cnt"].sum())],
                    "s": [np.sum(np.stack(pdf_["s"].to_numpy()), axis=0)],
                    "obj": [int(pdf_["obj"].sum())],
                }
            )

        rows = (
            src.mapInPandas(partials, out_schema)
            .groupBy("cell")
            .applyInPandas(reduce_cell, out_schema)
            .collect()
        )
        bc.unpersist()
        newC = C.copy()  # empty cells keep their center (deterministic)
        total_obj = 0
        for r in rows:
            total_obj += r.obj
            v = np.asarray(r.s, dtype=np.float64) / (DKMEANS_SCALE * r.cnt)
            nrm = np.linalg.norm(v)
            if nrm > 1e-12:
                newC[r.cell] = v / nrm
        C = newC
        obj_history.append(total_obj / DKMEANS_SCALE / n_total)
    return C, obj_history


def ivf_trained_frames(
    emb: DataFrame,
    k: int | None = None,
    nprobe: int | None = None,
    sample_cap: int = KMEANS_SAMPLE,
    centers=None,
    members_filter: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(top-k results, candidate pairs) for the trained-centroid IVF.
    The candidate frame is exposed so callers (recall lane, tests) can
    measure the scanned fraction |candidates| / (n_queries · (n−1)).
    k/nprobe default to the adaptive √n sizing (coarse_plan_for /
    nprobe_for — flat centroids below the training clamp, the
    two-level quantizer beyond it); pass explicit values only for
    controlled experiments (explicit k forces the flat path).
    ``centers``: pre-trained (k, d) unit float64 centroids (e.g. the
    distributed trainer's) — skips training, forces the flat path.
    ``members_filter``: single-column (neighbor_id) frame; when given,
    the probed-cell scan is PRE-filtered to those ids (filtered-ANN
    semantics — the predicate restricts candidates before the exact
    dot, so selectivity cuts scan work instead of post-truncating the
    top-k)."""
    spark = emb.sparkSession
    n_total = emb.count()
    mode = "flat"
    if centers is not None:
        k = int(centers.shape[0])
    elif k is None:
        mode, k = coarse_plan_for(n_total, sample_cap)
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select("vec_id", "v", F.sqrt(_fdot("v", "v")).alias("nrm"))

    # Spherical k-means trains on UNIT vectors (Euclidean == cosine).
    # The normalization is deliberately NOT the HOF projection
    # `transform(v, x / nrm)` with nrm from the projection below:
    # CollapseProject inlines the nrm aggregate INTO the lambda, so the
    # full dim-length dot is re-evaluated per ELEMENT — a dim× blowup
    # measured at ~70 s for 200k×64 vectors (vs 1.2 s for the same
    # normalize done batch-wise) on local[32]. Training normalizes
    # JVM-side via ml.feature.Normalizer(p=2); assignment normalizes
    # inside the Arrow kernel below. Both touch raw float32 embeddings,
    # halving the scan/transfer bytes too. Sample/caching/determinism
    # contract: see train_coarse_centers.
    import numpy as np
    import pandas as pd

    if centers is not None:
        C = np.asarray(centers, dtype=np.float64)
    elif mode == "two_level":
        C1, C2, OFF = train_two_level_centers(emb, k, n_total)
        k = int(C2.shape[0])  # effective cell count (Σ sub-cells)
    else:
        C = train_coarse_centers(emb, k, sample_cap, n_total=n_total)
    if nprobe is None:
        nprobe = nprobe_for(k)

    # Nearest / top-nprobe cells per vector as a broadcast-centers GEMM
    # (see section comment): one X @ Cᵀ + argmax per Arrow batch replaces
    # the n×k join + window. Ties rank lowest cell first (np.argmax picks
    # the first maximum; the lexsort key order below does the same), the
    # exact tie rule the window's orderBy(desc(cos), cell) used.
    n_queries, n_probe = N_QUERIES, nprobe  # close over plain ints

    if mode == "two_level":
        # Hierarchical assignment: level-1 argmax (n × k1 GEMM), then
        # argmax within the winning cell's sub-centroids (n × ~k/k1) —
        # ~n × (k1 + k/k1) work instead of the flat n × k, which is the
        # whole point of the two-level shape at k in the thousands.
        # QUERY rows still rank ALL effective cells exactly (a 5-row
        # GEMM against C2) so probe order matches the flat contract:
        # crk=1 is the query's member cell AND its first probe.
        bc2 = spark.sparkContext.broadcast((C1, C2, OFF))

        def assign(batches):
            L1, L2, OF = bc2.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf["vec_id"].to_numpy()
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                X /= np.maximum(
                    np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                )
                a1 = (X @ L1.T).argmax(axis=1)
                cell = np.empty(len(X), dtype="int32")
                for c in np.unique(a1):
                    m = np.flatnonzero(a1 == c)
                    sub = L2[OF[c] : OF[c + 1]]
                    cell[m] = OF[c] + (X[m] @ sub.T).argmax(axis=1)
                out = {
                    "vec_id": ids,
                    "cell": cell,
                    "crk": np.ones(len(ids), "int32"),
                }
                q = np.flatnonzero(ids < n_queries)
                if len(q):
                    Sq = X[q] @ L2.T  # exact global rank for the few queries
                    extra_id, extra_cell, extra_crk = [], [], []
                    for row, i in enumerate(q):
                        order = np.lexsort((np.arange(L2.shape[0]), -Sq[row]))
                        cell[i] = order[0]  # member cell = global top1
                        for r, cc in enumerate(order[1:n_probe], start=2):
                            extra_id.append(ids[i])
                            extra_cell.append(cc)
                            extra_crk.append(r)
                    if extra_id:
                        out = {
                            "vec_id": np.concatenate([out["vec_id"], extra_id]),
                            "cell": np.concatenate(
                                [out["cell"], extra_cell]
                            ).astype("int32"),
                            "crk": np.concatenate(
                                [out["crk"], extra_crk]
                            ).astype("int32"),
                        }
                yield pd.DataFrame(out)

    else:
        bc = spark.sparkContext.broadcast(C)

        def assign(batches):
            CC = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf["vec_id"].to_numpy()
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                X /= np.linalg.norm(X, axis=1, keepdims=True)
                S = X @ CC.T  # unit rows × unit centers: cosine
                top1 = S.argmax(axis=1).astype("int32")
                out = {"vec_id": ids, "cell": top1, "crk": np.ones(len(ids), "int32")}
                q = np.flatnonzero(ids < n_queries)
                if len(q) and n_probe > 1:
                    extra_id, extra_cell, extra_crk = [], [], []
                    for i in q:
                        order = np.lexsort((np.arange(S.shape[1]), -S[i]))
                        for r, cell in enumerate(order[1:n_probe], start=2):
                            extra_id.append(ids[i])
                            extra_cell.append(cell)
                            extra_crk.append(r)
                    out = {
                        "vec_id": np.concatenate([out["vec_id"], extra_id]),
                        "cell": np.concatenate([out["cell"], extra_cell]).astype("int32"),
                        "crk": np.concatenate([out["crk"], extra_crk]).astype("int32"),
                    }
                yield pd.DataFrame(out)

    # Persist the assignment: the index build is materialized ONCE and
    # then consumed four times (probes broadcast, members side, and the
    # caller's collect + candidate count each re-trigger the DAG) — at
    # 100 TB this is "build the IVF index, then query it", not a
    # recompute-per-action. Cleanup via the registry contract.
    from example_beam_spark.registry import defer_cleanup

    ranked = (
        emb.select("vec_id", "embedding")
        .mapInPandas(assign, "vec_id long, cell int, crk int")
        .persist()
    )
    defer_cleanup(lambda: ranked.unpersist())
    cells = ranked.filter(F.col("crk") == 1).select("vec_id", "cell")
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crk") <= nprobe)
    ).select(F.col("vec_id").alias("query_id"), "cell")

    if members_filter is not None:
        # pre-filter on the ID-ONLY assignment frame, BEFORE vectors are
        # attached: dropped candidates never shuffle their d-float rows,
        # and the exact dot below sees only predicate-passing members
        cells = cells.join(
            members_filter,
            cells.vec_id == members_filter.neighbor_id,
            "left_semi",
        )
    members = cells.join(
        base.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("n_v"),
            F.col("nrm").alias("n_nrm"),
        ),
        cells.vec_id == F.col("neighbor_id"),
    ).select("neighbor_id", "cell", "n_v", "n_nrm")
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    cands = (
        members.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(queries), "query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        "cell",
        (_fdot("q_v", "n_v") / (F.col("q_nrm") * F.col("n_nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    topk = (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cell", "cosine", "rk")
    )
    return topk, cands.select("query_id", "neighbor_id")


@register("ann_topk_ivf_trained", oracle=None)
def ann_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-centroid IVF ANN (see section comment): spherical k-means
    coarse quantizer sized k = ⌈√n⌉ (coarse_k_for — capacity tracks the
    corpus, the reference's side-input sizing rationale README.md:113),
    top-``nprobe_for(k)``-cell probing, exact cosine top-k within the
    probed cells. Rows-only driver check by design (fitted model ≠
    SQL); recall/scan quality is gated by tests/test_ann_trained.py on
    the planted-neighborhood corpus and measured at 200k/2M by
    tools/stress_lane.py."""
    emb = spread_small_input(load_table(spark, sf_dir, "embeddings"), spark)
    return ivf_trained_frames(emb)[0]
