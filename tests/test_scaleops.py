"""Round-9 scale-rewrite pins.

Three rewrites replaced (or twinned) operators whose round-8 plans broke
at skewed/huge inputs; these tests pin the parts the sf-fixture oracle
sweep can't see:

* boundary semantics on CONSTRUCTED corpora — sessions/lookbacks placed
  exactly ON bucket edges, gap edges, and same-microsecond ties, where
  the bucketed forms could silently diverge from the single-window
  forms (the oracle fixtures hit these edges only by luck);
* physical-plan shape — the attribution rewrite must carry NO per-row
  list (no collect_list anywhere in the plan), the salted sessionizer
  must exchange on (user_id, bucket) — time-parallel — before its
  summary pass;
* the neardup band-width ladder — the Python ladder and the oracle's
  SQL CASE must agree at every power-of-two boundary, or Spark and
  DuckDB would bucket with different r and the driver compare would
  explode in a way no small fixture reveals.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from example_beam_spark.operators.analytics import events_attribution_position
from example_beam_spark.operators.relational import sessionize_events
from example_beam_spark.operators.scaleops import (
    _SESSION_BUCKET_US,
    events_attribution_position_listform,
    sessionize_events_salted,
)
from example_beam_spark.operators.similarity import (
    _NEARDUP_MAX_R,
    _NEARDUP_R_SQL,
    NEARDUP_TARGET_BUCKET,
    neardup_band_bits,
)

US = 1_000_000
MIN = 60 * US
HOUR = 3600 * US
DAY = 24 * HOUR
BASE = 1_704_067_200 * US  # 2024-01-01 UTC — a whole multiple of 6 h,
# so bucket edges land at BASE + k * _SESSION_BUCKET_US exactly
GAP = 30 * MIN

assert BASE % _SESSION_BUCKET_US == 0


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.nulls(len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --------------------------------------------------------------------------
# salted sessionization — bucket-edge and gap-edge scenarios
# --------------------------------------------------------------------------


def test_sessionize_salted_boundaries(spark, tmp_path):
    """Constructed sessions placed exactly on the hazards: the salted
    two-phase plan must equal the single-window plan row-for-row."""
    B = _SESSION_BUCKET_US
    rows = []
    # user 1: two events 29m59.999999s apart STRADDLING a bucket edge
    # (gap < 30 min across buckets -> ONE session, merged in phase 2)
    rows += [(1, BASE + B - MIN, 1, "view", 1.0), (2, BASE + B + 29 * MIN - 1, 1, "view", 1.0)]
    # user 2: gap EXACTLY 30 min across a bucket edge — oracle uses
    # strict '>', so exactly-30min is the SAME session
    rows += [(3, BASE + 2 * B - MIN, 2, "view", 1.0), (4, BASE + 2 * B - MIN + GAP, 2, "view", 1.0)]
    # user 3: gap of 30 min + 1 µs across a bucket edge — NEW session
    rows += [(5, BASE + 3 * B - MIN, 3, "view", 1.0), (6, BASE + 3 * B - MIN + GAP + 1, 3, "view", 1.0)]
    # user 4: one session spanning FOUR buckets (events every 20 min
    # for 20 h) — k-1 boundary merges must chain
    rows += [
        (100 + i, BASE + i * 20 * MIN, 4, "view", 0.5) for i in range(60)
    ]
    # user 5: silence of a full empty bucket (> 6 h) -> new session
    rows += [(200, BASE + MIN, 5, "view", 1.0), (201, BASE + 2 * B + MIN, 5, "view", 1.0)]
    # user 6: same-microsecond tie at a bucket edge (event_id breaks the
    # order), then a third event within gap
    rows += [
        (300, BASE + 4 * B, 6, "view", 1.0),
        (301, BASE + 4 * B, 6, "click", 2.0),
        (302, BASE + 4 * B + GAP, 6, "view", 3.0),
    ]
    # user 7: multiple sessions inside ONE bucket plus a cross-edge merge
    rows += [
        (400, BASE + 5 * B + MIN, 7, "view", 1.0),
        (401, BASE + 5 * B + MIN + GAP + 1, 7, "view", 1.0),  # new (intra)
        (402, BASE + 6 * B - MIN, 7, "view", 1.0),  # new (intra)
        (403, BASE + 6 * B + MIN, 7, "view", 1.0),  # merges across edge
    ]
    sf = _write_events(tmp_path, rows)
    assert _rows(sessionize_events_salted(spark, sf)) == _rows(
        sessionize_events(spark, sf)
    )


def test_sessionize_salted_plan_is_time_parallel(spark, sf_dir):
    """The event-sorting window must be keyed by (user_id, bucket) — the
    head user's events sort on many cores. A (user_id, bucket) exchange
    must exist, and the only full-events window sort must carry bucket
    in its partition spec (the user_id-alone window runs over bucket
    SUMMARIES, and the final groupBy exchange is on (user_id,
    session_id) — both fine)."""
    plan = (
        sessionize_events_salted(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    spots = [
        plan[i : i + 80]
        for i in range(len(plan))
        if plan.startswith("hashpartitioning(user_id", i)
    ]
    assert any("bucket" in s for s in spots), spots
    # every Window over (ts, event_id) — the full-events island pass —
    # is partitioned by both user_id and bucket
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\], \[ts#\d+ ASC", plan):
        assert "bucket" in m.group(1), m.group(0)[:120]


# --------------------------------------------------------------------------
# attribution rewrite — lookback-edge scenarios + no-list plan pin
# --------------------------------------------------------------------------


def test_attribution_rewrite_boundaries(spark, tmp_path):
    """The bucketed-join rewrite vs the carried-list form on constructed
    lookback edges: both must agree row-for-row."""
    W = 7 * DAY
    rows = []
    # user 1: click exactly AT pts - 7d (inclusive — counted), click at
    # pts - 7d - 1µs (outside), click in the PREVIOUS bucket, click
    # same-µs as the purchase with smaller/larger event_id
    p_ts = BASE + 10 * DAY
    rows += [
        (1, p_ts - W, 1, "click", 0.0),        # exactly on the edge: in
        (2, p_ts - W - 1, 1, "click", 0.0),    # 1µs outside: out
        (3, p_ts - 1 * DAY, 1, "click", 0.0),  # same bucket as purchase
        (4, p_ts, 1, "click", 0.0),            # same µs, id < purchase: in
        (9, p_ts, 1, "purchase", 100.0),
        (10, p_ts, 1, "click", 0.0),           # same µs, id > purchase: out
    ]
    # user 2: purchase with zero clicks in window -> not emitted
    rows += [(20, BASE, 2, "click", 0.0), (21, BASE + 8 * DAY, 2, "purchase", 50.0)]
    # user 3: two purchases sharing clicks; clicks straddle the
    # purchase's bucket edge (bucket width == lookback width)
    rows += [
        (30, BASE + 6 * DAY, 3, "click", 0.0),
        (31, BASE + 7 * DAY + HOUR, 3, "click", 0.0),
        (32, BASE + 8 * DAY, 3, "purchase", 10.0),
        (33, BASE + 13 * DAY, 3, "purchase", 20.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = _rows(events_attribution_position(spark, sf))
    want = _rows(events_attribution_position_listform(spark, sf))
    assert got == want
    # spot-check the inclusion set for user 1's purchase: clicks 1, 3, 4
    u1 = [r for r in got if r[0] == 9]
    assert sorted(r[2] for r in u1) == [1, 3, 4]
    assert all(r[3] == 3 for r in u1)  # n_touches


def test_attribution_plan_carries_no_list(spark, sf_dir):
    """The registered plan must contain NO collect_list (the r8 carried
    list hit 159,796 elements at the zipf head) and must exchange on
    (user_id, tb) — the time-parallel join key."""
    plan = (
        events_attribution_position(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_list" not in plan
    # the purchases⋈clicks join is keyed by (user_id, tb) — realized as
    # a broadcast-hash join when one side is fixture-small (even
    # better), a (user_id, tb)-exchanged sort-merge join at scale
    import re

    assert re.search(r"Join \[user_id#\d+L?, tb#", plan), plan[:400]
    # the per-credit windows group by purchase_id (output-sized groups)
    assert "hashpartitioning(purchase_id" in plan


# --------------------------------------------------------------------------
# neardup band-width ladder — Python vs SQL CASE at every boundary
# --------------------------------------------------------------------------


@pytest.mark.parametrize("r", range(6, _NEARDUP_MAX_R + 1))
def test_neardup_ladder_matches_sql(r):
    con = duckdb.connect()
    for n in (
        NEARDUP_TARGET_BUCKET << r,        # last n at width r (or cap)
        (NEARDUP_TARGET_BUCKET << r) + 1,  # first n at width r+1
    ):
        got_sql = con.execute(
            f"SELECT {_NEARDUP_R_SQL} FROM (SELECT {n} AS cnt)"
        ).fetchone()[0]
        assert got_sql == neardup_band_bits(n), (n, got_sql)
    con.close()


def test_neardup_kernel_equals_hof(spark):
    """The Arrow numpy band-key kernel must be BIT-EQUAL to the HOF
    literal-array form — FLOOR((x·s)·1e12) int64 sums are the same IEEE
    double ops in both, so any mismatch is a real encoding bug (sign
    indexing, op order, dim slicing)."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.similarity import (
        NEARDUP_BANDS,
        _band_key_expr,
        _band_keys_kernel,
    )
    from example_beam_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    for r in (6, 13):  # fixture width and a lane-regime width
        hof = F.array(*[_band_key_expr(b, r) for b in range(NEARDUP_BANDS)])
        both = emb.select(
            "vec_id",
            hof.alias("hof"),
            _band_keys_kernel(r)(F.col("embedding")).alias("kern"),
        )
        bad = both.filter(F.col("hof") != F.col("kern")).count()
        assert bad == 0, f"r={r}: {bad} rows diverge"


def test_band_keys_compact_equals_per_bit(spark):
    """The r15 compact single-parse band-key/bucket expressions (one
    flattened sign Literal + index-aware transform, built as one SQL
    string — see similarity._projs_sql) must be BIT-EQUAL to the r14
    per-bit forms (_band_key_expr / per-bit _proj_expr sums): the
    per-element FLOOR((x·s)·1e12) arithmetic is the same IEEE sequence
    and the int64 sums are order-free, so any mismatch is a real
    encoding bug (sign-matrix flattening, slice offsets, bit weights)."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.similarity import (
        LSH_BITS,
        NEARDUP_BANDS,
        _band_key_expr,
        _bucket_expr_spark,
        _proj_expr,
        band_keys_array,
    )
    from example_beam_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    bit_bucket = sum(
        [
            F.when(_proj_expr(j) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(1, LSH_BITS)
        ],
        F.when(_proj_expr(0) >= 0, F.lit(1)).otherwise(F.lit(0)),
    ).cast("long")
    for r in (6, 13):
        per_bit = F.array(*[_band_key_expr(b, r) for b in range(NEARDUP_BANDS)])
        both = emb.select(
            "vec_id",
            per_bit.alias("pb"),
            band_keys_array(r, 0).alias("compact"),
            bit_bucket.alias("pb_bucket"),
            _bucket_expr_spark().alias("compact_bucket"),
        )
        bad = both.filter(
            (F.col("pb") != F.col("compact"))
            | (F.col("pb_bucket") != F.col("compact_bucket"))
        ).count()
        assert bad == 0, f"r={r}: {bad} rows diverge"


def test_neardup_bucket_verify_equals_join(spark):
    """The bucket-grouped Arrow verify (scale path) must produce the
    IDENTICAL (vec_a, vec_b, n_bands, cosine) set as the pure-JVM
    self-join + DECIMAL-HOF path (graded path) — the kernel's
    FLOOR((x*y)*1e12) int64 sums and cosine division are the same IEEE
    double ops, so any mismatch is a real bug (pair enumeration, run
    boundaries, norm plumbing)."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.similarity import (
        NEARDUP_BANDS,
        NEARDUP_THRESHOLD,
        _bucket_verify_frame,
        band_keys_array,
        dot_dec,
        neardup_band_bits,
        norm_dec,
    )
    from example_beam_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    n = emb.count()
    r = neardup_band_bits(n)
    base = emb.select("vec_id", "embedding", norm_dec("embedding").alias("nrm"))
    banded = base.select(
        "vec_id", "embedding", "nrm",
        F.posexplode(band_keys_array(r, n)).alias("band", "bkey"),
    )

    def dedup(scored):
        return scored.groupBy("vec_a", "vec_b").agg(
            F.count("*").cast("long").alias("n_bands"),
            F.min("cosine").alias("cosine"),
        )

    right = banded.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"), "band", "bkey",
    )
    probes = banded.withColumnRenamed("vec_id", "vec_a").join(
        right, ["band", "bkey"]
    ).filter(F.col("vec_a") < F.col("vec_b"))
    cos = dot_dec("embedding", "emb_b") / (F.col("nrm") * F.col("nrm_b"))
    join_form = dedup(
        probes.select("vec_a", "vec_b", cos.alias("cosine")).filter(
            F.col("cosine") >= NEARDUP_THRESHOLD
        )
    )
    kernel_form = dedup(_bucket_verify_frame(banded))
    a = sorted(tuple(x) for x in join_form.collect())
    b = sorted(tuple(x) for x in kernel_form.collect())
    assert len(a) > 0
    assert a == b


def test_neardup_bucket_verify_ragged(spark):
    """Ragged embeddings are in-domain: same-dim pairs verify exactly
    as the HOF (which slices signs to size(embedding)); mismatched-dim
    pairs are DROPPED by both paths (zip_with null-pads -> NULL dot ->
    failed threshold). Constructed corpus: two identical 3-dim vectors
    (cosine 1), two identical 2-dim vectors (cosine 1), and the cross
    pairs — every vector pair shares every band key by construction
    only if their projections agree, so use exact duplicates."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.similarity import (
        _bucket_verify_frame,
        band_keys_array,
        norm_dec,
    )

    rows = [
        (1, [0.5, -0.25, 0.125]),
        (2, [0.5, -0.25, 0.125]),
        (3, [1.0, 2.0]),
        (4, [1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.select("vec_id", "embedding", norm_dec("embedding").alias("nrm"))
    banded = base.select(
        "vec_id", "embedding", "nrm",
        F.posexplode(band_keys_array(6, 0)).alias("band", "bkey"),
    )
    got = sorted(
        (r.vec_a, r.vec_b, r.cosine)
        for r in _bucket_verify_frame(banded).distinct().collect()
    )
    # exact duplicates share every band key -> 4 agreeing bands each;
    # distinct() collapses them here; cross-dim pairs never emit.
    # Quantized cosine of identical vectors is ~1 but not exactly 1
    # (floor-sum dot vs squared quantized norm differ in the last ulp)
    # so pin pairs exactly and cosine against the JVM HOF value.
    assert [(a, b) for a, b, _ in got] == [(1, 2), (3, 4)]
    from example_beam_spark.operators.similarity import dot_dec

    pairs = df.alias("a").join(
        df.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
        ),
        F.col("vec_id") < F.col("vec_b"),
    ).filter(F.size("embedding") == F.size("emb_b"))
    hof = {
        (r.vec_id, r.vec_b): r.c
        for r in pairs.select(
            "vec_id",
            "vec_b",
            (
                dot_dec("embedding", "emb_b")
                / (norm_dec("embedding") * norm_dec("emb_b"))
            ).alias("c"),
        ).collect()
    }
    for a, b, c in got:
        assert c == hof[(a, b)], (a, b, c, hof[(a, b)])


def test_zero_norm_vectors_excluded_on_both_paths(spark, tmp_path):
    """Zero-norm vectors (undefined cosine, 0/0 = NaN) were the one
    input class where the JVM join path and the Arrow kernel disagreed
    (Spark/DuckDB keep NaN >= threshold, numpy drops it). Since round 11
    the nrm > 0 predicate excludes them identically in the oracle and in
    BOTH Spark plans — constructed corpus: one real dup pair plus two
    zero vectors (which share every band key, so they WOULD be a
    candidate pair)."""
    import numpy as np
    from pyspark.sql import functions as F

    from example_beam_spark.operators.similarity import (
        _NEARDUP_ORACLE,
        _bucket_verify_frame,
        band_keys_array,
        embedding_neardup_pairs,
        neardup_band_bits,
        norm_dec,
    )
    from tests.oracle import assert_matches_oracle

    d = tmp_path / "corpus"
    d.mkdir()
    vecs = [
        [0.5, -0.25, 0.75, 0.125],
        [0.5, -0.25, 0.75, 0.125],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
    ]
    flat = np.asarray(vecs, dtype=np.float32).reshape(-1)
    offsets = pa.array(np.arange(0, 20, 4, dtype=np.int32))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.ListArray.from_arrays(offsets, pa.array(flat)),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    sf = str(d)
    got = sorted(
        (r.vec_a, r.vec_b) for r in embedding_neardup_pairs(spark, sf).collect()
    )
    assert got == [(0, 1)]  # the zero pair (2,3) is excluded, not NaN-kept
    assert_matches_oracle(
        embedding_neardup_pairs(spark, sf),
        _NEARDUP_ORACLE,
        sf,
        "embedding_neardup_pairs/zero_norm",
    )
    # kernel path over the SAME filtered base: identical pair set
    from example_beam_spark.sources import load_table

    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    base = emb.select(
        "vec_id", "embedding", norm_dec("embedding").alias("nrm")
    ).filter(F.col("nrm") > 0)
    banded = base.select(
        "vec_id",
        "embedding",
        "nrm",
        F.posexplode(band_keys_array(neardup_band_bits(n), n)).alias(
            "band", "bkey"
        ),
    )
    kernel = sorted(
        (r.vec_a, r.vec_b)
        for r in _bucket_verify_frame(banded).distinct().collect()
    )
    assert kernel == [(0, 1)]


@pytest.mark.parametrize(
    "n,tiles", [(1, 4), (3, 4), (7, 4), (40, 4), (101, 4), (7, 3), (101, 10), (9, 10)]
)
def test_two_phase_rank_and_ntile_match_window_forms(spark, n, tiles):
    """two_phase_rank must equal the single-window row_number and
    ntile_from_rank must equal Spark's NTILE for every distribution
    shape (n < tiles, exact multiples, remainders, varied tile counts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from example_beam_spark.operators.scaleops import (
        ntile_from_rank,
        two_phase_rank,
    )
    from example_beam_spark.registry import drain_cleanups

    df = spark.range(n).select(
        (F.col("id") * 37 % 91).alias("v"), F.col("id").alias("k")
    )
    try:
        got, total = two_phase_rank(df, ["v", "k"], "rk")
        assert total == n
        w = Window.orderBy("v", "k")
        want = df.select(
            "v", "k",
            F.row_number().over(w).cast("long").alias("rk"),
            F.ntile(tiles).over(w).cast("long").alias("nt"),
        )
        got4 = got.withColumn("nt", ntile_from_rank("rk", total, tiles))
        a = sorted(tuple(r) for r in got4.select("v", "k", "rk", "nt").collect())
        b = sorted(tuple(r) for r in want.collect())
        assert a == b
    finally:
        drain_cleanups()


def test_two_phase_rank_keyed_matches_window_form(spark):
    """Keyed two_phase_rank must equal the per-key window row_number,
    including across range-partition boundaries within a key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from example_beam_spark.operators.scaleops import two_phase_rank
    from example_beam_spark.registry import drain_cleanups

    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") * 37 % 91).alias("v"),
        F.col("id").alias("t"),
    )
    try:
        got, total = two_phase_rank(df, ["v", "t"], "rk", key_cols=["k"])
        assert total is None
        w = Window.partitionBy("k").orderBy("v", "t")
        want = df.select("k", "v", "t", F.row_number().over(w).cast("long").alias("rk"))
        a = sorted(tuple(r) for r in got.select("k", "v", "t", "rk").collect())
        b = sorted(tuple(r) for r in want.collect())
        assert a == b
    finally:
        drain_cleanups()
