"""Round-9 scale-hazard twins: alternate physical plans for operators
whose registered form was rewritten (or augmented) for skewed/huge
inputs, kept oracle-registered so both plans stay value-proven every
round.

Contents:

* ``events_attribution_position_listform`` — the round-8 carried-list
  plan for U-shaped attribution (collect_list over an unbounded
  per-user window).  Replaced as the registered
  ``events_attribution_position`` plan by the bucketed-join O(1)-state
  rewrite (operators/analytics.py) after the r8 skew lane measured the
  carried list at 159,796 elements for a zipf head user; retained here
  as the pedagogical single-exchange form — correct and fastest on
  uniform small-cardinality users, state-unbounded on heavy ones.

* ``sessionize_events_salted`` — two-phase gaps-and-islands
  sessionization (intra-bucket islands, then a per-(user, bucket)
  summary merge) that breaks the single-user serialization of the
  registered ``sessionize_events`` plan (operators/relational.py) on
  zipf-headed users; same oracle, value-exact.

Reference analog: bounded per-key state is the same discipline the
reference enforces in its stateful DoFns (RepeatDoFn.scala:52-58 keeps
only the latest element per key, never a history list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.operators.analytics import _ATTR_WINDOW_US, _POS_ATTR_ORACLE
from example_beam_spark.operators.relational import _SESSION_ORACLE
from example_beam_spark.registry import dsum, register
from example_beam_spark.sources import load_table


@register("events_attribution_position_listform", oracle=_POS_ATTR_ORACLE)
def events_attribution_position_listform(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The round-8 carried-list attribution plan (see module doc): one
    window per user carries the full click history forward
    (collect_list over rows-unbounded-preceding), the lookback filter
    and position weighting are map-side HOFs, and the credit fan-out is
    posexplode. Single exchange — but per-row state grows with a user's
    lifetime clicks (r8 skew lane: 159,796-element list at the zipf
    head), which is why the registered plan is now the bucketed join in
    operators/analytics.py."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "event_type",
        F.collect_list(
            F.when(
                F.col("event_type") == "click",
                F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid")),
            )
        ).over(w).alias("raw"),
    )
    pur = carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
        F.sort_array(
            F.filter(
                "raw",
                lambda c: F.unix_micros(F.col("ts")) - F.unix_micros(c["cts"])
                <= _ATTR_WINDOW_US,
            )
        ).alias("wins"),
    )
    cred = pur.select(
        "purchase_id",
        "user_id",
        "value",
        F.size("wins").cast("long").alias("n_touches"),
        F.posexplode("wins").alias("pos", "c"),
    ).select(
        "purchase_id",
        "user_id",
        "value",
        "n_touches",
        (F.col("pos") + 1).cast("long").alias("touch_pos"),
        F.col("c.cid").alias("click_id"),
    )
    k, i = F.col("n_touches"), F.col("touch_pos")
    weight = (
        F.when(k == 1, F.lit(1.0))
        .when(k == 2, F.lit(0.5))
        .when((i == 1) | (i == k), F.lit(0.4))
        .otherwise(F.lit(0.2) / (k - 2).cast("double"))
    )
    return cred.select(
        "purchase_id",
        "user_id",
        "click_id",
        "n_touches",
        "touch_pos",
        weight.alias("weight"),
        (F.col("value") * weight).alias("credited_value"),
    )


# --------------------------------------------------------------------------
# Two-phase (salted) sessionization
# --------------------------------------------------------------------------
# The registered sessionize_events sorts EVERY event of a user on one
# core (one user-keyed exchange + per-user sort) — the r8 skew lane
# measured 4.7× zipf-vs-uniform wall at 10M events because the head
# user serializes. Phase 1 here keys by (user_id, coarse time bucket):
# islands are computed inside each bucket independently, so a head
# user's sort parallelizes across time. Phase 2 reduces ONE ROW PER
# (user, bucket) — first/last event time and the count of intra-bucket
# session starts — on a per-user window over bucket summaries (rows ∝
# active buckets, never events), decides which bucket-initial sessions
# chain onto the previous bucket's tail (gap ≤ 30 min across the
# boundary), and prefix-sums a per-bucket session-id base. A session
# spanning k buckets is stitched by k-1 boundary merges; the final
# groupBy (user, session) re-aggregates the merged pieces. Bucket width
# is 6 h = 12 gaps: wide enough that bucket summaries are tiny, narrow
# enough to split heavy users ~4 ways per day.

_SESSION_GAP_US = 1800 * 1_000_000
_SESSION_BUCKET_US = 12 * _SESSION_GAP_US  # 6 hours


@register("sessionize_events_salted", oracle=_SESSION_ORACLE, headline=True)
def sessionize_events_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase sessionization (see section comment): value-identical
    to ``sessionize_events`` — same 30-min gap, same (user_id,
    session_id ordinal) numbering — but the big exchange is keyed by
    (user_id, 6-hour bucket) so a zipf head user's events sort on many
    cores, and the only per-user serial pass runs over bucket
    SUMMARIES (one row per active bucket)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    bkt = ev.withColumn("bucket", F.floor(us / _SESSION_BUCKET_US))
    wb = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    # Intra-bucket islands: first event of a bucket is NOT flagged (its
    # session start is decided by the boundary merge in phase 2).
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wb))
    marked = bkt.withColumn(
        "starts_here",
        F.when(gap_us > _SESSION_GAP_US, 1)
        .when(F.lag("ts").over(wb).isNull(), 0)
        .otherwise(0),
    ).withColumn(
        "local_sid",
        F.sum("starts_here").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # Phase 2 input: one summary row per (user, bucket).
    summaries = marked.groupBy("user_id", "bucket").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum("starts_here").alias("n_starts"),
    )
    wu = Window.partitionBy("user_id").orderBy("bucket")
    # The bucket's FIRST event starts a new session unless the previous
    # ACTIVE bucket's last event is within the gap (empty buckets
    # between two active ones always exceed the gap: bucket width is
    # 12 gaps, so a full empty bucket implies > gap of silence).
    first_is_start = F.when(
        F.lag("last_ts").over(wu).isNull()
        | (F.lag("bucket").over(wu) < F.col("bucket") - 1)
        | (
            F.unix_micros("first_ts") - F.unix_micros(F.lag("last_ts").over(wu))
            > _SESSION_GAP_US
        ),
        1,
    ).otherwise(0)
    numbered = summaries.withColumn("first_is_start", first_is_start).withColumn(
        # Session id of this bucket's FIRST event = running total of all
        # starts in prior buckets + this bucket's first_is_start.
        "base_sid",
        F.sum(F.col("n_starts") + F.col("first_is_start")).over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        )
        - F.col("n_starts"),
    )
    # Stitch: event's global session id = bucket base + its intra-bucket
    # island ordinal (local_sid counts starts AFTER the first event).
    stitched = marked.join(
        numbered.select("user_id", "bucket", "base_sid"), ["user_id", "bucket"]
    ).withColumn("session_id", (F.col("base_sid") + F.col("local_sid")).cast("long"))
    return stitched.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value", "session_value"),
    )


# --------------------------------------------------------------------------
# Stats-driven sessionize dispatch
# --------------------------------------------------------------------------
# The round-9 skew lane left the plan choice to documentation: the
# registered single-window form is ~2.2x faster on uniform users but
# 3.98x slower on a zipf head (the head user's sort serializes on one
# core); the salted two-phase form holds 1.47x on zipf but pays the
# summary merge on uniform. The dispatch probe below prices the choice
# with ONE summary-sized job — a column-pruned scan of user_id with a
# map-side-combined count (shuffle rows = distinct users per partition,
# like the neardup r-ladder count pre-pass) — and picks the salted plan
# only when the heaviest user owns more than _SKEW_HEAD_SHARE of all
# events (i.e. when a single core would serialize >1% of the sort).

_SKEW_HEAD_SHARE = 0.01


def sessionize_head_share(ev: DataFrame) -> float:
    """max per-user event share — the dispatch statistic."""
    row = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("head"), F.sum("c").alias("total"))
        .collect()[0]
    )
    if not row.total:
        return 0.0
    return row.head / row.total


@register("sessionize_events_auto", oracle=_SESSION_ORACLE, headline=True)
def sessionize_events_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with automatic skew dispatch (see section
    comment): value-identical to both plans it chooses between —
    ``sessionize_events`` (operators/relational.py) on uniform inputs,
    ``sessionize_events_salted`` past the head-share threshold."""
    from example_beam_spark.operators.relational import sessionize_events

    ev = load_table(spark, sf_dir, "events")
    if sessionize_head_share(ev) > _SKEW_HEAD_SHARE:
        return sessionize_events_salted(spark, sf_dir)
    return sessionize_events(spark, sf_dir)


# --------------------------------------------------------------------------
# two_phase_rank — generic distributed global row_number (round 11)
# --------------------------------------------------------------------------
# The reusable form of this module's base_sid stitch, for operators that
# need a GLOBAL total-order rank (ntile scores, exact medians/p90) and
# previously compiled to one unpartitioned WindowExec task: range-
# repartition on the order keys, rank locally per partition, collect the
# per-partition counts (<= shuffle-partitions rows — a bounded driver
# artifact) and broadcast prefix offsets back.
#
# Why persist(): RangePartitioner SAMPLES its bounds (seeded off the
# RDD id), so two separate evaluations of the same plan may pick
# different boundaries — offsets collected under one set of bounds must
# never stitch rows shuffled under another. Persisting the ranged frame
# freezes the bounds at first materialization; task retries recompute
# under the SAME frozen partitioner, so the labeling stays consistent.
# (The manifest operators use deterministic VALUE buckets instead and
# need no cache; this helper is for arbitrary order keys — dates,
# decimal sums — where no order-congruent value bucketing exists.)
# Callers must include a tie-break key so the order is total, and must
# leave unpersisting to drain_cleanups() (defer_cleanup registered).


def two_phase_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, int | None]:
    """(df + row_number over ``order_cols`` [within ``key_cols`` groups
    when given], total row count [None in the keyed form]) — no
    single-task window; see section comment.

    Keyed form: the range exchange is keyed (keys, order), so each
    key's rows occupy a contiguous pid range; per-(pid, key) counts are
    prefix-summed by a window PARTITIONED BY the keys over at most
    P x |keys| bounded summary rows (no collect, no SinglePartition) —
    the docs_shard_shuffle stitch with sampled range bounds instead of
    deterministic value buckets, hence the persist."""
    from example_beam_spark.registry import defer_cleanup

    keys = list(key_cols or [])
    spark = df.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(p, *keys, *order_cols).persist()
    defer_cleanup(lambda: ranged.unpersist())
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local = with_pid.withColumn(
        "_lrank",
        F.row_number().over(
            Window.partitionBy("_pid", *keys).orderBy(*order_cols)
        ),
    )
    if keys:
        counts = with_pid.groupBy("_pid", *keys).agg(F.count("*").alias("_n"))
        wsum = Window.partitionBy(*keys).orderBy("_pid")
        base = counts.withColumn(
            "_base",
            F.coalesce(
                F.sum("_n").over(wsum.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        ).select("_pid", *keys, "_base")
        out = (
            local.join(F.broadcast(base), ["_pid", *keys])
            .withColumn(rank_col, (F.col("_base") + F.col("_lrank")).cast("long"))
            .drop("_pid", "_lrank", "_base")
        )
        return out, None
    counts = {
        r["_pid"]: r["n"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offs, total = [], 0
    for pid in sorted(counts):  # pid order == range order
        offs.append((pid, total))
        total += counts[pid]
    off = spark.createDataFrame(offs, schema="_pid int, _base long")
    out = (
        local.join(F.broadcast(off), "_pid")
        .withColumn(rank_col, (F.col("_base") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_base")
    )
    return out, total


def ntile_from_rank(rank_col: str, n_total: int, tiles: int) -> F.Column:
    """SQL NTILE(tiles) computed from a global row_number and the total
    count: the first (n mod t) tiles hold ceil(n/t) rows, the rest
    floor(n/t) — the standard-SQL distribution Spark and DuckDB share,
    here as exact integer arithmetic on the two-phase rank."""
    small, m = divmod(n_total, tiles)
    if small == 0:
        # fewer rows than tiles: NTILE assigns tile == row position
        return F.col(rank_col)
    big = small + 1
    cutoff = m * big
    r = F.col(rank_col)
    # integer `div`: exact at any magnitude (double floor-division loses
    # integers past 2^53 — the docs_pack_sequences rule)
    return (
        F.when(r <= cutoff, F.expr(f"(({rank_col} - 1) div {big}) + 1"))
        .otherwise(
            F.expr(f"{m} + (({rank_col} - {cutoff} - 1) div {small}) + 1")
        )
        .cast("long")
    )
