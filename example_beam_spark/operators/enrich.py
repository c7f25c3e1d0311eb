"""Enrichment joins — the reference's three join strategies, Spark-first.

All three reference enrichers are left-outer-shaped with an unmatched-side
DLQ (each returns ``(matched, unmatched)``):

- **J1 broadcast latest-wins join** (ScreenGlobalWindowWithSideInputEnricher
  .scala:32,56-73): a small, slowly-changing dimension is broadcast; each
  fact row takes the dimension row with the *latest* event time. Spark:
  pre-aggregate latest-per-key with ``max_by`` (one tiny shuffle over the
  dim only), then ``F.broadcast`` hash join — no shuffle of the fact side.
- **J2 windowed/time-range equi-join** (AdEventFixedWindowWithRepeater
  Enricher.scala:50-54 + RepeatDoFn.scala): Beam needs a stateful
  "repeater" to emulate a longer right-side window; Spark expresses the
  intent directly as an equi-join with a time-range predicate. Executes as
  a sort-merge join on the key with the range as a post-join filter; AQE
  handles skew.
- **J3 lookup-cache join** (ScreenGlobalWindowWithLookupCacheEnricher +
  LookupCacheDoFn.scala:49-211): latest-publication cache with TTL,
  early-arrival buffering, expiry→DLQ. Batch-equivalent semantics (the
  final state the streaming op converges to; streaming version in
  example_beam_spark.streaming.lookup_cache):
    match = latest dim row at-or-before the fact (within ``ttl``),
    else the earliest dim row after the fact (within ``ttl``; this is the
    "early screen buffered until publication arrives" path),
    else DLQ (state GC'd at max-seen + ttl).
  Spark: implemented as a *union + per-key sort + window-function as-of*
  — one shuffle on the key, no pairwise blow-up, scales to arbitrarily
  many facts/dims per key (vs a range join whose intermediate is
  |facts×dims within ttl|).

DLQ fork (P6/J6): ``split_matched`` — two filters over one joined frame;
Catalyst computes the join once per branch, both scans pruned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# Core operators (domain-agnostic)
# --------------------------------------------------------------------------


def latest_per_key(df: DataFrame, keys: list[str], ts_col: str, tiebreak: str) -> DataFrame:
    """Latest-wins dimension snapshot: one row per key, the one with max
    (ts, tiebreak) — the reference's latest-by-event-time side-input scan
    (ScreenGlobalWindowWithSideInputEnricher.scala:65-68), as a map-side-
    combinable aggregate instead of a per-worker iterable scan."""
    payload = [c for c in df.columns if c not in keys]
    head = [ts_col] + ([tiebreak] if tiebreak != ts_col else [])
    packed = df.select(
        *keys, F.struct(*head, *[c for c in payload if c not in head]).alias("_p")
    )
    out = packed.groupBy(*keys).agg(F.max("_p").alias("_p"))
    return out.select(*keys, *[F.col(f"_p.{c}").alias(c) for c in payload])


def broadcast_latest_join(
    facts: DataFrame, dim: DataFrame, keys: list[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """J1: left join facts to the broadcast latest-wins dim snapshot."""
    return facts.join(F.broadcast(latest_per_key(dim, keys, ts_col, tiebreak)), keys, "left")


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """J2: left-outer equi-join with a time-range condition —
    right rows qualify when ``left_ts - lower <= right_ts <= left_ts + upper``
    (intervals as SQL strings, e.g. '6 hours'). All qualifying pairs are
    emitted (the reference's windowed leftOuterJoin emits the cross
    product within the window)."""
    cond = F.expr(
        f"{right_ts} >= {left_ts} - INTERVAL {lower} AND {right_ts} <= {left_ts} + INTERVAL {upper}"
    )
    for k in keys:
        cond = cond & (left[k] == right[k])
    return left.join(right, cond, "left")


def split_matched(df: DataFrame, matched_when: Column) -> tuple[DataFrame, DataFrame]:
    """P6/J6 DLQ fork: (matched, unmatched) from one enriched frame."""
    return df.filter(matched_when), df.filter(~matched_when | matched_when.isNull())


def lookup_ttl_asof_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    dim_ts: str,
    ttl: str,
    dim_payload: list[str],
) -> DataFrame:
    """J3 batch equivalent (semantics in module docstring).

    Single shuffle on ``keys``; within each key the union of facts and dim
    rows is sorted by time and two window passes compute the backward and
    forward as-of candidates (``last(..., ignorenulls)`` over preceding
    rows / ``first(...)`` over following rows). Adds ``match_status`` in
    {'matched', 'matched_early', 'dlq'} plus the dim payload columns.

    Dim rows at the same (key, ts) are deduped latest-wins by the last
    payload column before joining (deterministic tiebreak — the reference
    leaves equal-timestamp ordering undefined, see ignored tests in
    ScreenGlobalWindowWithLookupCacheEnricherTest.scala:94-112).
    """
    tb = dim_payload[-1]
    dim1 = latest_per_key(
        dim.select(*keys, F.col(dim_ts).alias("_ts"), *dim_payload),
        keys=[*keys, "_ts"],
        ts_col=tb,
        tiebreak=tb,
    )
    # kind 0 = dim sorts before kind 1 = fact at equal ts (dim at same
    # instant counts as "at-or-before" the fact).
    d = dim1.select(
        *keys,
        F.col("_ts").alias("_t"),
        F.lit(0).alias("_kind"),
        F.struct("_ts", *dim_payload).alias("_dim"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in facts.columns if c not in keys],
    )
    f = facts.select(
        *keys,
        F.col(fact_ts).alias("_t"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(d.schema["_dim"].dataType).alias("_dim"),
        *[c for c in facts.columns if c not in keys],
    )
    u = d.unionByName(f)

    w = Window.partitionBy(*keys).orderBy("_t", "_kind")
    back = F.last("_dim", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("_dim", ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ttl_i = f"INTERVAL {ttl}"
    enriched = (
        u.withColumn("_back", back)
        .withColumn("_fwd", fwd)
        .filter(F.col("_kind") == 1)
        .withColumn(
            "_match",
            F.when(
                F.col("_back").isNotNull()
                & (F.col("_back._ts") >= F.expr(f"_t - {ttl_i}")),
                F.struct(F.lit("matched").alias("status"), F.col("_back").alias("dim")),
            ).otherwise(
                F.when(
                    F.col("_fwd").isNotNull()
                    & (F.col("_fwd._ts") <= F.expr(f"_t + {ttl_i}")),
                    F.struct(F.lit("matched_early").alias("status"), F.col("_fwd").alias("dim")),
                )
            ),
        )
    )
    return enriched.select(
        *keys,
        *[c for c in facts.columns if c not in keys],
        F.coalesce(F.col("_match.status"), F.lit("dlq")).alias("match_status"),
        F.col("_match.dim._ts").alias("dim_ts"),
        *[F.col(f"_match.dim.{c}").alias(f"dim_{c}") for c in dim_payload],
    )


# --------------------------------------------------------------------------
# Registered queries over the driver's `events` table.
# Domain mapping: 'signup' events play the publications dimension
# (user_id → publication_id, value → version); 'click' events play screens.
# --------------------------------------------------------------------------


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )


def _signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", "value"
    )


_BROADCAST_ORACLE = """
    WITH signup_latest AS (
        SELECT user_id, signup_ts, signup_event_id, signup_value
        FROM (
            SELECT user_id, ts AS signup_ts, event_id AS signup_event_id,
                   value AS signup_value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events WHERE event_type = 'signup'
        ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts, c.value,
           s.signup_ts, s.signup_event_id, s.signup_value
    FROM events c
    LEFT JOIN signup_latest s ON c.user_id = s.user_id
    WHERE c.event_type = 'click'
"""


@register("enrich_broadcast_latest", oracle=_BROADCAST_ORACLE, headline=True)
def q_enrich_broadcast_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: clicks enriched with the latest signup per user via a broadcast
    latest-wins dimension snapshot."""
    clicks = _clicks(spark, sf_dir)
    signups = _signups(spark, sf_dir).select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_event_id"),
        F.col("value").alias("signup_value"),
    )
    return broadcast_latest_join(
        clicks, signups, keys=["user_id"], ts_col="signup_ts", tiebreak="signup_event_id"
    )


_TIME_RANGE_ORACLE = """
    SELECT c.event_id, c.user_id, c.ts,
           v.event_id AS view_event_id, v.ts AS view_ts, v.value AS view_value
    FROM events c
    LEFT JOIN events v
      ON v.user_id = c.user_id
     AND v.event_type = 'view'
     AND v.ts >= c.ts - INTERVAL 6 HOUR
     AND v.ts <= c.ts
    WHERE c.event_type = 'click'
"""


@register("enrich_time_range_join", oracle=_TIME_RANGE_ORACLE, headline=True)
def q_enrich_time_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: each click left-joined to all views by the same user in the
    preceding 6 hours — the Spark-native replacement for the reference's
    repeater workaround (time-range stream-stream join in streaming)."""
    clicks = _clicks(spark, sf_dir).select("event_id", "user_id", "ts")
    views = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
    )
    joined = clicks.join(
        views,
        (clicks.user_id == views.v_user_id)
        & (views.view_ts >= F.expr("ts - INTERVAL 6 HOUR"))
        & (views.view_ts <= clicks.ts),
        "left",
    )
    return joined.drop("v_user_id")


_LOOKUP_ORACLE = """
    WITH dim AS (  -- signups deduped latest-wins per (user, ts)
        SELECT user_id, dim_ts_all, version, dim_event_id
        FROM (
            SELECT user_id, ts AS dim_ts_all, value AS version,
                   event_id AS dim_event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, ts ORDER BY event_id DESC
                   ) AS rn
            FROM events WHERE event_type = 'signup'
        ) WHERE rn = 1
    ),
    facts AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    back AS (  -- latest dim at-or-before the fact, within ttl
        SELECT f.event_id, MAX(d.dim_ts_all) AS bts
        FROM facts f JOIN dim d
          ON d.user_id = f.user_id
         AND d.dim_ts_all <= f.ts AND d.dim_ts_all >= f.ts - INTERVAL 24 HOUR
        GROUP BY f.event_id
    ),
    fwd AS (   -- earliest dim after the fact, within ttl
        SELECT f.event_id, MIN(d.dim_ts_all) AS fts
        FROM facts f JOIN dim d
          ON d.user_id = f.user_id
         AND d.dim_ts_all > f.ts AND d.dim_ts_all <= f.ts + INTERVAL 24 HOUR
        GROUP BY f.event_id
    )
    SELECT f.event_id, f.user_id, f.ts, f.value,
           CASE WHEN b.bts IS NOT NULL THEN 'matched'
                WHEN w.fts IS NOT NULL THEN 'matched_early'
                ELSE 'dlq' END AS match_status,
           COALESCE(b.bts, w.fts) AS dim_ts,
           d.version AS dim_version,
           d.dim_event_id AS dim_dim_event_id
    FROM facts f
    LEFT JOIN back b ON f.event_id = b.event_id
    LEFT JOIN fwd w ON f.event_id = w.event_id
    LEFT JOIN dim d ON d.user_id = f.user_id AND d.dim_ts_all = COALESCE(b.bts, w.fts)
"""


@register("enrich_lookup_ttl_asof", oracle=_LOOKUP_ORACLE, headline=True)
def q_enrich_lookup_ttl_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 batch equivalent: clicks matched to the nearest signup under
    lookup-cache semantics (backward-latest within 24h TTL, else
    forward-earliest within TTL = early-arrival buffering, else DLQ)."""
    facts = _clicks(spark, sf_dir)
    dim = _signups(spark, sf_dir).select(
        "user_id",
        "ts",
        F.col("value").alias("version"),
        F.col("event_id").alias("dim_event_id"),
    )
    return lookup_ttl_asof_join(
        facts,
        dim,
        keys=["user_id"],
        fact_ts="ts",
        dim_ts="ts",
        ttl="24 HOUR",
        dim_payload=["version", "dim_event_id"],
    )


_DLQ_ORACLE = """
    WITH signup_users AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    )
    SELECT c.event_id, c.user_id, c.ts, c.value
    FROM events c
    WHERE c.event_type = 'click'
      AND c.user_id NOT IN (SELECT user_id FROM signup_users)
"""


@register("enrich_broadcast_dlq", oracle=_DLQ_ORACLE)
def q_enrich_broadcast_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: the DLQ branch — clicks whose user has no signup dimension row
    (left-anti join, the reference's unmatched side output)."""
    clicks = _clicks(spark, sf_dir)
    signups = _signups(spark, sf_dir).select("user_id")
    return clicks.join(signups, "user_id", "left_anti").select(
        "event_id", "user_id", "ts", "value"
    )


# --------------------------------------------------------------------------
# J4 — cogroup: both sides grouped by key into one co-located function call
# --------------------------------------------------------------------------

_COGROUP_ORACLE = """
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_signups
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    latest AS (
        SELECT user_id, value AS latest_signup_version
        FROM (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events WHERE event_type = 'signup'
        ) WHERE rn = 1
    )
    SELECT COALESCE(c.user_id, s.user_id) AS user_id,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(s.n_signups, 0) AS n_signups,
           l.latest_signup_version
    FROM c
    FULL OUTER JOIN s ON c.user_id = s.user_id
    LEFT JOIN latest l ON COALESCE(c.user_id, s.user_id) = l.user_id
"""


@register("cogroup_user_activity", oracle=_COGROUP_ORACLE)
def cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (cogroup, ScreenGlobalWindowWithLookupCacheEnricher.scala:43,
    LookupCacheDoFn.scala:34): clicks and signups co-partitioned by
    user_id into ONE Arrow-batched function call per key group —
    ``groupby().cogroup().applyInPandas`` is Spark's literal
    ``KV[K, (Iterable[V], Iterable[W])]``. Output: per-user activity
    profile with latest-wins signup version (the cache's tiebreak: max ts,
    then max event_id).

    Scale notes: one hash-partition shuffle per side on user_id (exactly
    the cogroup shuffle Beam plans); the pandas function sees one key
    group at a time, so memory is bounded by the largest single key.
    """
    import pandas as pd

    clicks = _clicks(spark, sf_dir).select("user_id", "event_id")
    signups = _signups(spark, sf_dir).select("user_id", "event_id", "ts", "value")

    def profile(cl: pd.DataFrame, sg: pd.DataFrame) -> pd.DataFrame:
        uid = cl["user_id"].iloc[0] if len(cl) else sg["user_id"].iloc[0]
        latest = None
        if len(sg):
            top = sg.sort_values(["ts", "event_id"], ascending=False).iloc[0]
            latest = float(top["value"])
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_clicks": [len(cl)],
                "n_signups": [len(sg)],
                "latest_signup_version": [latest],
            }
        )

    return (
        clicks.groupby("user_id")
        .cogroup(signups.groupby("user_id"))
        .applyInPandas(
            profile,
            schema="user_id long, n_clicks long, n_signups long, "
            "latest_signup_version double",
        )
    )

