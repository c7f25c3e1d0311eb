"""Registered queries that execute REAL Structured Streaming jobs against
the corpus parquet and return their final results as a batch DataFrame —
so the driver's DuckDB oracle can gate streaming execution too.

Pattern: readStream(parquet) → withWatermark → windowed aggregation →
``foreachBatch`` sink appending update-mode batches (tagged with batch id)
to a parquet staging dir → availableNow trigger drains the source → read
staging back and keep each key's LAST update (update mode re-emits the
accumulated aggregate, so the last row per key IS the final state — this
is exactly the reference's ACCUMULATING_FIRED_PANES final pane). The
result is provably equal to the batch query, hence the SAME oracle SQL
as the batch variant.

Scale notes: the staging-parquet + last-update-wins pattern is the
standard exactly-once upsert sink shape (foreachBatch → MERGE in real
deployments); nothing is collected on the driver.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from example_beam_spark import schemas
from example_beam_spark.operators.ctr import _ctr_oracle
from example_beam_spark.registry import register
from example_beam_spark.sources.parquet import table_path
from example_beam_spark.streaming.ctr_stream import ctr_fixed_window_stream


def _stage_dir(sf_dir: str, name: str, variant: str = "") -> str:
    """Spark's streaming file source requires a *directory* (it derives
    basePath from the glob and rejects a bare file); the corpus tables are
    single parquet files. Stage a symlink into a temp dir once per
    (sf_dir, table, variant) — zero-copy, and at scale the source would
    already be a directory of part-files so this shim disappears."""
    key = (os.path.abspath(sf_dir), name + variant)
    d = _STAGE_CACHE.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"stream_src_{name}_")
        os.symlink(table_path(sf_dir, name), os.path.join(d, f"{name}.parquet"))
        _STAGE_CACHE[key] = d
    return d


_STAGE_CACHE: dict[tuple[str, str], str] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (same ns→µs handling as the
    batch source)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType(), False)
            for f in schemas.EVENTS.fields
        ]
    )
    df = spark.readStream.schema(raw).parquet(_stage_dir(sf_dir, "events"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_final(
    agg: DataFrame, key_cols: list[str], spark: SparkSession
) -> DataFrame:
    """Drain a streaming aggregation with availableNow + update-mode
    foreachBatch into staging parquet; return last-update-per-key."""
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

    def sink(bdf: DataFrame, bid: int) -> None:
        bdf.withColumn("_batch", F.lit(bid)).write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(out_dir)
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_batch"))
    final = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch")
    )
    # staging dirs are left for the consumer's lifetime (tmp space); the
    # returned DataFrame lazily re-reads them on every action.
    shutil.rmtree(ckpt, ignore_errors=True)
    return final


@register("ctr_fixed_capped_stream", oracle=_ctr_oracle(3600, capped=True))
def ctr_fixed_capped_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship CTR query executed as a REAL streaming job (StateStore
    windowed aggregation, watermark, update mode) — final state equals the
    batch ctr_fixed_capped result, gated by the same oracle."""
    ev = read_events_stream(spark, sf_dir).withColumnRenamed("ts", "event_time")
    ev = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "event_time",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("clicks"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("impressions"),
    )
    ev = ev.withWatermark("event_time", "1 hour")
    agg = ctr_fixed_window_stream(ev, keys=["user_id"], window_duration="1 hour", capped=True)
    return run_to_final(agg, ["user_id", "window_start"], spark)


def run_to_append(agg: DataFrame, spark: SparkSession) -> DataFrame:
    """Drain an append-mode stateful streaming query (availableNow) into
    staging parquet and return everything appended."""
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

    def sink(bdf: DataFrame, bid: int) -> None:
        bdf.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register("lookup_cache_join_stream", oracle=None)
def lookup_cache_join_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's stateful lookup-cache join (J3/U1-U6) as a REAL
    applyInPandasWithState streaming job over the corpus: signups are the
    dimension (latest-wins cache, 24h TTL), clicks the facts; early facts
    buffer, expired facts go to the DLQ. Non-SQL-expressible (keyed state
    + event-time timers) → rows-only gate; semantics are covered by the
    replay-harness suite (tests/test_stateful.py)."""
    from example_beam_spark.streaming.lookup_cache import (
        KIND_DIM,
        KIND_FACT,
        lookup_cache_join_stream,
    )

    ev = read_events_stream(spark, sf_dir).withColumnRenamed("ts", "event_time")
    union = ev.filter(F.col("event_type").isin("click", "signup")).select(
        F.col("user_id").cast("string").alias("key"),
        F.when(F.col("event_type") == "signup", F.lit(KIND_DIM))
        .otherwise(F.lit(KIND_FACT))
        .alias("kind"),
        F.when(
            F.col("event_type") == "signup", F.col("value").cast("string")
        )
        .otherwise(F.col("event_id").cast("string"))
        .alias("payload"),
        "event_time",
    )
    union = union.withWatermark("event_time", "1 hour")
    joined = lookup_cache_join_stream(union, ttl_seconds=24 * 3600)
    return run_to_append(joined, spark)


@register("ctr_custom_window_stream", oracle=None)
def ctr_custom_window_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's custom merging ad-event window (W5) as a REAL
    stateful streaming job over the corpus: key (user_id, props.k) plays
    (screen_id, ad_id); click/view play click/impression; asymmetric
    10min-forward / 1min-back windows, merged, capped CTR at window close.
    Non-SQL-expressible (merging windows) → rows-only gate; semantics
    covered in tests/test_stateful.py."""
    from example_beam_spark.streaming.custom_window import (
        ad_ctr_custom_window_stream,
    )

    ev = read_events_stream(spark, sf_dir).withColumnRenamed("ts", "event_time")
    ads = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").cast("string").alias("screen_id"),
        F.get_json_object("props", "$.k").alias("ad_id"),
        F.when(F.col("event_type") == "click", F.lit("click"))
        .otherwise(F.lit("impression"))
        .alias("action"),
        "event_time",
    )
    ads = ads.withWatermark("event_time", "1 hour")
    out = ad_ctr_custom_window_stream(ads, 600, 60)
    return run_to_append(out, spark)


_SENTINEL_USER = -1
# 2100-01-01 as int64 nanoseconds — far past any corpus event time.
_SENTINEL_TS_NANOS = 4102444800 * 1_000_000_000


def read_events_stream_flushed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like :func:`read_events_stream`, but the staging dir also carries a
    far-future *sentinel* event (user_id = -1, ts = year 2100). Session
    windows only support append output, which emits a session when the
    watermark passes its end — without the sentinel, every session within
    (watermark delay + gap) of the corpus max event time would be stranded
    in the state store when availableNow drains. The sentinel drives the
    watermark past everything; availableNow's multi-batch executor then
    runs the extra flush batch. Callers must drop sentinel rows AFTER
    withWatermark (unsplittable CASE predicate — see harness module doc)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType(), False)
            for f in schemas.EVENTS.fields
        ]
    )
    d = _stage_dir(sf_dir, "events", variant="+sentinel")
    sentinel_file = os.path.join(d, "zz_sentinel.parquet")
    if not os.path.exists(sentinel_file):
        row = dict(
            event_id=-1,
            ts=_SENTINEL_TS_NANOS,
            user_id=_SENTINEL_USER,
            event_type="__sentinel__",
            value=0.0,
            props=None,
        )
        spark.createDataFrame([row], raw).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sentinel_file)
    df = spark.readStream.schema(raw).parquet(d)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


@register("sessionize_events_stream", oracle=None)
def sessionize_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization via the built-in session_window (gap-based
    merging windows — the built-in cousin of the reference's custom merging
    WindowFn). Append mode (the only mode session windows support) + a
    watermark-advancing sentinel so every session flushes. No SQL oracle:
    session_window merge semantics aren't expressible in one portable SQL
    statement; gated rows-only here and batch-equivalence-tested in
    tests/test_streaming.py."""
    ev = read_events_stream_flushed(spark, sf_dir).withColumnRenamed(
        "ts", "event_time"
    )
    ev = ev.withWatermark("event_time", "1 hour")
    # Drop the sentinel AFTER the watermark node; the CASE-shaped predicate
    # is watermark-anchored so Catalyst can't push it below EventTimeWatermark.
    ev = ev.filter(
        F.when(F.col("user_id") != _SENTINEL_USER, F.col("event_time")).isNotNull()
    )
    agg = ev.groupBy(
        "user_id", F.session_window("event_time", "30 minutes").alias("w")
    ).agg(
        F.count("*").alias("n_events"),
        F.max("event_time").alias("last_event_time"),
    )
    out = agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "last_event_time",
    )
    return run_to_append(out, spark)
