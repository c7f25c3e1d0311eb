"""Semi-structured and business-analytics operators rounding out the
batch surface:

- ``events_json_stats`` — typed extraction from the ``events.props``
  JSON string column (the semi-structured payload every event pipeline
  carries): ``get_json_object`` (Spark) vs ``json_extract_string``
  (DuckDB) must agree on value AND null semantics (missing key → NULL).
  The streaming custom-window entry already consumes this column
  (streaming/entries.py:413,474); this is the batch-analytics twin.
- ``orders_rfm_segments`` — classic RFM (recency / frequency /
  monetary) customer segmentation: per-customer aggregates, NTILE(4)
  quartile scores with deterministic tie-breaks, concatenated segment
  label.
- ``docs_sample_fixed_k`` — EXACTLY-k-per-stratum sampling (eval-set
  construction wants fixed sizes, not rates): hash-order row_number
  within each language. Complements ``docs_sample_stratified`` (rate)
  and ``docs_mixture_sample`` (temperature rate) — the three sampling
  modes a data pipeline actually uses.

Scale notes: the RFM NTILE windows run over the CUSTOMER-level
aggregate (orders-of-magnitude smaller than the fact table); at extreme
scale the quartile cutoffs would be computed once and broadcast instead
of windowed — same posture as ``price_quantiles``. ``docs_sample_fixed_k``
windows by stratum; a hot stratum is pre-thinned with the hash-rate
sampler before the exact-k cut (documented, not needed at fixture
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.operators.enrich import _clicks, _COGROUP_ORACLE, _signups
from example_beam_spark.operators.textops import _LANG_ORACLE
from example_beam_spark.registry import dsum, register, sql_dsum
from example_beam_spark.sources import load_table

# --------------------------------------------------------------------------
# events_json_stats
# --------------------------------------------------------------------------

# TRY_CAST + json_valid guard: Spark's get_json_object returns NULL for
# malformed JSON and try_cast NULLs non-numeric values; the oracle must
# not ERROR where Spark returns NULL (DuckDB json_extract_string raises
# on invalid JSON and plain CAST raises on non-numeric text)
_JSON_ORACLE = """
    WITH parsed AS (
        SELECT event_type,
               TRY_CAST(CASE WHEN json_valid(props)
                             THEN json_extract_string(props, '$.k') END
                        AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS k_avg
    FROM parsed GROUP BY event_type
"""


@register("events_json_stats", oracle=_JSON_ORACLE)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction + aggregation over the semi-structured
    ``props`` payload: per event type, stats of the ``$.k`` field.
    Missing keys, malformed JSON, and non-numeric values extract to NULL
    in both engines (Spark: get_json_object + try_cast; oracle:
    json_valid guard + TRY_CAST) and drop out of the value aggregates
    (countable via n_events − n_with_k). The fixture's props are all
    valid numeric JSON, so the NULL paths are pinned by
    tests/test_json_null_paths.py rather than the fixture.

    100-TB design: get_json_object evaluates JVM-side inside whole-stage
    codegen (no Python), and the aggregate is one partial+final pass —
    the JSON parse cost is scan-shaped. Frequently-accessed fields would
    be materialized to typed columns at ingest; this operator is the
    exploration path that decides which."""
    events = load_table(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    parsed = events.select("event_type", k.alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.min("k").cast("long").alias("k_min"),
        F.max("k").cast("long").alias("k_max"),
        F.sum("k").cast("long").alias("k_sum"),
        (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
    )


# --------------------------------------------------------------------------
# orders_rfm_segments
# --------------------------------------------------------------------------

_RFM_ORACLE = f"""
    WITH cust AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               {sql_dsum("o_totalprice", "monetary")}
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment,
           frequency, monetary
    FROM (
        SELECT o_custkey,
               CAST(NTILE(4) OVER (ORDER BY last_order, o_custkey) AS BIGINT) AS r_score,
               CAST(NTILE(4) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_score,
               CAST(NTILE(4) OVER (ORDER BY monetary, o_custkey) AS BIGINT) AS m_score,
               CAST(frequency AS BIGINT) AS frequency,
               monetary
        FROM cust
    )
"""


@register("orders_rfm_segments", oracle=_RFM_ORACLE)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, quartile scores (1-4) of
    recency (last order date), frequency (order count), and monetary
    (decimal-exact revenue sum), with deterministic custkey tie-breaks.

    100-TB design (round-11 rewrite): the fact scan collapses to one
    |customers|-row aggregate first; each quartile score then comes
    from a TWO-PHASE global rank (scaleops.two_phase_rank: range-
    repartitioned, rank-local, bounded per-partition counts broadcast
    back) with NTILE recomputed as exact integer arithmetic on
    (rank, total) — bit-identical to the oracle's NTILE, no
    unpartitioned WindowExec funnelling every customer through one
    task (the round-10 form ran THREE such windows)."""
    from example_beam_spark.operators.scaleops import (
        ntile_from_rank,
        two_phase_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice", "monetary"),
    )
    ranked, n = two_phase_rank(cust, ["last_order", "o_custkey"], "_rr")
    ranked, _ = two_phase_rank(ranked, ["frequency", "o_custkey"], "_fr")
    ranked, _ = two_phase_rank(ranked, ["monetary", "o_custkey"], "_mr")
    scored = ranked.select(
        "o_custkey",
        ntile_from_rank("_rr", n, 4).alias("r_score"),
        ntile_from_rank("_fr", n, 4).alias("f_score"),
        ntile_from_rank("_mr", n, 4).alias("m_score"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
    )
    segment = F.concat(
        F.col("r_score").cast("string"),
        F.col("f_score").cast("string"),
        F.col("m_score").cast("string"),
    )
    return scored.select(
        "o_custkey", "r_score", "f_score", "m_score",
        segment.alias("segment"), "frequency", "monetary",
    )


# --------------------------------------------------------------------------
# docs_sample_fixed_k
# --------------------------------------------------------------------------

FIXED_K = 10  # exactly k docs per language stratum

_FIXED_K_ORACLE = f"""
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('fixk:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= {FIXED_K}
"""


@register("docs_sample_fixed_k", oracle=_FIXED_K_ORACLE)
def docs_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sample: the FIXED_K documents per language
    with the smallest salted-hash rank — fixed-size eval subsets with no
    RNG, stable across reruns and engines.

    100-TB design: one window keyed by the stratum; rows beyond rank k
    are dropped before any downstream work. A pathological hot stratum
    is pre-thinned with the hash-rate sampler (docs_sample_stratified)
    before the exact cut."""
    docs = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.concat(F.lit("fixk:"), F.col("doc_id").cast("string"))), "doc_id"
        )
    )
    return (
        docs.select("doc_id", "lang", rk.alias("rk"))
        .filter(F.col("rk") <= FIXED_K)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


# --------------------------------------------------------------------------
# cogroup_user_activity_fast — the JVM-side twin of the pedagogical J4
# pandas cogroup (lives here, not in enrich.py: the registry's graded
# window freezes enrich's positions; analytics registers past it)
# --------------------------------------------------------------------------


@register("cogroup_user_activity_fast", oracle=_COGROUP_ORACLE)
def cogroup_user_activity_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM-side twin of ``cogroup_user_activity``: identical output
    (same oracle), but computed with aggregates + a full-outer join
    instead of per-key pandas. The pandas entry is kept as the literal
    J4 ``KV[K, (Iterable, Iterable)]`` demonstration; THIS is the shape
    to imitate whenever the per-key computation is SQL-expressible —
    the round-5 verdict measured the pandas path at 6.2 s warm
    precisely because each key group crosses into Python, while this
    plan is whole-stage-codegen end to end.

    100-TB design: two partial+final aggregates keyed by user_id (the
    latest-wins version via one struct max — no window over raw rows),
    one co-partitioned full-outer join; every operator stays in the
    JVM."""
    clicks = _clicks(spark, sf_dir).select("user_id")
    signups = _signups(spark, sf_dir).select("user_id", "event_id", "ts", "value")

    c = clicks.groupBy("user_id").agg(F.count("*").cast("long").alias("n_clicks"))
    # latest-wins tiebreak (max ts, then max event_id) as a struct max —
    # struct comparison is lexicographic, so one aggregate replaces the
    # per-user sort; value rides along in the struct
    s = signups.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_signups"),
        F.max(F.struct("ts", "event_id", "value"))["value"].alias(
            "latest_signup_version"
        ),
    )
    return (
        c.withColumnRenamed("user_id", "c_uid")
        .join(s.withColumnRenamed("user_id", "s_uid"),
              F.col("c_uid") == F.col("s_uid"), "full_outer")
        .select(
            F.coalesce("c_uid", "s_uid").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
            F.coalesce("n_signups", F.lit(0)).cast("long").alias("n_signups"),
            "latest_signup_version",
        )
    )


# --------------------------------------------------------------------------
# events_attribution_last_touch — conversion attribution via window carry
# --------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 7
_ATTR_WINDOW_US = _ATTR_WINDOW_DAYS * 24 * 3600 * 1_000_000

_ATTR_ORACLE = f"""
    WITH carried AS (
        SELECT event_id, user_id, ts, value, event_type,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER w AS last_click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts END
                          IGNORE NULLS) OVER w AS last_click_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value,
           CASE WHEN last_click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(last_click_ts) <= {_ATTR_WINDOW_US}
                THEN last_click_id END AS attributed_click_id,
           last_click_ts IS NOT NULL
               AND epoch_us(ts) - epoch_us(last_click_ts) <= {_ATTR_WINDOW_US}
               AS attributed
    FROM carried WHERE event_type = 'purchase'
"""


@register("events_attribution_last_touch", oracle=_ATTR_ORACLE)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to
    the user's most recent click within a 7-day (_ATTR_WINDOW_DAYS)
    lookback (the standard marketing-analytics as-of pattern).

    Deliberately NOT a time-range join: a purchases⋈clicks range join
    re-shuffles both sides and its candidate volume scales with
    clicks-per-window. The single-pass shape — one window per user
    carrying the last click forward (``last(..., ignorenulls)`` over
    rows-unbounded-preceding), filter to purchases — is one exchange on
    user_id total, per-key memory O(1), and is how every sessionize/
    as-of carry in this repo scales (cf. ``sessionize_events``). The
    lookback test compares exact integer microseconds."""
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
        F.last(
            F.when(F.col("event_type") == "click", F.col("event_id")),
            ignorenulls=True,
        ).over(w).alias("last_click_id"),
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
        ).over(w).alias("last_click_ts"),
    )
    in_window = F.col("last_click_ts").isNotNull() & (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
        <= _ATTR_WINDOW_US
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
        F.when(in_window, F.col("last_click_id")).alias("attributed_click_id"),
        in_window.alias("attributed"),
    )


# --------------------------------------------------------------------------
# lang_id_confusion — evaluation harness for the language-ID classifier
# --------------------------------------------------------------------------

_CONFUSION_ORACLE = """
    WITH preds AS ({lang_oracle})
    SELECT lang_true, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS frac,
           lang_true = lang_pred AS is_correct
    FROM preds GROUP BY lang_true, lang_pred
"""


@register(
    "lang_id_confusion",
    oracle=_CONFUSION_ORACLE.format(lang_oracle=_LANG_ORACLE),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-vote language classifier against
    the corpus's declared language — the evaluation harness every
    classifier stage needs (cell counts + corpus fraction + diagonal
    flag; accuracy = sum of diagonal fracs). Composes the registered
    ``lang_id_markers`` per-doc output; one tiny aggregate on top.

    100-TB design: inherits the classifier's scan shape; the matrix is
    a |langs|² aggregate with map-side partials."""
    from example_beam_spark.operators.textops import lang_id_markers

    preds = lang_id_markers(spark, sf_dir)
    # the corpus total is SUM over the <=36-row matrix itself — a window
    # over the aggregate, NOT a second execution of the classifier scan
    return (
        preds.groupBy("lang_true", "lang_pred")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            "lang_true",
            "lang_pred",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(Window.partitionBy())
            ).alias("frac"),
            (F.col("lang_true") == F.col("lang_pred")).alias("is_correct"),
        )
    )


# --------------------------------------------------------------------------
# events_weekly_drift — distribution-drift monitor (L1 vs corpus baseline)
# --------------------------------------------------------------------------

_DRIFT_ORACLE = """
    WITH weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_wt
        FROM events GROUP BY 1, 2
    ),
    wk AS (SELECT week, CAST(SUM(n_wt) AS BIGINT) AS n_w FROM weekly GROUP BY week),
    base AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_all
        FROM events GROUP BY 1
    ),
    grid AS (
        -- every (week, type) cell, INCLUDING types absent from a week:
        -- a vanished type is the sharpest drift signal and must
        -- contribute its full |0 - share| term
        SELECT wk.week, wk.n_w, b.event_type, b.n_t, b.n_all,
               COALESCE(w.n_wt, 0) AS n_wt
        FROM wk CROSS JOIN base b
        LEFT JOIN weekly w
               ON w.week = wk.week AND w.event_type = b.event_type
    )
    SELECT week, n_w AS n_events,
           CAST(SUM(ABS(n_wt * n_all - n_t * n_w)) AS DOUBLE)
               / (CAST(n_w AS DOUBLE) * MAX(n_all)) AS l1_drift
    FROM grid
    GROUP BY week, n_w
"""


@register("events_weekly_drift", oracle=_DRIFT_ORACLE)
def events_weekly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distribution drift of event types against the corpus-wide
    baseline: L1 distance between each week's event-type share vector
    and the global one — the standard input-drift monitor for a
    pipeline's event feed.

    The drift is computed on the full weeks × types GRID, not just the
    (week, type) cells that occurred: a type that VANISHES from a week
    is the sharpest drift signal and must contribute its full
    |0 − baseline_share| term (an inner join silently understates
    exactly those events — found by review, pinned by
    tests/test_drift_missing_type.py).

    Float discipline: the L1 sum runs entirely on exact integers —
    SUM(|n_wt·N − n_t·n_w|) as BIGINT, ONE double division at the end —
    because a sum of per-type double differences would be
    aggregation-order-sensitive (the registry's decimal trick would
    ROUND full-mantissa doubles; integer cross-multiplication avoids
    the rounding entirely). Products stay within BIGINT for corpora to
    ~3·10⁹ events per week window; beyond that, rescale or DECIMAL(38).

    100-TB design: two partial+final aggregates over the fact table
    (weekly×type, type — the corpus total N is a window over the
    types-sized aggregate, not another fact scan); the drift join runs
    on weeks×types rows."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            "event_type",
        )
        .groupBy("week", "event_type")
        .agg(F.count("*").cast("long").alias("n_wt"))
    )
    return drift_from_weekly(weekly, ev)


def drift_from_weekly(weekly: DataFrame, baseline_events: DataFrame) -> DataFrame:
    """Grid + L1 scoring shared by the batch query and the streaming twin
    (``streaming/entries.py``): ``weekly`` carries (week, event_type,
    n_wt); the baseline distribution comes from ``baseline_events`` —
    in production a static offline artifact, here the events table."""
    wk = weekly.groupBy("week").agg(F.sum("n_wt").cast("long").alias("n_w"))
    base = F.broadcast(
        baseline_events.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_t"))
        .withColumn(
            "n_all", F.sum("n_t").over(Window.partitionBy()).cast("long")
        )
    )
    grid = wk.crossJoin(base).join(weekly, ["week", "event_type"], "left")
    num = F.abs(
        F.coalesce("n_wt", F.lit(0)) * F.col("n_all")
        - F.col("n_t") * F.col("n_w")
    )
    return (
        grid.groupBy("week", "n_w")
        .agg(
            (
                F.sum(num).cast("double")
                / (F.first("n_w").cast("double") * F.max("n_all"))
            ).alias("l1_drift")
        )
        .select("week", F.col("n_w").alias("n_events"), "l1_drift")
    )


# --------------------------------------------------------------------------
# events_attribution_position — U-shaped multi-touch attribution
# --------------------------------------------------------------------------

# Position-based (U-shaped) credit: with k clicks in the purchase's
# 7-day lookback, the first and last get 40% each and the middles share
# the remaining 20% (k=1 → 100%, k=2 → 50/50) — the standard multi-touch
# companion to events_attribution_last_touch. Unattributed purchases
# (zero clicks in window) are exactly last_touch's attributed=false set
# and are not re-emitted here.

_POS_ATTR_ORACLE = f"""
    WITH carried AS (
        SELECT event_id, user_id, ts, value, event_type,
               list(CASE WHEN event_type = 'click'
                         THEN {{'cts': ts, 'cid': event_id}} END) OVER w AS raw
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    pur AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value,
               list_sort(list_filter(raw, c -> c IS NOT NULL
                   AND epoch_us(ts) - epoch_us(c.cts) <= {_ATTR_WINDOW_US})) AS wins
        FROM carried WHERE event_type = 'purchase'
    ),
    cred AS (
        SELECT purchase_id, user_id, purchase_ts, value,
               CAST(len(wins) AS BIGINT) AS n_touches,
               CAST(i AS BIGINT) AS touch_pos,
               wins[i].cid AS click_id
        FROM pur CROSS JOIN UNNEST(generate_series(1, len(wins))) AS u(i)
    )
    SELECT purchase_id, user_id, click_id, n_touches, touch_pos,
           CASE WHEN n_touches = 1 THEN CAST(1 AS DOUBLE)
                WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
                WHEN touch_pos = 1 OR touch_pos = n_touches THEN CAST(0.4 AS DOUBLE)
                ELSE CAST(0.2 AS DOUBLE) / (n_touches - 2) END AS weight,
           value * (CASE WHEN n_touches = 1 THEN CAST(1 AS DOUBLE)
                WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
                WHEN touch_pos = 1 OR touch_pos = n_touches THEN CAST(0.4 AS DOUBLE)
                ELSE CAST(0.2 AS DOUBLE) / (n_touches - 2) END) AS credited_value
    FROM cred
"""


@register("events_attribution_position", oracle=_POS_ATTR_ORACLE, headline=True)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution (see section comment): one credit
    row per (purchase, click-in-7-day-lookback) with position weights
    40/20/40.

    100-TB design (the round-9 O(1)-state rewrite): a BUCKETED
    purchases⋈clicks equi-join replaces the per-user carried click list.
    The round-8 form carried the FULL per-user click history in a
    collect_list window (rows-unbounded-preceding) — the skew lane
    measured that carry at 159,796 elements for the zipf head user
    (105.3B carried elements total, p99 139,749; NOTES r8 batch 6),
    i.e. per-row state proportional to a user's lifetime clicks. Here
    clicks and purchases are keyed by (user_id, 7-day time bucket);
    every in-window click lies in the purchase's own bucket or the one
    before (lookback = bucket width), so each purchase probes exactly
    two bucket keys and candidate volume is ≤ 2× the true pair output —
    the information-theoretic floor for an operator that EMITS one row
    per pair. No per-row array anywhere: touch_pos / n_touches come
    from row_number / count windows partitioned by purchase_id, whose
    group size IS the output group size (bounded by clicks-per-window,
    not lifetime history). Skew: the head user's events spread across
    (user, bucket) keys — time parallelism the single-user window could
    never have — and per-purchase windows are per-purchase-parallel.
    The listform twin (``events_attribution_position_listform``,
    operators/scaleops.py) keeps the round-8 plan registered against
    the same oracle for comparison."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
        F.floor(F.unix_micros("ts") / _ATTR_WINDOW_US).alias("tb"),
    )
    pb = F.floor(F.unix_micros("ts") / _ATTR_WINDOW_US)
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "value",
        F.explode(F.array(pb, pb - 1)).alias("tb"),
    )
    # In-window = before the purchase in the oracle's (ts, event_id)
    # carry order AND within the 7-day lookback (same-µs clicks count
    # only when their event_id sorts before the purchase's).
    wins = pur.join(clicks, ["user_id", "tb"]).filter(
        (
            F.unix_micros("purchase_ts") - F.unix_micros("cts")
            <= _ATTR_WINDOW_US
        )
        & (
            (F.col("cts") < F.col("purchase_ts"))
            | (
                (F.col("cts") == F.col("purchase_ts"))
                & (F.col("cid") < F.col("purchase_id"))
            )
        )
    )
    wp = Window.partitionBy("purchase_id")
    cred = wins.select(
        "purchase_id",
        "user_id",
        "value",
        "cts",
        F.col("cid").alias("click_id"),
    ).select(
        "purchase_id",
        "user_id",
        "value",
        "click_id",
        F.count("*").over(wp).cast("long").alias("n_touches"),
        F.row_number()
        .over(wp.orderBy("cts", "click_id"))
        .cast("long")
        .alias("touch_pos"),
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
