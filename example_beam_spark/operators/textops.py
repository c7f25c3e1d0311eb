"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting). Not present in the reference (which has no
scalar-function library at all, SURVEY.md §2.7); built per the
north-star extension scope in BASELINE.json.

All operators are pure built-in column expressions (whole-stage codegen,
no Python in the hot path) and are engine-portable: every construct has an
exact DuckDB equivalent so the oracle hashes match:

- token split: single-space split (the corpus is single-space separated);
- hashes: md5 hex strings (identical in every engine) — lexicographic MIN
  over md5s is the portable min-hash;
- ratios: per-row double arithmetic (IEEE-deterministic), no
  transcendentals (exp/log differ across libm builds — avoided).

Scale: each operator is a narrow projection — at 100 TB these run as a
single scan stage with no shuffle (fingerprint/stats) or one partial+final
aggregation; column pruning keeps IO to ``doc_id, text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# language marker words → deterministic vote-based language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized corpus markers
}


def _sql_in(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
# text_stats — token counts, punctuation/stopword ratios, quality score
# --------------------------------------------------------------------------

_STATS_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_space_fields,
           CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
               AS BIGINT) AS n_punct,
           CAST(len(list_filter(toks, x -> x IN ({_sql_in(STOPWORDS)}))) AS BIGINT)
               AS n_stopwords,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
               AS avg_token_len,
           CAST(len(list_filter(toks, x -> x IN ({_sql_in(STOPWORDS)}))) AS DOUBLE)
               / len(toks) AS stopword_ratio,
           (CAST(len(list_filter(toks, x -> x IN ({_sql_in(STOPWORDS)}))) AS DOUBLE)
               / len(toks)) * 0.5
             + LEAST(1.0, len(toks) / 100.0) * 0.5 AS quality_score
    FROM t
"""


@register("text_stats", oracle=_STATS_ORACLE, headline=True)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count, punctuation count, stopword ratio, average
    token length, and a deterministic quality score (stopword-density +
    length saturation — the classic heuristic-quality-filter shape)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # placeholder, replaced below
    # array_intersect dedupes; count with filter instead for multiplicity
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    no_space = F.regexp_replace(F.col("text"), " ", "")
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[^a-z0-9 ]", "")
    )
    stop_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        (F.length(F.col("text")) - F.length(no_space) + 1)
        .cast("long")
        .alias("n_space_fields"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        (F.length(no_space).cast("double") / n_tokens).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (stop_ratio * 0.5 + F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5).alias(
            "quality_score"
        ),
    )


# --------------------------------------------------------------------------
# lang_id — marker-word voting language identifier
# --------------------------------------------------------------------------


def _lang_vote_sql(lang: str) -> str:
    return (
        f"CAST(len(list_filter(toks, x -> x IN ({_sql_in(LANG_MARKERS[lang])}))) AS BIGINT)"
    )


_LANG_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    votes AS (
        SELECT doc_id, lang AS lang_true,
               {", ".join(f"{_lang_vote_sql(l)} AS v_{l}" for l in sorted(LANG_MARKERS))}
        FROM t
    )
    SELECT doc_id, lang_true, v_de, v_en, v_es, v_fr, v_zh,
           CASE
             WHEN GREATEST(v_de, v_en, v_es, v_fr, v_zh) = 0 THEN 'unknown'
             WHEN v_de >= GREATEST(v_en, v_es, v_fr, v_zh) THEN 'de'
             WHEN v_en >= GREATEST(v_es, v_fr, v_zh) THEN 'en'
             WHEN v_es >= GREATEST(v_fr, v_zh) THEN 'es'
             WHEN v_fr >= v_zh THEN 'fr'
             ELSE 'zh'
           END AS lang_pred
    FROM votes
"""


@register("lang_id_markers", oracle=_LANG_ORACLE)
def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word voting language ID (n-gram-heuristic family): count
    marker hits per language, argmax with a fixed alphabetical tiebreak,
    'unknown' when no marker fires."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    def vote(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in markers])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("long")

    votes = {lang: vote(markers) for lang, markers in LANG_MARKERS.items()}
    df = docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        *[votes[lang].alias(f"v_{lang}") for lang in sorted(LANG_MARKERS)],
    )
    v = {lang: F.col(f"v_{lang}") for lang in LANG_MARKERS}
    pred = (
        F.when(
            F.greatest(*[v[x] for x in sorted(v)]) == 0, F.lit("unknown")
        )
        .when(v["de"] >= F.greatest(v["en"], v["es"], v["fr"], v["zh"]), F.lit("de"))
        .when(v["en"] >= F.greatest(v["es"], v["fr"], v["zh"]), F.lit("en"))
        .when(v["es"] >= F.greatest(v["fr"], v["zh"]), F.lit("es"))
        .when(v["fr"] >= v["zh"], F.lit("fr"))
        .otherwise(F.lit("zh"))
    )
    return df.withColumn("lang_pred", pred)


# --------------------------------------------------------------------------
# token_count_bpe — regex tokenizer count (BPE-ish pre-tokenization)
# --------------------------------------------------------------------------

_BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"

_BPE_ORACLE = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS DOUBLE)
               / n_chars AS tokens_per_char
    FROM documents
"""


@register("token_count_bpe", oracle=_BPE_ORACLE)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (letter runs,
    single digits, single punctuation) — the standard proxy for LLM token
    budgeting at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_bpe_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        (n_tok.cast("double") / F.col("n_chars")).alias("tokens_per_char"),
    )


# --------------------------------------------------------------------------
# doc_fingerprint — shingle min-hash fingerprint (winnowing-lite)
# --------------------------------------------------------------------------

_FP_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    sh AS (
        SELECT doc_id, md5(array_to_string(s[i:i+4], ' ')) AS h
        FROM toks CROSS JOIN
             UNNEST(generate_series(1, GREATEST(len(s) - 4, 0))) AS u(i)
    ),
    agg AS (
        SELECT doc_id, MIN(h) AS fingerprint,
               COUNT(DISTINCT h) AS n_distinct_shingles
        FROM sh GROUP BY doc_id
    )
    SELECT d.doc_id,
           a.fingerprint,
           COALESCE(a.n_distinct_shingles, 0) AS n_distinct_shingles
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register("doc_fingerprint", oracle=_FP_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-token shingle fingerprint: MIN(md5(shingle)) — a one-hash
    MinHash, the winnowing-style content fingerprint. Computed entirely
    inside array expressions (no explode → no shuffle, single scan)."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.split(F.col("text"), " ")
    hashes = F.when(
        F.size(s) >= 5,
        F.transform(
            F.sequence(F.lit(0), F.size(s) - 5),
            lambda i: F.md5(F.concat_ws(" ", F.slice(s, i + 1, 5))),
        ),
    )
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fingerprint"),
        F.coalesce(F.size(F.array_distinct(hashes)), F.lit(0))
        .cast("long")
        .alias("n_distinct_shingles"),
    )


# --------------------------------------------------------------------------
# docs_sample_stratified — deterministic hash sampling per stratum (the
# corpus-subsetting step of a training-data pipeline: no RNG state, no
# seed coordination — membership is a pure function of the key, so the
# sample is stable across reruns, engines, and cluster topologies)
# --------------------------------------------------------------------------

_SAMPLE_MOD = 16  # keep 1/16 per language stratum


_SAMPLE_ORACLE = f"""
    WITH tagged AS (
        SELECT doc_id, lang, source, n_chars,
               CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 7))
                    AS BIGINT) % {_SAMPLE_MOD} AS slot
        FROM documents
    )
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM tagged WHERE slot = 0
"""


@register("docs_sample_stratified", oracle=_SAMPLE_ORACLE)
def docs_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1/{m} deterministic sample: keep a doc iff 28 md5 bits of its salted
    id ≡ 0 (mod {m}). Hash-based membership keeps strata proportions
    unbiased in expectation, needs no shuffle or state, and composes with
    any predicate pushdown — at 100 TB the sample IS the scan filter.""".format(
        m=_SAMPLE_MOD
    )
    docs = load_table(spark, sf_dir, "documents")
    slot = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 7),
            16,
            10,
        ).cast("long")
        % _SAMPLE_MOD
    )
    return docs.filter(slot == 0).select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


# --------------------------------------------------------------------------
# docs_pack_sequences — deterministic sequence packing: assign documents
# (in doc_id order within a language) to fixed-budget token bins via a
# running token total — the pack-documents-into-context-windows step of an
# LLM data pipeline, expressed as a window function (one shuffle, no
# Python, no iteration)
# --------------------------------------------------------------------------

_PACK_BUDGET = 4096


_PACK_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(text, '{{bpe}}')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    runs AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS tokens_before
        FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(tokens_before % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM runs
"""


@register(
    "docs_pack_sequences",
    oracle=_PACK_ORACLE.format(bpe=_BPE_PATTERN),
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_tokens, pack_id, pack_offset): each doc lands in
    the 4096-token context bin its running total reaches (docs longer than
    the budget span bins — splitting is the downstream tokenizer's job).

    Two-phase prefix sum (round-11 rewrite). The round-10 form ran ONE
    window task per language — Spark's WindowExec executes a window
    partition in a single task, so a handful of languages serialized the
    whole corpus (the docstring's old "distributed prefix-sum" claim was
    wrong). Now: a 1-row max(doc_id) probe (bounded driver artifact, the
    sessionize_events_auto discipline) fixes 256 order-congruent doc_id
    range buckets; the per-(lang, bucket) cumsum windows run 256-way
    parallel per language; the tokenized summary frame (doc_id, lang,
    n_tokens, bucket — never text, ~32 bytes/doc) is persisted so the
    corpus is tokenized ONCE and both consumers (the cumsum window and
    the per-bucket totals aggregate) read the cache; per-language prefix
    sums run over <=256 bounded summary rows and broadcast back:
    tokens_before = bucket base + local cumsum - own tokens. No
    single-task structure touches document rows. (Measured at the 200k
    zipfian lane: the first rewrite shared the window EXCHANGE instead
    of persisting, which re-ran the Sort+Window above it twice — 6.65 s
    vs the old single-task form's 5.14; the persist form wins outright.)"""
    from pyspark.sql import Window

    from example_beam_spark.registry import defer_cleanup

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)).cast(
        "long"
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    width = max(1, (int(max_id) + 1 + 255) // 256) if max_id is not None else 1
    # coalesce makes bucket NON-NULLABLE so the inner equi-join on it
    # infers no isnotnull filter into either subtree
    toks = (
        docs.select("doc_id", "lang", n_tok.alias("n_tokens"))
        .withColumn(
            "bucket",
            F.coalesce(F.expr(f"doc_id div {width}"), F.lit(-1)).cast("long"),
        )
        .persist()
    )
    defer_cleanup(lambda: toks.unpersist())
    wloc = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("local_cum", F.sum("n_tokens").over(wloc))
    summ = toks.groupBy("lang", "bucket").agg(F.sum("n_tokens").alias("bsum"))
    wsum = Window.partitionBy("lang").orderBy("bucket")
    base = summ.withColumn(
        "base",
        F.coalesce(
            F.sum("bsum").over(wsum.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select("lang", "bucket", "base")
    runs = local.join(F.broadcast(base), ["lang", "bucket"]).withColumn(
        "tokens_before", F.col("base") + F.col("local_cum") - F.col("n_tokens")
    )
    return runs.select(
        "doc_id",
        "lang",
        "n_tokens",
        # integer floor division (not double /): exact at any magnitude,
        # matching the oracle's // — double loses integers past 2^53
        F.expr(f"tokens_before div {_PACK_BUDGET}").cast("long").alias("pack_id"),
        (F.col("tokens_before") % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# --------------------------------------------------------------------------
# span_dedup — sub-document exact dedup: non-overlapping 16-token spans
# repeated across documents (the span/passage-level pass of a corpus
# cleaning pipeline — catches boilerplate and partial copies that whole-
# document hashing misses)
# --------------------------------------------------------------------------

_SPAN_TOKENS = 16


_SPAN_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
    spans AS (
        SELECT doc_id, md5(array_to_string(s[i:i+{_SPAN_TOKENS - 1}], ' ')) AS span_hash
        FROM toks CROSS JOIN
             UNNEST(generate_series(1, GREATEST(len(s) - {_SPAN_TOKENS - 1}, 0),
                                    {_SPAN_TOKENS})) AS u(i)
    )
    SELECT span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM spans
    GROUP BY span_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
"""


@register("span_dedup", oracle=_SPAN_ORACLE)
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-token non-overlapping spans that recur in >= 2 documents:
    explode chunk positions (codegen'd slice+concat, no lambda), md5 per
    span, one partial+final aggregate keyed by the hash. Map-side work is
    linear in corpus tokens and the shuffle carries one short row per
    span — the shape that stays cheap at 100 TB. Downstream, a cleaning
    pass anti-joins documents against these hashes to strip boilerplate."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.split(F.col("text"), " ")
    spans = (
        docs.select("doc_id", s.alias("s"))
        .select(
            "doc_id",
            "s",
            # guard: Spark's sequence(1, 0, +step) raises where DuckDB's
            # generate_series returns empty — emit an empty array for
            # docs shorter than one span (explode then drops the row)
            F.explode(
                F.when(
                    F.size("s") >= _SPAN_TOKENS,
                    F.sequence(
                        F.lit(1),
                        F.size("s") - (_SPAN_TOKENS - 1),
                        F.lit(_SPAN_TOKENS),
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.slice("s", F.col("i"), _SPAN_TOKENS))).alias(
                "span_hash"
            ),
        )
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
