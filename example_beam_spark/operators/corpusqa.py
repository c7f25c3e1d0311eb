"""Corpus-quality operators for a training-data pipeline: intra-document
repetition signals and a global vocabulary build.

Round-5 additions to the LLM-pipeline extension surface (SURVEY §2
extensions; the text-analysis family in ``operators/textops.py``):

- ``doc_repetition_ngrams`` — the repetition quality filter from the
  public Gopher corpus-filtering recipe (Rae et al., "Scaling Language
  Models: ... Gopher", arXiv:2112.11446 §A1.1: documents whose most
  frequent n-gram or duplicated n-gram mass exceeds a threshold are
  dropped): per-document fraction of duplicated 3-gram occurrences and
  the share of the single most frequent 3-gram.
- ``vocab_top_terms`` — global term/document frequencies + top-100
  ranking, the vocabulary/IDF-statistics pass every tokenizer or
  quality-classifier build runs over the corpus.

Scale design (100 TB): both are explode → hash-keyed partial+final
aggregates — map-side combine shrinks the shuffle to one short row per
(doc, ngram) / term; no Python, no windows over raw tokens. The
top-100 cut in ``vocab_top_terms`` is orderBy+limit over the *aggregated
vocabulary* (Spark's TakeOrdered — per-partition heaps, no global
sort materialization), and the final rank window runs on 100 rows.
Tokenization follows the corpus convention (single-space split,
``textops.py`` module header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from example_beam_spark.operators.textops import _BPE_PATTERN
from example_beam_spark.registry import davg, register, sql_davg
from example_beam_spark.sources import load_table

_NGRAM = 3
_VOCAB_TOP = 100

# --------------------------------------------------------------------------
# doc_repetition_ngrams
# --------------------------------------------------------------------------

_REP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    sh AS (
        SELECT doc_id, md5(array_to_string(s[i:i+{_NGRAM - 1}], ' ')) AS h
        FROM toks CROSS JOIN
             UNNEST(generate_series(1, GREATEST(len(s) - {_NGRAM - 1}, 0))) AS u(i)
    ),
    per AS (
        SELECT doc_id, h, COUNT(*) AS c FROM sh GROUP BY doc_id, h
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_ngrams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS top_count
        FROM per GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_ngrams, 0) AS n_ngrams,
           COALESCE(a.n_distinct, 0) AS n_distinct,
           CASE WHEN a.n_ngrams > 0
                THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / CAST(a.n_ngrams AS DOUBLE)
                ELSE 0.0 END AS dup_ngram_frac,
           CASE WHEN a.n_ngrams > 0
                THEN CAST(a.top_count AS DOUBLE) / CAST(a.n_ngrams AS DOUBLE)
                ELSE 0.0 END AS top_ngram_frac
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


@register("doc_repetition_ngrams", oracle=_REP_ORACLE)
def doc_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram repetition signals (Gopher-style quality
    filter): duplicated-ngram fraction and most-frequent-ngram share.
    Explode shingle positions → two partial+final aggregates keyed by
    (doc, hash) then doc; short docs come back with zeros via the
    left join against the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.split(F.col("text"), " ")
    sh = docs.select(
        "doc_id",
        s.alias("s"),
        # guard: sequence(1, 0) raises in Spark where DuckDB's
        # generate_series returns empty — short docs emit no shingles
        F.explode(
            F.when(
                F.size(s) >= _NGRAM,
                F.sequence(F.lit(1), F.size(s) - (_NGRAM - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    ).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice("s", F.col("i"), _NGRAM))).alias("h"),
    )
    per = sh.groupBy("doc_id", "h").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_ngrams"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_count"),
    )
    out = docs.select("doc_id").join(agg, "doc_id", "left")
    nonzero = F.col("n_ngrams") > 0
    return out.select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        F.when(
            nonzero,
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_ngrams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
        F.when(
            nonzero, F.col("top_count").cast("double") / F.col("n_ngrams").cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("top_ngram_frac"),
    )


# --------------------------------------------------------------------------
# vocab_top_terms
# --------------------------------------------------------------------------

_VOCAB_ORACLE = f"""
    WITH terms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    agg AS (
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM terms WHERE term <> '' GROUP BY term
    )
    SELECT term, tf, df, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rank
        FROM agg
    ) WHERE rank <= {_VOCAB_TOP}
"""


@register("vocab_top_terms", oracle=_VOCAB_ORACLE)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global vocabulary statistics: term frequency + document frequency
    per token, top-100 (_VOCAB_TOP) by frequency. Explode → partial+final
    aggregate keyed by term; the cut is orderBy+limit (TakeOrdered —
    per-partition heaps) and the rank window touches only the 100
    survivors."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    agg = terms.groupBy("term").agg(
        F.count("*").cast("long").alias("tf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    top = agg.orderBy(F.desc("tf"), "term").limit(_VOCAB_TOP)
    w = Window.orderBy(F.desc("tf"), "term")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "term", "tf", "df", "rank"
    )


# --------------------------------------------------------------------------
# docs_quality_filter — the composite keep/drop decision
# --------------------------------------------------------------------------

_MIN_TOKENS = 24
_MAX_TOKENS = 80
_MAX_DUP_FRAC = 0.02
_MIN_MEAN_TOK = 3.0
_MAX_MEAN_TOK = 6.0

_FILTER_ORACLE = f"""
    WITH rep AS ({_REP_ORACLE}),
    toks AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (length(text) - (len(string_split(text, ' ')) - 1.0))
                   / len(string_split(text, ' ')) AS mean_tok_len
        FROM documents
    )
    SELECT t.doc_id, t.n_tokens, t.mean_tok_len, r.dup_ngram_frac,
           CAST(CASE WHEN t.n_tokens >= {_MIN_TOKENS}
                      AND t.n_tokens <= {_MAX_TOKENS}
                      AND r.dup_ngram_frac <= {_MAX_DUP_FRAC}
                      AND t.mean_tok_len >= {_MIN_MEAN_TOK}
                      AND t.mean_tok_len <= {_MAX_MEAN_TOK}
                THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
    FROM toks t JOIN rep r ON r.doc_id = t.doc_id
"""


@register("docs_quality_filter", oracle=_FILTER_ORACLE)
def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite corpus-cleaning decision (C4/Gopher-style rule
    stack): token-count band + duplicated-3-gram ceiling + mean-token-
    length band -> one keep/drop flag per document, with the signals
    kept as columns for threshold audits. Composes the repetition
    aggregate with scan-shaped token stats (mean token length uses the
    single-space-corpus identity len(text) = Σ|tok| + n - 1, so no
    second explode); one broadcast-eligible join on doc_id."""
    rep = doc_repetition_ngrams(spark, sf_dir).select("doc_id", "dup_ngram_frac")
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    toks = docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        (
            (F.length("text") - (n_tok - F.lit(1.0))) / n_tok
        ).alias("mean_tok_len"),
    )
    keep = (
        (F.col("n_tokens") >= _MIN_TOKENS)
        & (F.col("n_tokens") <= _MAX_TOKENS)
        & (F.col("dup_ngram_frac") <= _MAX_DUP_FRAC)
        & (F.col("mean_tok_len") >= _MIN_MEAN_TOK)
        & (F.col("mean_tok_len") <= _MAX_MEAN_TOK)
    )
    return toks.join(rep, "doc_id").select(
        "doc_id",
        "n_tokens",
        "mean_tok_len",
        "dup_ngram_frac",
        F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("keep_flag"),
    )


# --------------------------------------------------------------------------
# eval_contamination — train/eval overlap detection (decontamination)
# --------------------------------------------------------------------------

_EVAL_MAX_ID = 20  # docs below this id act as the held-out eval set
_CONTAM_SPAN = 8  # token span length (overlapping windows)

_CONTAM_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    spans AS (
        SELECT doc_id, md5(array_to_string(s[i:i+{_CONTAM_SPAN - 1}], ' ')) AS h
        FROM toks CROSS JOIN
             UNNEST(generate_series(1, GREATEST(len(s) - {_CONTAM_SPAN - 1}, 0))) AS u(i)
    ),
    eval_spans AS (
        SELECT DISTINCT h FROM spans WHERE doc_id < {_EVAL_MAX_ID}
    ),
    train_spans AS (
        SELECT doc_id, h FROM spans WHERE doc_id >= {_EVAL_MAX_ID}
    )
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.h) AS BIGINT) AS n_shared_spans
    FROM train_spans t JOIN eval_spans e ON e.h = t.h
    GROUP BY t.doc_id
"""


@register("eval_contamination", oracle=_CONTAM_ORACLE)
def eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination pass: training documents (doc_id >= eval split)
    that share any overlapping {span}-token span with the held-out eval
    set, with the distinct shared-span count — the filter every LLM
    pipeline runs before training (see e.g. the GPT-3/Gopher published
    decontamination methodology: n-gram overlap against benchmarks).

    Scale (100 TB): eval benchmarks are tiny (MBs of spans) — the
    distinct eval-span set broadcasts, so the check is a broadcast
    semi-join applied at scan speed over the training corpus's exploded
    spans, then one partial+final count per contaminated doc. No
    all-pairs anything."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.split(F.col("text"), " ")
    spans = docs.select(
        "doc_id",
        s.alias("s"),
        F.explode(
            F.when(
                F.size(s) >= _CONTAM_SPAN,
                F.sequence(F.lit(1), F.size(s) - (_CONTAM_SPAN - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    ).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice("s", F.col("i"), _CONTAM_SPAN))).alias("h"),
    )
    eval_spans = (
        spans.filter(F.col("doc_id") < _EVAL_MAX_ID).select("h").distinct()
    )
    train_spans = spans.filter(F.col("doc_id") >= _EVAL_MAX_ID)
    return (
        train_spans.join(F.broadcast(eval_spans), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").cast("long").alias("n_shared_spans"))
    )


# --------------------------------------------------------------------------
# docs_quality_classifier — hashed n-gram linear quality scorer
# --------------------------------------------------------------------------

# fastText-style text classifier (Joulin et al., "Bag of Tricks for
# Efficient Text Classification", EACL 2017): features are word unigrams
# + adjacent bigrams, hashed into a fixed-width weight vector (the
# hashing trick), score = mean feature weight. This is the standard
# quality-classifier stage of a curation pipeline (e.g. the CCNet /
# GPT-3 quality filters) with one twist that keeps it oracle-checkable:
# the weight vector is DETERMINISTIC — weight[j] derives from a salted
# md5 of the bucket index j — instead of learned. Swapping in trained
# weights changes ONE broadcast map, nothing in the plan.
#
# Scale design (100 TB): entirely scan-shaped — per-document score is a
# higher-order-function fold over the token array (no explode, no
# groupBy), so the operator is a narrow map over the documents scan with
# ZERO exchanges (plan-pinned). The "model" costs nothing to ship:
# weights are computed from the bucket id inline (a real trained model
# would broadcast a 4096-entry map — still map-side). Integer weights in
# [-1000, 1000] summed as BIGINT keep the score bit-reproducible
# (score = wsum / (1000·n_feats), one exact-integer division).

_QC_BUCKETS = 4096
_QC_SPAN = 2001  # weights in [-1000, 1000]

_QC_BUCKET_SQL = "CAST(('0x' || substr(md5('qw:' || {f}), 1, 7)) AS BIGINT) % 4096"
_QC_WEIGHT_SQL = (
    "CAST(('0x' || substr(md5('qb:' || CAST((" + _QC_BUCKET_SQL + ") AS VARCHAR)), 1, 7)) "
    "AS BIGINT) % 2001 - 1000"
)

_QC_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang, regexp_extract_all(text, '{{bpe}}') AS t
        FROM documents
    ),
    feats AS (
        SELECT doc_id, lang,
               list_concat(
                   t,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(generate_series(1, len(t) - 1),
                                            i -> t[i] || '_' || t[i + 1])
                        ELSE CAST([] AS VARCHAR[]) END
               ) AS f
        FROM toks
    ),
    scored AS (
        SELECT doc_id, lang,
               CAST(len(f) AS BIGINT) AS n_feats,
               CAST(COALESCE(list_sum(list_transform(f,
                   f -> ({_QC_WEIGHT_SQL.format(f='f')}))), 0) AS BIGINT) AS wsum
        FROM feats
    )
    SELECT doc_id, lang, n_feats, wsum,
           CASE WHEN n_feats > 0
                THEN CAST(wsum AS DOUBLE) / (CAST(n_feats AS DOUBLE) * 1000.0)
                ELSE 0.0 END AS score,
           CASE WHEN n_feats > 0
                THEN CAST(wsum AS DOUBLE) / (CAST(n_feats AS DOUBLE) * 1000.0)
                ELSE 0.0 END > 0.0 AS keep
    FROM scored
"""


@register("docs_quality_classifier", oracle=_QC_ORACLE.format(bpe=_BPE_PATTERN))
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed n-gram linear quality scorer over ``documents``: unigram +
    adjacent-bigram features → 4096-bucket hashing trick → integer
    weights → mean-weight score and a keep/drop verdict. See the section
    comment for the fastText lineage and the determinism twist."""
    docs = load_table(spark, sf_dir, "documents")

    def weight_of(x):  # two-level hash: feature → bucket → weight
        bucket = (
            F.conv(F.substring(F.md5(F.concat(F.lit("qw:"), x)), 1, 7), 16, 10)
            .cast("long")
            % _QC_BUCKETS
        )
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("qb:"), bucket.cast("string"))), 1, 7
                ),
                16,
                10,
            ).cast("long")
            % _QC_SPAN
            - 1000
        )

    bigram_expr = (
        "CASE WHEN size(t) >= 2 THEN "
        "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], '_', t[i])) "
        "ELSE array() END"
    )
    feats = docs.select(
        "doc_id",
        "lang",
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0).alias("t"),
    ).select(
        "doc_id",
        "lang",
        F.concat(F.col("t"), F.expr(bigram_expr)).alias("f"),
    )
    scored = feats.select(
        "doc_id",
        "lang",
        F.size("f").cast("long").alias("n_feats"),
        F.aggregate(
            "f", F.lit(0).cast("long"), lambda acc, x: acc + weight_of(x)
        ).alias("wsum"),
    )
    score = F.when(
        F.col("n_feats") > 0,
        F.col("wsum").cast("double") / (F.col("n_feats").cast("double") * 1000.0),
    ).otherwise(0.0)
    return scored.select(
        "doc_id",
        "lang",
        "n_feats",
        "wsum",
        score.alias("score"),
        (score > 0.0).alias("keep"),
    )


# --------------------------------------------------------------------------
# doc_lm_predictability — corpus-bigram language-model fluency score
# --------------------------------------------------------------------------

# The perplexity-style curation signal: score each document by how
# predictable its token stream is under the corpus's own bigram MLE
# model (P(b|a) = c(a,b)/c(a,·)). Low predictability ≈ boilerplate-free
# but also gibberish; high ≈ templated/repeated text — used as a band
# filter exactly like docs_quality_filter's length bands. Using the mean
# PROBABILITY instead of mean log-prob keeps the oracle bit-exact:
# ln() rounding is not guaranteed identical across engines (same
# documented delta as the HLL linear-counting correction), while
# count-ratio division and the decimal-sum average are.

_LM_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    big AS (
        SELECT doc_id, t[i] AS a, t[i + 1] AS b
        FROM toks CROSS JOIN UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    cab AS (SELECT a, b, COUNT(*) AS n_ab FROM big GROUP BY a, b),
    ca AS (SELECT a, COUNT(*) AS n_a FROM big GROUP BY a),
    per AS (
        SELECT big.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               {sql_davg("CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE)", "predictability")}
        FROM big
        JOIN cab ON cab.a = big.a AND cab.b = big.b
        JOIN ca ON ca.a = big.a
        GROUP BY big.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           COALESCE(p.predictability, 0.0) AS predictability
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
"""


@register("doc_lm_predictability", oracle=_LM_ORACLE)
def doc_lm_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean corpus-bigram probability per document (see section comment).

    100-TB design: two passes over the bigram stream — (1) the model:
    partial+final counts keyed by bigram / by left token (both shrink
    map-side, the model is vocabulary-sized, orders smaller than the
    corpus); (2) the score: two shuffle equi-joins keyed by bigram /
    left token (runtime bloom pruning applies — same shape as
    dedup_incremental's anti-join), then one per-doc average. Mean
    probability uses the decimal-sum convention (registry.davg) so the
    per-doc aggregate is order-independent."""
    from example_beam_spark.operators.corpus_ops import _PAIR_EXPR

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    big = toks.select("doc_id", F.explode(F.expr(_PAIR_EXPR)).alias("p")).select(
        "doc_id", "p.a", "p.b"
    )
    cab = big.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    ca = big.groupBy("a").agg(F.count("*").alias("n_a"))
    per = (
        big.join(cab, ["a", "b"])
        .join(ca, "a")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            davg(F.col("n_ab").cast("double") / F.col("n_a").cast("double"),
                 "predictability"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("predictability", F.lit(0.0)).alias("predictability"),
    )


# --------------------------------------------------------------------------
# build_inverted_index — term → posting-list construction
# --------------------------------------------------------------------------

_IDX_TOP_TERMS = 200  # cap: index the 200 highest-df terms (demo bound)

_IDX_ORACLE = f"""
    WITH terms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM terms WHERE term <> '' GROUP BY term, doc_id
    ),
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS total_tf
        FROM tf GROUP BY term
    ),
    top AS (
        SELECT term, df, total_tf FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rk FROM df
        ) WHERE rk <= {_IDX_TOP_TERMS}
    )
    SELECT t.term, t.df, t.total_tf,
           list_transform(
               list_sort(list({{'doc_id': f.doc_id, 'tf': f.tf}})),
               p -> p.doc_id
           ) AS postings,
           list_transform(
               list_sort(list({{'doc_id': f.doc_id, 'tf': f.tf}})),
               p -> p.tf
           ) AS tfs
    FROM top t JOIN tf f ON f.term = t.term
    GROUP BY t.term, t.df, t.total_tf
"""


@register("build_inverted_index", oracle=_IDX_ORACLE)
def build_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index construction: per term, the sorted posting list of
    (doc_id) plus aligned term frequencies — the build step behind every
    corpus search/retrieval system. Capped at the 200 (_IDX_TOP_TERMS)
    highest-df terms so the demo output is bounded; the build itself is
    corpus-wide.

    100-TB design: tf is one partial+final count keyed by (term, doc);
    df another keyed by term; the posting-list materialization
    (collect_list) runs ONLY for the capped term set after a TakeOrdered
    cut, and each list is bounded by that term's df — at real scale
    postings shard by (term, doc_id range) instead of one array per term
    (the standard segment layout); the aggregation shape is identical,
    so this plan IS the per-segment build."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    df = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    top = df.orderBy(F.desc("df"), "term").limit(_IDX_TOP_TERMS)
    postings = (
        tf.join(F.broadcast(top.select("term")), "term")
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "tf"))).alias("ps"))
        .select(
            "term",
            F.expr("transform(ps, p -> p.doc_id)").alias("postings"),
            F.expr("transform(ps, p -> p.tf)").alias("tfs"),
        )
    )
    return top.join(postings, "term").select(
        "term", "df", "total_tf", "postings", "tfs"
    )


# --------------------------------------------------------------------------
# term_pair_lift — doc-level co-occurrence association mining
# --------------------------------------------------------------------------

_LIFT_VOCAB = 50   # mine pairs only among the top-df terms (bounds the fan-out)
_LIFT_MIN_SUPPORT = 5
_LIFT_TOP = 100

_LIFT_ORACLE = f"""
    WITH terms AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    df AS (
        SELECT term, COUNT(*) AS n_t FROM terms WHERE term <> '' GROUP BY term
    ),
    vocab AS (
        SELECT term, n_t FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY n_t DESC, term) AS rk FROM df
        ) WHERE rk <= {_LIFT_VOCAB}
    ),
    baskets AS (
        SELECT t.doc_id, list_sort(list(t.term)) AS ts
        FROM terms t JOIN vocab v ON v.term = t.term
        GROUP BY t.doc_id
    ),
    pairs AS (
        SELECT ts[i] AS a, ts[j] AS b
        FROM baskets
        CROSS JOIN UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
        CROSS JOIN UNNEST(generate_series(i + 1, len(ts))) AS v(j)
    ),
    cab AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM pairs GROUP BY a, b
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT a, b, n_ab,
           CAST(va.n_t AS BIGINT) AS n_a,
           CAST(vb.n_t AS BIGINT) AS n_b,
           CAST(n_ab AS DOUBLE) * (SELECT n_docs FROM n)
               / (CAST(va.n_t AS DOUBLE) * CAST(vb.n_t AS DOUBLE)) AS lift,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   ORDER BY CAST(n_ab AS DOUBLE) * (SELECT n_docs FROM n)
                            / (CAST(va0.n_t AS DOUBLE) * CAST(vb0.n_t AS DOUBLE)) DESC,
                            a, b
               ) AS rk
        FROM cab
        JOIN vocab va0 ON va0.term = cab.a
        JOIN vocab vb0 ON vb0.term = cab.b
        WHERE n_ab >= {_LIFT_MIN_SUPPORT}
    ) ranked
    JOIN vocab va ON va.term = ranked.a
    JOIN vocab vb ON vb.term = ranked.b
    WHERE rk <= {_LIFT_TOP}
"""


@register("term_pair_lift", oracle=_LIFT_ORACLE)
def term_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over documents-as-baskets: lift of term pairs
    (docs containing BOTH / expected-if-independent), the log-free PMI
    twin — lift = P(ab)·N / (P(a)P(b)·N²) stays a pure count ratio, so
    the oracle is bit-exact where PMI's ln() would not be. Mined only
    among the top-50 (_LIFT_VOCAB) document-frequency terms with support
    >= 5 (_LIFT_MIN_SUPPORT), top-100 (_LIFT_TOP) by lift.

    100-TB design: the quadratic step is PER DOCUMENT over the
    vocabulary-filtered token set — bounded by min(doc length,
    |vocab|)², so corpus cost is linear in documents (same shape as
    source_overlap's within-group pairs); the vocabulary itself is a
    TakeOrdered cut of the df aggregate, broadcast into the basket
    semi-join. Pair counts are one partial+final aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("term")
    ).filter(F.col("term") != "")
    df = terms.groupBy("term").agg(F.count("*").alias("n_t"))
    vocab = df.orderBy(F.desc("n_t"), "term").limit(_LIFT_VOCAB)

    baskets = (
        terms.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("term")).alias("ts"))
    )
    pairs_expr = (
        "flatten(transform(sequence(1, size(ts) - 1), i -> "
        "transform(sequence(i + 1, size(ts)), j -> "
        "struct(ts[i-1] AS a, ts[j-1] AS b))))"
    )
    pairs = (
        baskets.filter(F.size("ts") >= 2)
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.a", "p.b")
    )
    cab = pairs.groupBy("a", "b").agg(F.count("*").cast("long").alias("n_ab"))
    # corpus size rides along as a broadcast one-row aggregate (the
    # sketches.py idiom) — no driver-side count at plan time
    n = F.broadcast(docs.agg(F.count("*").alias("n_docs")))

    va = F.broadcast(vocab.select(F.col("term").alias("a"), F.col("n_t").alias("n_a")))
    vb = F.broadcast(vocab.select(F.col("term").alias("b"), F.col("n_t").alias("n_b")))
    lift = (
        F.col("n_ab").cast("double") * F.col("n_docs")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    # TakeOrdered-then-rank (round 11): the cut is orderBy+limit so the
    # rank window sees _LIFT_TOP rows, not every supported pair
    ranked = (
        cab.filter(F.col("n_ab") >= _LIFT_MIN_SUPPORT)
        .join(va, "a")
        .join(vb, "b")
        .crossJoin(n)
        .withColumn("lift", lift)
        .orderBy(F.desc("lift"), "a", "b")
        .limit(_LIFT_TOP)
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("lift"), "a", "b"))
            .cast("long"),
        )
    )
    return ranked.select(
        "a", "b", "n_ab",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "lift", "rk",
    )


# --------------------------------------------------------------------------
# docs_perplexity_buckets — CCNet-style head/middle/tail tercile split
# --------------------------------------------------------------------------

# CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
# Datasets from Web Crawl Data", LREC 2020) buckets each language's
# corpus into head/middle/tail TERCILES of LM perplexity and trains on
# the head. Here the score is doc_lm_predictability's mean corpus-bigram
# probability (higher = more predictable), so head = top tercile of
# predictability. Cut points are value-based (exact percentile at 1/3
# and 2/3), and assignment compares each doc's score to the cuts — no
# global sort of the corpus.
#
# Cross-engine exactness: the per-doc score is already bit-identical
# (decimal-avg convention, hash-compared by doc_lm_predictability); the
# interpolated cut either lands ON a data value (integer rank: both
# engines return it exactly) or STRICTLY BETWEEN two adjacent distinct
# values (no doc value can fall between the two engines' ulp-close
# cuts), so value-comparison bucketing cannot flip across engines.

_PPLX_BUCKET_ORACLE = f"""
    WITH per AS MATERIALIZED (
        SELECT doc_id, predictability FROM ({_LM_ORACLE})
    ),
    cuts AS (
        SELECT quantile_cont(predictability, [CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3]) AS c FROM per
    )
    SELECT per.doc_id, per.predictability,
           CASE WHEN predictability <= c[1] THEN 'tail'
                WHEN predictability <= c[2] THEN 'middle'
                ELSE 'head' END AS bucket
    FROM per CROSS JOIN cuts
"""


@register("docs_perplexity_buckets", oracle=_PPLX_BUCKET_ORACLE)
def docs_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tercile split of the corpus by LM predictability (see section
    comment): (doc_id, predictability, bucket in head/middle/tail).

    100-TB design: the cuts are ONE broadcast row (exact ``percentile``
    aggregate here; at petabyte scale swap for ``approx_percentile`` —
    same plan shape, documented trade) and assignment is a map-side
    comparison, so the only corpus-wide movement is the percentile
    aggregate's partial+final pass. No global sort, no NTILE single
    partition."""
    per = doc_lm_predictability(spark, sf_dir).select("doc_id", "predictability")
    cuts = F.broadcast(
        per.agg(
            F.expr("percentile(predictability, array(CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3))").alias("c")
        )
    )
    return per.crossJoin(cuts).select(
        "doc_id",
        "predictability",
        F.when(F.col("predictability") <= F.col("c")[0], F.lit("tail"))
        .when(F.col("predictability") <= F.col("c")[1], F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
    )
