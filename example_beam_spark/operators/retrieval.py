"""Retrieval & data-selection operators: BM25 ranked search over the
corpus, DSIR importance weighting for domain-targeted data selection,
and corpus-duplicated-substring coverage (the Lee-et-al "deduplicating
training data" signal). These extend the curation family with the
retrieval side of a training-data pipeline: find documents (BM25),
weight them toward a target domain (DSIR), and measure how much of each
document is boilerplate copied elsewhere in the corpus (substring
coverage).

Grounding (public literature, no reference-repo analog — these are the
"beyond the reference" LLM-pipeline operators the build plan calls for):
- BM25: Robertson & Zaragoza 2009, "The Probabilistic Relevance
  Framework: BM25 and Beyond" (the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))``
  idf variant, which stays positive for df > N/2).
- DSIR: Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling" (hashed n-gram bag features; importance weight
  = target/raw likelihood ratio under smoothed bag-of-feature models).
- Substring coverage: Lee et al. 2022, "Deduplicating Training Data
  Makes Language Models Better" (fraction of a document covered by
  substrings that occur elsewhere in the corpus; their suffix-array
  match length is the K-token shingle here).

100-TB design notes
-------------------
- ``bm25_search``: the query-term set is a literal ``isin`` filter, so
  the explode → (term, doc) tf aggregation only shuffles rows whose
  term is in the query (filter BEFORE the shuffle); df and the
  (n_docs, avgdl) corpus stats are tiny aggregates joined back as
  broadcasts (one 3-row, one 1-row). One partial+final agg keyed by
  doc_id sums the per-term contributions; the final top-K is a
  TakeOrdered, not a global sort.
- ``dsir_importance_weights``: features hash into B=256 buckets, so
  the two "language models" (target and raw bucket counts) are a
  FIXED-SIZE 256-row table regardless of corpus size — broadcast to
  every executor; the per-document weight is then one partial+final
  agg keyed by doc_id over a map-side broadcast join. Nothing global
  ever shuffles except the per-doc mean.
- ``substring_dup_coverage``: K-token shingles (explode) → corpus-wide
  occurrence counts (partial+final on the shingle hash) → duplicated
  hashes join back to positions → per-doc distinct covered positions.
  The K× position fan-out happens AFTER the duplicate filter, so only
  duplicated spans pay it; at real scale the shingle-count table is the
  same partial+final shape as ``dedup_exact`` and the join is an
  equi-join on the hash (AQE-skew-splittable).

Cross-engine exactness: per-term BM25 contributions pass through the
registry's DECIMAL(38,6) quantized sum (order-independent), and the
compared output is integer columns + the rank (doc_id tie-break) —
the raw ln()-bearing double score is deliberately NOT a compared
column (ln rounding is not guaranteed identical across engines; same
documented delta as ``doc_lm_predictability``'s mean-probability
choice). Residual hazard: the compared rank is still ORDERED by that
score, so a 1-ulp ln() divergence landing exactly on a 0.5e-6
DECIMAL(38,6) HALF_UP quantization boundary could flip a per-term
contribution and, if two docs' sums then cross, the rank (~1e-10 per
term; tools/strict_verify.py would surface it only on the fixture it
runs). Accepted as-is: an ln-free monotone surrogate ordering (the
bigram_collocations_pmi trick) does not compose across multi-term
SUMS, so the fix would change the operator's semantics, not just its
arithmetic. DSIR's per-feature importance ratio is an exact integer-count
rational evaluated as one double division, and the per-doc mean uses
the decimal-sum machinery (``sql_davg``) — bit-exact, no ln.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from example_beam_spark.registry import register, sql_davg
from example_beam_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# bm25_search — ranked keyword retrieval over the documents table
# --------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("dup", "join", "vector")  # rare + common + common: idf contrast
_BM25_TOP = 20

_bm25_terms_sql = ", ".join(f"'{t}'" for t in _BM25_QUERY)
_bm25_tf_cols_sql = ",\n           ".join(
    f"CAST(COALESCE(SUM(CASE WHEN f.term = '{t}' THEN f.tf END), 0) AS BIGINT)"
    f" AS tf_{t}"
    for t in _BM25_QUERY
)

_BM25_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        WHERE term IN ({_bm25_terms_sql})
        GROUP BY doc_id, term
    ),
    idf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               ln(1.0 + ((SELECT n_docs FROM stats) - COUNT(*) + 0.5)
                        / (COUNT(*) + 0.5)) AS idf
        FROM tf GROUP BY term
    ),
    scored AS (
        SELECT f.doc_id,
               {_bm25_tf_cols_sql},
               CAST(SUM(CAST(
                   i.idf * (f.tf * ({_BM25_K1} + 1.0))
                         / (f.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                            + {_BM25_B} * (d.dl / (SELECT avgdl FROM stats))))
                   AS DECIMAL(38,6))) AS DOUBLE) AS score
        FROM tf f
        JOIN idf i ON i.term = f.term
        JOIN dl d ON d.doc_id = f.doc_id
        GROUP BY f.doc_id
    )
    SELECT s.doc_id, d.dl,
           s.tf_dup, s.tf_join, s.tf_vector,
           CAST(rk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        FROM scored
    ) s
    JOIN dl d ON d.doc_id = s.doc_id
    WHERE rk <= {_BM25_TOP}
"""


@register("bm25_search", oracle=_BM25_ORACLE)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene positive-idf variant) ranking
    of the corpus for a fixed query-term set; returns the top 20 docs
    with per-term tfs, doc length, and rank. The ranking score passes
    through the DECIMAL(38,6) quantized sum so it is accumulation-order
    independent; the compared output is integers + rank (see module
    docstring for why the ln()-bearing double stays internal)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    dl = toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("idf")
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * (F.col("dl") / F.col("avgdl")))
                )
            ).alias("w"),
        )
    )
    tf_cols = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
        )
        .cast("long")
        .alias(f"tf_{t}")
        for t in _BM25_QUERY
    ]
    scored = contrib.groupBy("doc_id").agg(
        *tf_cols,
        F.sum(F.col("w").cast("decimal(38,6)")).cast("double").alias("score"),
    )
    # TakeOrdered-then-rank (round 11): orderBy+limit bounds the rank
    # window's input at _BM25_TOP rows (the vocab_top_terms discipline)
    w = Window.orderBy(F.desc("score"), "doc_id")
    return (
        scored.orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_TOP)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .join(dl, "doc_id")
        .select("doc_id", "dl", "tf_dup", "tf_join", "tf_vector", "rank")
    )


# --------------------------------------------------------------------------
# dsir_importance_weights — hashed n-gram importance resampling weights
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 256  # 2 hex chars of md5 — fixed-size feature space
_DSIR_TARGET = ("src1", "src2", "src3")  # stand-in for the domain corpus
_dsir_target_sql = ", ".join(f"'{s}'" for s in _DSIR_TARGET)

_DSIR_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    feats AS (
        SELECT doc_id, source,
               substr(md5('dsir:' || t[i] || ' ' || t[i + 1]), 1, 2) AS f
        FROM toks
        CROSS JOIN UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    buckets AS (
        SELECT f,
               COUNT(*) FILTER (WHERE source IN ({_dsir_target_sql})) AS c_t,
               COUNT(*) FILTER (WHERE source NOT IN ({_dsir_target_sql})) AS c_r
        FROM feats GROUP BY f
    ),
    totals AS (
        SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r FROM buckets
    ),
    per_doc AS (
        SELECT fe.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_feats,
               {sql_davg(
                   "CAST((b.c_t + 1) * ((SELECT n_r FROM totals) + "
                   f"{_DSIR_BUCKETS}) AS DOUBLE) / "
                   "CAST((b.c_r + 1) * ((SELECT n_t FROM totals) + "
                   f"{_DSIR_BUCKETS}) AS DOUBLE)",
                   "mean_importance_ratio",
               )}
        FROM feats fe JOIN buckets b ON b.f = fe.f
        GROUP BY fe.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_feats, 0) AS n_feats,
           COALESCE(p.mean_importance_ratio, 1.0) AS mean_importance_ratio,
           CAST(CASE WHEN COALESCE(p.mean_importance_ratio, 1.0) >= 1.0
                THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


@register("dsir_importance_weights", oracle=_DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weights: hashed-bigram bag
    features (B=256 md5 buckets), add-one-smoothed target vs raw bucket
    models, and a per-document mean feature importance ratio
    p_target(f)/p_raw(f). The mean RATIO (not mean log-ratio) keeps the
    oracle bit-exact — each ratio is an exact integer-count rational
    evaluated in one double division, and the per-doc mean is the
    decimal-sum average (same documented delta as
    ``doc_lm_predictability``). keep_flag = ratio >= 1 is the
    resampling-toward-target decision; ``docs_train_split``-style
    Gumbel sampling composes downstream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("t")
    )
    feats = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(t) - 1, 0)), "
                "i -> substr(md5(concat('dsir:', t[i - 1], ' ', t[i])), 1, 2))"
            )
        ).alias("f"),
    )
    is_target = F.col("source").isin(*_DSIR_TARGET)
    buckets = feats.groupBy("f").agg(
        F.count(F.when(is_target, 1)).alias("c_t"),
        F.count(F.when(~is_target, 1)).alias("c_r"),
    )
    totals = buckets.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    ratio = (
        ((F.col("c_t") + 1) * (F.col("n_r") + _DSIR_BUCKETS)).cast("double")
        / ((F.col("c_r") + 1) * (F.col("n_t") + _DSIR_BUCKETS)).cast("double")
    ).alias("ratio")
    model = F.broadcast(
        buckets.crossJoin(F.broadcast(totals)).select("f", ratio)
    )
    per_doc = (
        feats.join(model, "f")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            (
                F.sum(F.col("ratio").cast("decimal(38,6)")).cast("double")
                / F.count("ratio")
            ).alias("mean_importance_ratio"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("mean_importance_ratio", F.lit(1.0)).alias(
                "mean_importance_ratio"
            ),
            F.when(
                F.coalesce("mean_importance_ratio", F.lit(1.0)) >= 1.0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("keep_flag"),
        )
    )


# --------------------------------------------------------------------------
# substring_dup_coverage — Lee-et-al corpus-duplicated-substring signal
# --------------------------------------------------------------------------

_COV_K = 8  # token span length (same granularity as eval_contamination)

_COV_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, i,
               md5(array_to_string(t[i:i + {_COV_K - 1}], ' ')) AS h
        FROM toks
        CROSS JOIN UNNEST(
            generate_series(1, GREATEST(len(t) - {_COV_K - 1}, 0))
        ) AS u(i)
    ),
    dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
    cov AS (
        SELECT DISTINCT s.doc_id, p
        FROM sh s
        JOIN dup d ON d.h = s.h
        CROSS JOIN UNNEST(generate_series(s.i, s.i + {_COV_K - 1})) AS v(p)
    ),
    n AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
    per AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_covered
        FROM cov GROUP BY doc_id
    )
    SELECT n.doc_id, n.n_tokens,
           COALESCE(p.dup_covered, 0) AS dup_covered,
           CAST(COALESCE(p.dup_covered, 0) AS DOUBLE) / n.n_tokens
               AS dup_coverage_frac
    FROM n LEFT JOIN per p ON p.doc_id = n.doc_id
"""


@register("substring_dup_coverage", oracle=_COV_ORACLE)
def substring_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of token positions covered by a K-token
    span that occurs MORE THAN ONCE anywhere in the corpus — the
    Lee et al. 2022 duplicated-substring signal (their suffix-array
    minimum match length becomes the K=8 shingle). Distinct from
    ``span_dedup`` (non-overlapping chunk identity) and
    ``doc_repetition_ngrams`` (within-doc repetition only): a span
    repeated across two different documents counts here.

    Plan: shingle hashes explode once; corpus-wide counts are a
    partial+final agg on the hash; only hashes with count > 1 join back
    (the K× position fan-out happens after that filter); covered
    positions dedup per doc. At 100 TB the count table is the
    ``dedup_exact`` shape and the join is hash-partitioned."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(size(t) - {_COV_K - 1}, 0)), "
                f"i -> md5(concat_ws(' ', slice(t, i, {_COV_K}))))"
            )
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), "h")
    dup = (
        sh.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("h")
    )
    cov = (
        sh.join(dup, "h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_COV_K - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("dup_covered"))
    )
    n = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return n.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_covered", F.lit(0)).alias("dup_covered"),
        (
            F.coalesce("dup_covered", F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_coverage_frac"),
    )


# --------------------------------------------------------------------------
# pagerank_term_graph — power-iteration PageRank over term co-occurrence
# --------------------------------------------------------------------------

_PR_D = 0.85  # damping (Brin & Page 1998)
_PR_ITERS = 5  # fixed power-iteration budget (plan unrolled, no collect)
_PR_MIN_SUP = 5  # co-occurrence support floor for an edge


def _pr_oracle() -> str:
    """Generated nested-CTE oracle: one CTE per power iteration (the
    same generate-don't-handwrite move as bpe_train_merges).

    Literals are CAST to DOUBLE explicitly: DuckDB parses a bare 1.0 /
    0.85 as DECIMAL and evaluates (1.0 - 0.85) EXACTLY as 0.15, while
    Spark's lit(1.0 - 0.85) is the double 0.15000000000000002 — a 1-ulp
    teleport difference that compounds through the iterations (found by
    the full-precision comparator audit; the .9g normalizer hid it)."""
    its = []
    for i in range(1, _PR_ITERS + 1):
        its.append(
            f"""r{i} AS (
        SELECT e.dst AS term,
               (CAST(1.0 AS DOUBLE) - CAST({_PR_D} AS DOUBLE))
                   / (SELECT n FROM nn)
               + CAST({_PR_D} AS DOUBLE) * CAST(SUM(
                     CAST(r.pr * e.w / e.wdeg AS DECIMAL(38,6))) AS DOUBLE) AS pr
        FROM ed e JOIN r{i - 1} r ON r.term = e.src
        GROUP BY e.dst
    )"""
        )
    chain = ",\n    ".join(its)
    return f"""
    WITH td AS (
        SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ) WHERE term <> ''
    ),
    und AS (
        SELECT a.term AS src, b.term AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY a.term, b.term HAVING COUNT(*) >= {_PR_MIN_SUP}
    ),
    edges AS (
        SELECT src, dst, w FROM und
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM und
    ),
    deg AS (
        SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg FROM edges GROUP BY src
    ),
    ed AS (
        SELECT e.src, e.dst, e.w, d.wdeg FROM edges e JOIN deg d ON d.src = e.src
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    r0 AS (
        SELECT src AS term, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM deg
    ),
    {chain}
    SELECT term, pr, CAST(rk AS BIGINT) AS rank FROM (
        SELECT term, pr,
               ROW_NUMBER() OVER (ORDER BY pr DESC, term) AS rk
        FROM r{_PR_ITERS}
    )
"""


@register("pagerank_term_graph", oracle=_pr_oracle())
def pagerank_term_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (Brin & Page 1998 — the original retrieval ranking
    algorithm) over the term co-occurrence graph: nodes are vocabulary
    terms, undirected edges are term pairs co-occurring in >=
    _PR_MIN_SUP distinct documents WEIGHTED by that co-occurrence count
    (the standard weighted-PR extension — without weights this corpus's
    dense co-occurrence graph is regular and PR collapses to the
    uniform vector), and 5 damped power iterations run
    as an UNROLLED DataFrame plan (no driver loop state, no collect —
    the iteration count is a literal, so the whole computation is one
    lazy plan, mirrored by a generated nested-CTE oracle).

    Cross-engine exactness: each iteration's contribution sum passes
    through the DECIMAL(38,6) quantized sum (order-independent); the
    teleport term and the r*w/wdeg contributions are single IEEE
    operations on
    identical inputs, written with identical association in both
    engines — so the doubles agree bit-for-bit, no ln anywhere.

    100-TB design: this IS the edge-partitioned power-iteration shape
    (Pregel-on-DataFrames): the weighted-degree column is folded into the edge
    list ONCE before the loop and the edge frame is persisted (reused
    by every iteration); each iteration is exactly one shuffle keyed by
    dst (partial+final sum) plus a broadcast of the one-row node count.
    At real scale ranks and edges co-partition by key (bucketing), and
    the iteration count stays a fixed budget or a convergence check on
    an aggregate — never per-node driver logic. Same round-budget
    posture as dedup_cluster_canonical's large-star/small-star CC
    (measured O(log n) across two decades in the stress lane)."""
    from example_beam_spark.registry import defer_cleanup

    docs = load_table(spark, sf_dir, "documents")
    td = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    b = td.select(F.col("doc_id").alias("d2"), F.col("term").alias("t2"))
    und = (
        td.join(b, (F.col("doc_id") == F.col("d2")) & (F.col("term") < F.col("t2")))
        .groupBy(F.col("term").alias("src"), F.col("t2").alias("dst"))
        .agg(F.count("*").cast("long").alias("w"))
        .filter(F.col("w") >= _PR_MIN_SUP)
    )
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    deg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wdeg"))
    ed = edges.join(deg, "src").persist()
    defer_cleanup(lambda: ed.unpersist())
    nn = F.broadcast(deg.agg(F.count("*").cast("long").alias("n")))
    r = deg.crossJoin(nn).select(
        F.col("src").alias("term"), (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        r = (
            ed.join(r, ed.src == r.term)
            .groupBy("dst")
            .agg(
                F.sum(
                    (F.col("pr") * F.col("w") / F.col("wdeg")).cast(
                        "decimal(38,6)"
                    )
                )
                .cast("double")
                .alias("s")
            )
            .crossJoin(nn)
            .select(
                F.col("dst").alias("term"),
                (
                    F.lit(1.0 - _PR_D) / F.col("n") + F.lit(_PR_D) * F.col("s")
                ).alias("pr"),
            )
        )
    # round-11: the output is the FULL term ranking (no top-k cut in the
    # contract), so the global rank runs as the two-phase distributed
    # rank — no single-task window over the vocabulary
    from example_beam_spark.operators.scaleops import two_phase_rank

    ranked, _n = two_phase_rank(r, [F.desc("pr"), "term"], "rank")
    return ranked.select("term", "pr", "rank")
