"""Train/eval decontamination — the n-gram overlap scrub every serious
pretraining pipeline runs before training (the GPT-3 appendix-C /
Pile discipline: drop or flag training documents that share an n-gram
with the held-out evaluation set, so benchmark numbers measure
generalization, not memorized leakage).

Composes two pieces this repo already ships: the deterministic hash
split (corpus_ops.docs_train_split — eval membership is a pure scan
expression, no side-channel eval list) and the dedup module's
SHINGLE_N-gram machinery (dedup.shingles — same tokenization, same
n, so "shares an n-gram" means exactly what the near-dup family
means by it).

Two artifacts, both oracle-gated:

- ``docs_decontaminate`` — the TRAIN-side manifest: every train doc
  with its leaked-gram count, the number of eval docs it collides
  with, and the keep flag (keep = zero shared grams). The kept subset
  IS the decontaminated corpus; emitting the flag rather than
  filtering keeps the operator composable (the budget/packing
  manifests downstream filter on it).
- ``eval_contamination_report`` — the EVAL-side view: per held-out
  doc, what fraction of its grams already occur in the train corpus
  (leak_frac 1.0 = the benchmark row is fully memorizable). This is
  the artifact that decides whether an eval stays valid at all.

Scale: the gram join is the dedup family's equi-join shape — shuffle
by gram, collision work linear in shared grams. The eval side is a
~1% hash slice by construction (and in production eval sets are
tiny), so Catalyst broadcasts it under the default threshold; the
explicit broadcast hint pins the plan at fixture scale. Counts are
partial+final aggregates; no window over row-scale data anywhere.

Reference analog: none (the reference is an ad-event engine) — this
family extends the corpus-curation surface the way SURVEY §2.8's
training-prep block does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.operators.corpus_ops import _SPLIT_ORACLE, docs_train_split
from example_beam_spark.operators.dedup import _SHINGLES_SQL, shingles
from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

_DECON_ORACLE = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    split AS ({_SPLIT_ORACLE}),
    shared AS (
        SELECT t.doc_id,
               COUNT(DISTINCT t.g) AS n_shared_grams,
               COUNT(DISTINCT e.doc_id) AS n_eval_docs
        FROM sh t
        JOIN split st ON st.doc_id = t.doc_id AND st.split = 'train'
        JOIN sh e ON e.g = t.g
        JOIN split se ON se.doc_id = e.doc_id AND se.split = 'test'
        GROUP BY t.doc_id
    )
    SELECT s.doc_id,
           CAST(COALESCE(x.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
           CAST(COALESCE(x.n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
           COALESCE(x.n_shared_grams, 0) = 0 AS keep
    FROM split s
    LEFT JOIN shared x ON x.doc_id = s.doc_id
    WHERE s.split = 'train'
"""


@register("docs_decontaminate", oracle=_DECON_ORACLE)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-TRAIN-doc decontamination manifest (module doc): shared-gram
    and colliding-eval-doc counts against the held-out test slice,
    keep = no overlap."""
    docs = load_table(spark, sf_dir, "documents")
    split = docs_train_split(spark, sf_dir).select("doc_id", "split")
    sh = shingles(docs)
    train_sh = sh.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    eval_sh = (
        sh.join(split.filter(F.col("split") == "test").select("doc_id"), "doc_id")
        .select(F.col("doc_id").alias("eval_id"), "g")
    )
    shared = (
        train_sh.join(F.broadcast(eval_sh), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("long").alias("n_shared_grams"),
            F.countDistinct("eval_id").cast("long").alias("n_eval_docs"),
        )
    )
    train_docs = split.filter(F.col("split") == "train").select("doc_id")
    return (
        train_docs.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).cast("long").alias(
                "n_shared_grams"
            ),
            F.coalesce("n_eval_docs", F.lit(0)).cast("long").alias("n_eval_docs"),
            (F.coalesce("n_shared_grams", F.lit(0)) == 0).alias("keep"),
        )
    )


_EVAL_REPORT_ORACLE = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    split AS ({_SPLIT_ORACLE}),
    eval_grams AS (
        SELECT e.doc_id, e.g
        FROM sh e JOIN split se ON se.doc_id = e.doc_id AND se.split = 'test'
    ),
    train_grams AS (
        SELECT DISTINCT t.g
        FROM sh t JOIN split st ON st.doc_id = t.doc_id AND st.split = 'train'
    )
    SELECT eg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN tg.g IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_leaked,
           CAST(SUM(CASE WHEN tg.g IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               / COUNT(*) AS leak_frac
    FROM eval_grams eg
    LEFT JOIN train_grams tg ON tg.g = eg.g
    GROUP BY eg.doc_id
"""


@register("eval_contamination_report", oracle=_EVAL_REPORT_ORACLE)
def eval_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVAL-doc leakage (module doc): how much of each held-out
    doc's gram set already occurs anywhere in the train corpus. Eval
    docs shorter than SHINGLE_N have no grams and no row — they carry
    no leakable n-gram signal by definition."""
    docs = load_table(spark, sf_dir, "documents")
    split = docs_train_split(spark, sf_dir).select("doc_id", "split")
    sh = shingles(docs)
    eval_grams = sh.join(
        split.filter(F.col("split") == "test").select("doc_id"), "doc_id"
    )
    train_grams = (
        sh.join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
        .select("g")
        .distinct()
        .withColumn("leaked", F.lit(1))
    )
    return (
        eval_grams.join(train_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce("leaked", F.lit(0))).cast("long").alias("n_leaked"),
            (
                F.sum(F.coalesce("leaked", F.lit(0))).cast("double")
                / F.count("*")
            ).alias("leak_frac"),
        )
    )
